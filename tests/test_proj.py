"""UTM transform tests (geometry/proj.py — Krüger/Karney 6th-order series,
replacing the reference's PROJ-backed arbitrary ST_Transform for the UTM
family, c/sedona-proj/src/st_transform.rs)."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from sedona_db_spark.geometry import proj, wkb


class TestKernels:
    def test_central_meridian_exact(self):
        # on the CM: easting is exactly false-easting, northing equals
        # k0 x meridian arc (independent numeric quadrature)
        for lat in (0.0, 30.0, 45.0, 70.0):
            E, N = proj.utm_forward(15.0, lat, zone=33)
            assert float(E) == 500000.0
            assert float(N) == pytest.approx(0.9996 * proj.meridian_arc(lat), abs=1e-4)

    def test_roundtrip_machine_precision(self):
        rng = np.random.default_rng(1)
        lon = 15 + rng.uniform(-6, 6, 5000)
        lat = rng.uniform(-80, 84, 5000)
        E, N = proj.utm_forward(lon, lat, 33)
        lon2, lat2 = proj.utm_inverse(E, N, 33)
        assert np.abs(lon2 - lon).max() < 1e-11
        assert np.abs(lat2 - lat).max() < 1e-11

    def test_southern_hemisphere_false_northing(self):
        E, N = proj.utm_forward(15.0, -30.0, 33, north=False)
        assert float(N) > 6_000_000  # 10M false northing applied
        lon, lat = proj.utm_inverse(E, N, 33, north=False)
        assert float(lat) == pytest.approx(-30.0, abs=1e-11)

    def test_scale_factor_on_cm(self):
        # local scale on the CM must be k0 = 0.9996 (definition of UTM)
        lat = 40.0
        eps = 1e-6
        _, N1 = proj.utm_forward(15.0, lat - eps, 33)
        _, N2 = proj.utm_forward(15.0, lat + eps, 33)
        darc = proj.meridian_arc(lat + eps) - proj.meridian_arc(lat - eps)
        assert (N2 - N1) / darc == pytest.approx(0.9996, abs=1e-6)

    def test_parse_epsg(self):
        assert proj.parse_utm_epsg("EPSG:32633") == (33, True)
        assert proj.parse_utm_epsg("EPSG:32733") == (33, False)
        assert proj.parse_utm_epsg("EPSG:32661") is None
        assert proj.parse_utm_epsg("EPSG:4326") is None


class TestStTransform:
    def test_utm_roundtrip_through_sql(self, spark):
        from sedona_db_spark.functions import st

        rng = np.random.default_rng(2)
        x = 9 + rng.uniform(-3, 3, 50)
        y = rng.uniform(-60, 60, 50)
        rows = [(int(i), bytes(b)) for i, b in enumerate(wkb.encode_points_xy(x, y))]
        df = spark.createDataFrame(rows, "id LONG, geometry BINARY")
        # zone 32 covers lon 6..12
        utm = df.withColumn(
            "g2", st.ST_Transform(F.col("geometry"), F.lit("EPSG:4326"), F.lit("EPSG:32632"))
        )
        back = utm.withColumn(
            "g3", st.ST_Transform(F.col("g2"), F.lit("EPSG:32632"), F.lit("EPSG:4326"))
        )
        out = back.select("id", st.ST_X(F.col("g3")).alias("x"), st.ST_Y(F.col("g3")).alias("y")).collect()
        for r in out:
            assert r["x"] == pytest.approx(float(x[r["id"]]), abs=1e-9)
            assert r["y"] == pytest.approx(float(y[r["id"]]), abs=1e-9)

    def test_utm_to_webmercator_chain(self, spark):
        from sedona_db_spark.functions import st

        E, N = proj.utm_forward(9.5, 48.0, 32)
        df = spark.createDataFrame(
            [(0, bytes(wkb.encode_points_xy(np.array([float(E)]), np.array([float(N)]))[0]))],
            "id LONG, geometry BINARY",
        )
        wm = df.select(
            st.ST_X(st.ST_Transform(F.col("geometry"), F.lit("EPSG:32632"), F.lit("EPSG:3857"))).alias("mx")
        ).collect()[0]["mx"]
        assert wm == pytest.approx(np.radians(9.5) * 6378137.0, rel=1e-12)


class TestLAEA:
    """EPSG:3035 (ETRS-LAEA Europe) — VERDICT item: 'any UTM/LAEA workload
    fails today'. Snyder ellipsoidal LAEA, validated by three independent
    properties (no PROJ available to compare against)."""

    def test_center_maps_to_false_origin(self):
        E, N = proj.laea_forward(10.0, 52.0)
        assert (float(E), float(N)) == (4_321_000.0, 3_210_000.0)

    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        lon = rng.uniform(-10, 30, 2000)
        lat = rng.uniform(35, 70, 2000)
        E, N = proj.laea_forward(lon, lat)
        lon2, lat2 = proj.laea_inverse(E, N)
        assert np.abs(lon2 - lon).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-7

    def test_equal_area_property(self):
        import math
        d = 1e-4
        for LO, LA in [(10, 52), (25, 60), (-5, 40)]:
            E0, N0 = proj.laea_forward(LO, LA)
            E1, N1 = proj.laea_forward(LO + d, LA)
            E2, N2 = proj.laea_forward(LO, LA + d)
            area_m = abs((E1 - E0) * (N2 - N0) - (E2 - E0) * (N1 - N0))
            a, f = 6378137.0, 1 / 298.257223563
            e2 = f * (2 - f)
            phi = math.radians(LA)
            M = a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
            Nr = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
            true = M * math.radians(d) * Nr * math.cos(phi) * math.radians(d)
            assert area_m / true == pytest.approx(1.0, abs=1e-6)

    def test_st_transform_laea(self, spark):
        from pyspark.sql import functions as F

        from sedona_db_spark.functions import st

        df = spark.createDataFrame(
            [(0, bytes(wkb.encode_points_xy(np.array([10.0]), np.array([52.0]))[0]))],
            "id LONG, geometry BINARY",
        )
        out = df.select(
            st.ST_X(st.ST_Transform(F.col("geometry"), F.lit("EPSG:4326"), F.lit("EPSG:3035"))).alias("x")
        ).collect()[0]["x"]
        assert out == 4_321_000.0


class TestConic:
    """Lambert Conformal Conic 2SP + Albers (Snyder §15/§14) — round-trip,
    conformality/equal-area properties, and standard-parallel unit scale."""

    DOMAINS = {
        "EPSG:2154": (-5.0, 9.0, 41.0, 51.0),     # France
        "EPSG:3978": (-140.0, -50.0, 40.0, 84.0), # Canada
        "EPSG:3034": (-10.0, 30.0, 35.0, 70.0),   # Europe
        "EPSG:5070": (-125.0, -65.0, 24.0, 50.0), # CONUS
    }

    def _grid(self, code, n=2000, seed=5):
        rng = np.random.default_rng(seed)
        x0, x1, y0, y1 = self.DOMAINS[code]
        return rng.uniform(x0, x1, n), rng.uniform(y0, y1, n)

    @pytest.mark.parametrize("code", list(DOMAINS))
    def test_roundtrip(self, code):
        lon, lat = self._grid(code)
        p = proj.CONIC_CRS[code]
        E, N = proj.conic_forward(lon, lat, p)
        lon2, lat2 = proj.conic_inverse(E, N, p)
        assert np.abs(lon2 - lon).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-9

    def test_lcc_central_meridian_is_false_easting(self):
        p = proj.CONIC_CRS["EPSG:2154"]
        E, N = proj.lcc_forward(3.0, 46.5, *p[1:9])
        assert float(E) == pytest.approx(700000.0, abs=1e-6)
        assert float(N) == pytest.approx(6600000.0, abs=1e-6)

    def test_lcc_unit_scale_at_standard_parallels(self):
        # scale along a parallel: projected distance / ellipsoid distance
        # equals 1 at lat1/lat2, > 1 outside the belt, < 1 inside
        p = proj.CONIC_CRS["EPSG:2154"]
        a, e2 = 6378137.0, 0.00669437999014132

        def k_at(lat):
            d = 1e-6
            E1, N1 = proj.lcc_forward(3.0 - d, lat, *p[1:9])
            E2, N2 = proj.lcc_forward(3.0 + d, lat, *p[1:9])
            dproj = float(np.hypot(E2 - E1, N2 - N1))
            phi = np.radians(lat)
            nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
            dell = nu * np.cos(phi) * np.radians(2 * d)
            return dproj / dell

        assert k_at(49.0) == pytest.approx(1.0, abs=1e-9)
        assert k_at(44.0) == pytest.approx(1.0, abs=1e-9)
        assert k_at(46.5) < 1.0
        assert k_at(52.0) > 1.0

    def test_lcc_conformal(self):
        # conformality: the numeric Jacobian's columns (scaled to the
        # ellipsoid metric) have equal norms and are orthogonal
        p = proj.CONIC_CRS["EPSG:2154"]
        a, e2 = 6378137.0, 0.00669437999014132
        for lon, lat in ((1.0, 43.0), (6.0, 48.5), (-3.0, 50.0)):
            d = 1e-6
            E0, N0 = proj.lcc_forward(lon, lat, *p[1:9])
            E1, N1 = proj.lcc_forward(lon + d, lat, *p[1:9])
            E2, N2 = proj.lcc_forward(lon, lat + d, *p[1:9])
            phi = np.radians(lat)
            W = np.sqrt(1 - e2 * np.sin(phi) ** 2)
            nu, rho = a / W, a * (1 - e2) / W**3
            gx = np.array([float(E1 - E0), float(N1 - N0)]) / (
                nu * np.cos(phi) * np.radians(d))
            gy = np.array([float(E2 - E0), float(N2 - N0)]) / (rho * np.radians(d))
            assert np.linalg.norm(gx) == pytest.approx(np.linalg.norm(gy), rel=1e-4)
            cosang = gx @ gy / (np.linalg.norm(gx) * np.linalg.norm(gy))
            assert abs(cosang) < 1e-4

    def test_albers_preserves_area(self):
        # Jacobian determinant wrt (lambda, phi) must equal the ellipsoid
        # area element nu*rho*cos(phi) everywhere
        p = proj.CONIC_CRS["EPSG:5070"]
        a, e2 = 6378137.0, 0.00669437999014132
        for lon, lat in ((-120.0, 35.0), (-96.0, 23.0), (-70.0, 45.0)):
            d = 1e-6
            E0, N0 = proj.aea_forward(lon, lat, *p[1:9])
            E1, N1 = proj.aea_forward(lon + d, lat, *p[1:9])
            E2, N2 = proj.aea_forward(lon, lat + d, *p[1:9])
            J = abs(float(E1 - E0) * float(N2 - N0) - float(E2 - E0) * float(N1 - N0))
            J /= np.radians(d) ** 2
            phi = np.radians(lat)
            W = np.sqrt(1 - e2 * np.sin(phi) ** 2)
            nu, rho = a / W, a * (1 - e2) / W**3
            assert J == pytest.approx(nu * rho * np.cos(phi), rel=1e-4)

    def test_st_transform_conic_end_to_end(self, spark):
        from sedona_db_spark.functions import st

        pts = wkb.encode_points_xy(np.array([2.3522]), np.array([48.8566]))
        df = spark.createDataFrame([(bytes(pts[0]),)], "geom BINARY")
        out = df.select(
            st.ST_Transform("geom", F.lit("EPSG:4326"), F.lit("EPSG:2154")).alias("g")
        ).collect()[0]["g"]
        g = wkb.parse(bytes(out))
        E, N = g.coords[0][0], g.coords[0][1]
        p = proj.CONIC_CRS["EPSG:2154"]
        Ek, Nk = proj.lcc_forward(2.3522, 48.8566, *p[1:9])
        assert E == pytest.approx(float(Ek), abs=1e-9)
        assert N == pytest.approx(float(Nk), abs=1e-9)
        # Paris in Lambert-93 is ~(652.5 km, 6.862 Mm) — coarse envelope
        assert 600_000 < E < 700_000 and 6_800_000 < N < 6_900_000
        back = df.select(
            st.ST_Transform(
                st.ST_Transform("geom", F.lit("EPSG:4326"), F.lit("EPSG:2154")),
                F.lit("EPSG:2154"), F.lit("EPSG:4326"),
            ).alias("g")
        ).collect()[0]["g"]
        gb = wkb.parse(bytes(back))
        assert gb.coords[0][0] == pytest.approx(2.3522, abs=1e-9)
        assert gb.coords[0][1] == pytest.approx(48.8566, abs=1e-9)


class TestPolarStereographic:
    """Snyder §21 polar stereographic: EPSG:3031/3413/3976 (variant B) and
    UPS EPSG:5041/5042 (variant A). The UPS vector is the published EPSG
    Guidance Note 7-2 worked example."""

    def test_ups_north_epsg_worked_example(self):
        # GN 7-2: UPS North, 73°N 44°E -> E 3320416.75, N 632668.43
        p = proj.PS_CRS["EPSG:5041"]
        E, N = proj.ps_forward(44.0, 73.0, *p)
        assert float(E) == pytest.approx(3_320_416.75, abs=0.01)
        assert float(N) == pytest.approx(632_668.43, abs=0.01)
        lon, lat = proj.ps_inverse(E, N, *p)
        assert float(lon) == pytest.approx(44.0, abs=1e-9)
        assert float(lat) == pytest.approx(73.0, abs=1e-9)

    def test_pole_maps_to_false_origin(self):
        for code, pole_lat in [("EPSG:5041", 90.0), ("EPSG:5042", -90.0),
                               ("EPSG:3031", -90.0), ("EPSG:3413", 90.0)]:
            p = proj.PS_CRS[code]
            E, N = proj.ps_forward(0.0, pole_lat, *p)
            assert float(E) == pytest.approx(p[3], abs=1e-6)
            assert float(N) == pytest.approx(p[4], abs=1e-6)

    @pytest.mark.parametrize("code,lons,lats", [
        ("EPSG:3031", [-180.0, -120.0, 0.0, 45.0, 179.5], [-89.0, -75.0, -71.0, -60.0, -55.0]),
        ("EPSG:3413", [-180.0, -45.0, 0.0, 90.0, 179.5], [89.0, 70.0, 60.0, 45.0, 35.0]),
        ("EPSG:3976", [-90.0, 0.0, 90.0, -180.0, -179.5], [-85.0, -70.0, -60.0, -50.0, -45.0]),
        ("EPSG:5042", [-150.0, -60.0, 0.0, 60.0, 150.0], [-88.0, -80.0, -75.0, -70.0, -65.0]),
    ])
    def test_roundtrip(self, code, lons, lats):
        p = proj.PS_CRS[code]
        E, N = proj.ps_forward(np.array(lons), np.array(lats), *p)
        lon, lat = proj.ps_inverse(E, N, *p)
        np.testing.assert_allclose(lon, lons, atol=1e-9)
        np.testing.assert_allclose(lat, lats, atol=1e-9)

    def test_unit_scale_at_standard_parallel(self):
        """Variant-B k0 is derived so local scale = 1 at lat_ts (3031: -71)."""
        p = proj.PS_CRS["EPSG:3031"]
        d = 1e-4
        E1, N1 = proj.ps_forward(10.0, -71.0, *p)
        E2, N2 = proj.ps_forward(10.0 + d, -71.0, *p)
        proj_len = float(np.hypot(E2 - E1, N2 - N1))
        a, e2 = 6378137.0, float(proj._E) ** 2
        nu = a / np.sqrt(1 - e2 * np.sin(np.radians(-71.0)) ** 2)
        arc = nu * np.cos(np.radians(-71.0)) * np.radians(d)
        assert proj_len / arc == pytest.approx(1.0, abs=1e-9)

    def test_conformality(self):
        """Scale is direction-independent: dE/dlon-step and dN/dlat-step
        lengths agree at any point (polar stereographic is conformal)."""
        p = proj.PS_CRS["EPSG:3413"]
        lon, lat, d = 30.0, 75.0, 1e-5
        E0, N0 = proj.ps_forward(lon, lat, *p)
        E1, N1 = proj.ps_forward(lon + d, lat, *p)
        E2, N2 = proj.ps_forward(lon, lat + d, *p)
        a, e2 = 6378137.0, float(proj._E) ** 2
        W = np.sqrt(1 - e2 * np.sin(np.radians(lat)) ** 2)
        nu, rho = a / W, a * (1 - e2) / W**3
        k_par = float(np.hypot(E1 - E0, N1 - N0)) / (nu * np.cos(np.radians(lat)) * np.radians(d))
        k_mer = float(np.hypot(E2 - E0, N2 - N0)) / (rho * np.radians(d))
        assert k_par == pytest.approx(k_mer, rel=1e-6)


class TestWorldMercator:
    def test_roundtrip(self):
        lons = np.array([-179.9, -60.0, 0.0, 30.0, 179.9])
        lats = np.array([-80.0, -35.0, 0.0, 51.5, 83.0])
        E, N = proj.merc_forward(lons, lats)
        lon, lat = proj.merc_inverse(E, N)
        np.testing.assert_allclose(lon, lons, atol=1e-9)
        np.testing.assert_allclose(lat, lats, atol=1e-9)

    def test_equator_identities(self):
        E, N = proj.merc_forward(90.0, 0.0)
        assert float(N) == pytest.approx(0.0, abs=1e-9)
        assert float(E) == pytest.approx(6378137.0 * np.pi / 2, abs=1e-6)

    def test_scale_identity(self):
        """Ellipsoidal Mercator scale: k = sqrt(1 - e² sin²φ)/cos φ."""
        a, e2 = 6378137.0, float(proj._E) ** 2
        for lat in (0.0, 30.0, 55.0, -70.0):
            d = 1e-5
            E1, _ = proj.merc_forward(10.0, lat)
            E2, _ = proj.merc_forward(10.0 + d, lat)
            nu = a / np.sqrt(1 - e2 * np.sin(np.radians(lat)) ** 2)
            k = float(E2 - E1) / (nu * np.cos(np.radians(lat)) * np.radians(d))
            expect = np.sqrt(1 - e2 * np.sin(np.radians(lat)) ** 2) / np.cos(np.radians(lat))
            assert k == pytest.approx(float(expect), rel=1e-9)

    def test_st_transform_ps_and_merc_end_to_end(self, spark):
        from sedona_db_spark.functions import st

        pts = wkb.encode_points_xy(np.array([166.668]), np.array([-77.846]))  # McMurdo
        df = spark.createDataFrame([(bytes(pts[0]),)], "geom BINARY")
        out = df.select(
            st.ST_Transform("geom", F.lit("EPSG:4326"), F.lit("EPSG:3031")).alias("g")
        ).collect()[0]["g"]
        g = wkb.parse(bytes(out))
        p = proj.PS_CRS["EPSG:3031"]
        Ek, Nk = proj.ps_forward(166.668, -77.846, *p)
        assert g.coords[0][0] == pytest.approx(float(Ek), abs=1e-9)
        assert g.coords[0][1] == pytest.approx(float(Nk), abs=1e-9)
        back = df.select(
            st.ST_Transform(
                st.ST_Transform("geom", F.lit("EPSG:4326"), F.lit("EPSG:3395")),
                F.lit("EPSG:3395"), F.lit("EPSG:4326"),
            ).alias("g")
        ).collect()[0]["g"]
        gb = wkb.parse(bytes(back))
        assert gb.coords[0][0] == pytest.approx(166.668, abs=1e-9)
        assert gb.coords[0][1] == pytest.approx(-77.846, abs=1e-9)


class TestProj4Strings:
    """ST_Transform accepts proj4 strings with arbitrary parameters for
    every implemented family — equivalent EPSG code and proj4 string must
    produce bit-identical coordinates."""

    @pytest.mark.parametrize("epsg,p4", [
        ("EPSG:32633", "+proj=utm +zone=33 +datum=WGS84"),
        ("EPSG:32733", "+proj=utm +zone=33 +south +datum=WGS84"),
        ("EPSG:3035", "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80"),
        ("EPSG:2154", "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80"),
        ("EPSG:5070", "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +x_0=0 +y_0=0 +ellps=GRS80"),
        ("EPSG:3031", "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84"),
        ("EPSG:5041", "+proj=stere +lat_0=90 +k_0=0.994 +lon_0=0 +x_0=2000000 +y_0=2000000 +datum=WGS84"),
        ("EPSG:3395", "+proj=merc +lon_0=0 +k_0=1 +x_0=0 +y_0=0 +datum=WGS84"),
    ])
    def test_epsg_equals_proj4(self, spark, epsg, p4):
        from sedona_db_spark.functions import st

        lon, lat = (15.3, 47.2) if "south" not in p4 and "stere +lat_0=-90" not in p4 else (
            (15.3, -47.2) if "south" in p4 else (15.3, -75.0)
        )
        pts = wkb.encode_points_xy(np.array([lon]), np.array([lat]))
        df = spark.createDataFrame([(bytes(pts[0]),)], "geom BINARY")

        def xy(crs):
            out = df.select(
                st.ST_Transform("geom", F.lit("EPSG:4326"), F.lit(crs)).alias("g")
            ).collect()[0]["g"]
            g = wkb.parse(bytes(out))
            return g.coords[0][0], g.coords[0][1]

        xe, ye = xy(epsg)
        xp, yp = xy(p4)
        assert xe == xp and ye == yp

    def test_proj4_roundtrip_custom_params(self, spark):
        """A CRS with NO EPSG pin (custom LCC) round-trips through
        ST_Transform — the case proj4 support exists for."""
        from sedona_db_spark.functions import st

        p4 = "+proj=lcc +lat_1=10 +lat_2=40 +lat_0=25 +lon_0=120 +x_0=500000 +y_0=100000"
        pts = wkb.encode_points_xy(np.array([118.7]), np.array([31.2]))
        df = spark.createDataFrame([(bytes(pts[0]),)], "geom BINARY")
        back = df.select(
            st.ST_Transform(
                st.ST_Transform("geom", F.lit("EPSG:4326"), F.lit(p4)),
                F.lit(p4), F.lit("EPSG:4326"),
            ).alias("g")
        ).collect()[0]["g"]
        g = wkb.parse(bytes(back))
        assert g.coords[0][0] == pytest.approx(118.7, abs=1e-9)
        assert g.coords[0][1] == pytest.approx(31.2, abs=1e-9)

    def test_non_wgs84_datum_raises(self):
        from sedona_db_spark.geometry.proj import parse_proj4

        # NAD27 without grids points at the +nadgrids route (round-5:
        # geometry/ntv2.py implements the grid-shift pipeline)
        with pytest.raises(NotImplementedError, match="nadgrids"):
            parse_proj4("+proj=utm +zone=30 +datum=NAD27")
        with pytest.raises(NotImplementedError, match="not implemented"):
            parse_proj4("+proj=utm +zone=30 +datum=POTSDAM")
        # families whose kernels stay hard-wired to WGS84 constants
        # (lcc/aea/omerc are ellipsoid-parameterized since round 4)
        with pytest.raises(NotImplementedError, match="WGS84"):
            parse_proj4("+proj=laea +lat_0=52 +lon_0=10 +ellps=airy")
        # oblique stere is implemented since round 5 (Snyder §21 single
        # projection) — it must parse, not raise
        assert parse_proj4("+proj=stere +lat_0=52 +lon_0=4")[0] == "STEREOBL"
        assert parse_proj4("EPSG:4326") is None


def test_merc_lat_ts_proj4():
    """+proj=merc +lat_ts derives k0 = m(lat_ts) (Snyder §7) instead of
    silently keeping k0=1 (ADVICE r3). EPSG:3832 (PDC Mercator) uses
    lat_ts=0 == k0=1; a nonzero lat_ts must scale by ~cos(lat_ts)."""
    import math

    import numpy as np

    from sedona_db_spark.geometry import proj

    spec = proj.parse_proj4("+proj=merc +lat_ts=41.0 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84")
    assert spec[0] == "MERC"
    lon0, k0, fe, fn = spec[1]
    # m(41°) on WGS84: cos(phi)/sqrt(1 - e^2 sin^2 phi)
    e2 = 0.00669437999014
    phi = math.radians(41.0)
    want = math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)
    assert abs(k0 - want) < 1e-12
    # local scale at lat_ts is 1: dE/dlon at lat 41 == arc length per deg lon
    E1, _ = proj.merc_forward(10.0, 41.0, lon0=lon0, k0=k0)
    E2, _ = proj.merc_forward(10.001, 41.0, lon0=lon0, k0=k0)
    a = 6378137.0
    nu = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
    arc = math.radians(0.001) * nu * math.cos(phi)
    assert abs((float(E2) - float(E1)) / arc - 1.0) < 1e-9
    # lat_ts takes precedence over an explicit k_0 (PROJ semantics)
    spec2 = proj.parse_proj4("+proj=merc +lat_ts=41.0 +k_0=0.5 +datum=WGS84")
    assert abs(spec2[1][1] - want) < 1e-12


class TestGeneralTmerc:
    """Round-4: Krüger core generalized beyond UTM (VERDICT r3 next #1).

    Oracle vectors: the OSGB36 worked example from the OS 'A guide to
    coordinate systems in Great Britain' (Annexe), plus an independent
    Redfearn-series implementation (the OSGB/LINZ official TM formulation
    — different series lineage than Karney/Krüger) for NZTM.
    """

    def test_osgb_worked_example(self):
        """OS guide Annexe: 52°39'27.2531"N 1°43'4.5177"E ->
        E 651409.903 N 313177.270 (Airy 1830, projection only)."""
        from sedona_db_spark.geometry import proj

        lat = 52 + 39 / 60 + 27.2531 / 3600
        lon = 1 + 43 / 60 + 4.5177 / 3600
        E, N = proj.tmerc_forward(
            lon, lat, lat0=49.0, lon0=-2.0, k0=0.9996012717,
            fe=400_000.0, fn=-100_000.0, ellps="AIRY")
        assert abs(float(E) - 651409.903) < 0.001
        assert abs(float(N) - 313177.270) < 0.001
        lon2, lat2 = proj.tmerc_inverse(
            E, N, lat0=49.0, lon0=-2.0, k0=0.9996012717,
            fe=400_000.0, fn=-100_000.0, ellps="AIRY")
        assert abs(float(lon2) - lon) < 1e-11
        assert abs(float(lat2) - lat) < 1e-11

    @staticmethod
    def _redfearn_forward(lon, lat, lat0, lon0, k0, fe, fn, a, f):
        """Independent oracle: Redfearn/OS Map Projections series (the
        official OSGB & LINZ TM formulation, public: OS guide Annexe C),
        good to well under 1 mm within a few degrees of the CM."""
        import math as m

        e2 = f * (2 - f)
        n = f / (2 - f)
        phi, phi0 = m.radians(lat), m.radians(lat0)
        lam = m.radians(lon - lon0)
        s, c = m.sin(phi), m.cos(phi)
        nu = a * k0 * (1 - e2 * s * s) ** -0.5
        rho = a * k0 * (1 - e2) * (1 - e2 * s * s) ** -1.5
        eta2 = nu / rho - 1
        # meridian arc (OS guide eq. for M, Bessel-form in n — uses the
        # SEMI-MINOR axis b)
        b = a * (1 - f)
        dphi, sphi = phi - phi0, phi + phi0
        M = b * k0 * (
            (1 + n + 5 / 4 * n**2 + 5 / 4 * n**3) * dphi
            - (3 * n + 3 * n**2 + 21 / 8 * n**3) * m.sin(dphi) * m.cos(sphi)
            + (15 / 8 * n**2 + 15 / 8 * n**3) * m.sin(2 * dphi) * m.cos(2 * sphi)
            - 35 / 24 * n**3 * m.sin(3 * dphi) * m.cos(3 * sphi)
        )
        t = m.tan(phi)
        I = M + fn
        II = nu / 2 * s * c
        III = nu / 24 * s * c**3 * (5 - t**2 + 9 * eta2)
        IIIA = nu / 720 * s * c**5 * (61 - 58 * t**2 + t**4)
        IV = nu * c
        V = nu / 6 * c**3 * (nu / rho - t**2)
        VI = nu / 120 * c**5 * (5 - 18 * t**2 + t**4 + 14 * eta2 - 58 * t**2 * eta2)
        N = I + II * lam**2 + III * lam**4 + IIIA * lam**6
        E = fe + IV * lam + V * lam**3 + VI * lam**5
        return E, N

    def test_nztm_vs_redfearn(self):
        """NZTM2000 (EPSG:2193, GRS80): Krüger vs independent Redfearn
        series agree < 1 mm across the NZ mainland extent."""
        from sedona_db_spark.geometry import proj

        a, f = proj.ELLIPSOIDS["GRS80"]
        for lon, lat in [(174.7762, -41.2865), (172.6362, -43.5320),
                         (168.0, -46.6), (176.9, -37.7), (173.0, -41.0)]:
            E, N = proj.tmerc_forward(lon, lat, lat0=0.0, lon0=173.0,
                                      k0=0.9996, fe=1_600_000.0,
                                      fn=10_000_000.0, ellps="GRS80")
            Er, Nr = self._redfearn_forward(lon, lat, 0.0, 173.0, 0.9996,
                                            1_600_000.0, 10_000_000.0, a, f)
            assert abs(float(E) - Er) < 1e-3, (lon, lat)
            assert abs(float(N) - Nr) < 1e-3, (lon, lat)

    def test_osgb_vs_redfearn_grid(self):
        """OSGB grid: the two independent series agree < 1 mm over GB."""
        from sedona_db_spark.geometry import proj

        a, f = proj.ELLIPSOIDS["AIRY"]
        for lon, lat in [(-5.2, 50.0), (-3.0, 53.5), (0.5, 52.0),
                         (-2.0, 49.0), (1.8, 51.1), (-6.2, 57.5)]:
            E, N = proj.tmerc_forward(lon, lat, lat0=49.0, lon0=-2.0,
                                      k0=0.9996012717, fe=400_000.0,
                                      fn=-100_000.0, ellps="AIRY")
            Er, Nr = self._redfearn_forward(lon, lat, 49.0, -2.0,
                                            0.9996012717, 400_000.0,
                                            -100_000.0, a, f)
            assert abs(float(E) - Er) < 1e-3, (lon, lat)
            assert abs(float(N) - Nr) < 1e-3, (lon, lat)

    def test_utm_is_a_tmerc_instance(self):
        """The UTM wrappers delegate to the generalized core with
        unchanged results (bit-comparable at 1e-9 m)."""
        import numpy as np

        from sedona_db_spark.geometry import proj

        rng = np.random.default_rng(4)
        lon = rng.uniform(9.0, 15.0, 500)
        lat = rng.uniform(-80.0, 84.0, 500)
        E1, N1 = proj.utm_forward(lon, lat, zone=32, north=True)
        E2, N2 = proj.tmerc_forward(lon, lat, lat0=0.0, lon0=9.0, k0=0.9996,
                                    fe=500_000.0, fn=0.0)
        assert np.max(np.abs(E1 - E2)) < 1e-9
        assert np.max(np.abs(N1 - N2)) < 1e-9

    def test_tmerc_roundtrip_property(self):
        """Forward∘inverse is identity to 1e-10 deg for every registered
        TMERC grid over its domain."""
        import numpy as np

        from sedona_db_spark.geometry import proj

        rng = np.random.default_rng(9)
        domains = {
            "EPSG:27700": ((-7.5, 1.8), (49.9, 60.8)),
            "EPSG:2193": ((166.4, 178.6), (-47.3, -34.0)),
            "EPSG:31467": ((7.5, 10.5), (47.3, 55.0)),
        }
        for code, ((x0, x1), (y0, y1)) in domains.items():
            lat0, lon0, k0, fe, fn, ellps, _ = proj.TMERC_CRS[code]
            lon = rng.uniform(x0, x1, 300)
            lat = rng.uniform(y0, y1, 300)
            E, N = proj.tmerc_forward(lon, lat, lat0, lon0, k0, fe, fn, ellps)
            lon2, lat2 = proj.tmerc_inverse(E, N, lat0, lon0, k0, fe, fn, ellps)
            assert np.max(np.abs(lon2 - lon)) < 1e-10, code
            assert np.max(np.abs(lat2 - lat)) < 1e-10, code

    def test_helmert_datum_shift(self):
        """OSGB36<->WGS84 Helmert: forward∘inverse closes to the 2D
        height-drop floor (~1e-8 deg — the same non-closure PROJ shows
        for 2D coords), and London's known shift magnitude (~100 m E/W
        at Greenwich: OSGB36 lon of the WGS84 meridian is ~ -0.0015°)."""
        import numpy as np

        from sedona_db_spark.geometry import proj

        p = proj.TMERC_CRS["EPSG:27700"][6]
        a, f = proj.ELLIPSOIDS["AIRY"]
        lon, lat = np.array([-0.1278, -3.0, 1.0]), np.array([51.5074, 53.0, 52.0])
        lw, pw = proj.datum_to_wgs84(lon, lat, a, f, p)
        lb, pb = proj.datum_from_wgs84(lw, pw, a, f, p)
        assert np.max(np.abs(lb - lon)) < 5e-8
        assert np.max(np.abs(pb - lat)) < 5e-8
        # the OSGB36->WGS84 shift in GB is ~ +0.001..0.002 deg in lon
        assert 0.0005 < abs(float(lw[0] - lon[0])) < 0.003

    def test_st_transform_bng_nztm(self, spark):
        """ST_Transform end-to-end through the WGS84 hub: 4326 -> 27700
        applies the datum shift (result differs from projection-only by
        ~100 m) and roundtrips; 4326 -> 2193 matches direct tmerc."""
        import numpy as np
        from pyspark.sql import functions as F

        from sedona_db_spark.functions import st
        from sedona_db_spark.geometry import proj, wkb

        st.register_all(spark)
        df = spark.createDataFrame(
            [(0, bytes(wkb.encode_points_xy(np.array([-0.1278]),
                                            np.array([51.5074]))[0]))],
            "id LONG, g BINARY")
        out = df.select(
            st.ST_X(st.ST_Transform(F.col("g"), F.lit("EPSG:4326"),
                                    F.lit("EPSG:27700"))).alias("e"),
            st.ST_Y(st.ST_Transform(F.col("g"), F.lit("EPSG:4326"),
                                    F.lit("EPSG:27700"))).alias("n"),
        ).collect()[0]
        # projection-only (no datum shift) value for comparison
        E0, N0 = proj.tmerc_forward(-0.1278, 51.5074, 49.0, -2.0,
                                    0.9996012717, 400_000.0, -100_000.0,
                                    "AIRY")
        shift = ((out["e"] - float(E0)) ** 2 + (out["n"] - float(N0)) ** 2) ** 0.5
        assert 50.0 < shift < 200.0  # the OSGB36 datum shift is ~120 m here
        # roundtrip 27700 -> 4326
        back = df.select(
            st.ST_AsText(st.ST_Transform(
                st.ST_Transform(F.col("g"), F.lit("EPSG:4326"), F.lit("EPSG:27700")),
                F.lit("EPSG:27700"), F.lit("EPSG:4326"))).alias("t")).collect()[0]
        xs = back["t"].replace("POINT (", "").rstrip(")").split()
        assert abs(float(xs[0]) + 0.1278) < 1e-6
        assert abs(float(xs[1]) - 51.5074) < 1e-6
        # NZTM via proj4 string == EPSG:2193 (no datum shift)
        df2 = spark.createDataFrame(
            [(0, bytes(wkb.encode_points_xy(np.array([174.7762]),
                                            np.array([-41.2865]))[0]))],
            "id LONG, g BINARY")
        for code in ("EPSG:2193",
                     "+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 "
                     "+x_0=1600000 +y_0=10000000 +ellps=GRS80"):
            o = df2.select(
                st.ST_X(st.ST_Transform(F.col("g"), F.lit("EPSG:4326"),
                                        F.lit(code))).alias("e"),
                st.ST_Y(st.ST_Transform(F.col("g"), F.lit("EPSG:4326"),
                                        F.lit(code))).alias("n"),
            ).collect()[0]
            E, N = proj.tmerc_forward(174.7762, -41.2865, 0.0, 173.0,
                                      0.9996, 1_600_000.0, 10_000_000.0,
                                      "GRS80")
            assert abs(o["e"] - float(E)) < 1e-6 and abs(o["n"] - float(N)) < 1e-6, code


class TestObliqueStereographic:
    """EPSG method 9809 (double stereographic) — Amersfoort / RD New."""

    def test_epsg_gn72_worked_example(self):
        """EPSG Guidance Note 7-2 §3.2.6 worked example: 53°N 6°E ->
        E 196105.283 N 557057.739 (Bessel 1841, projection only)."""
        from sedona_db_spark.geometry import proj

        spec = proj.OBLST_CRS["EPSG:28992"]
        E, N = proj.oblst_forward(6.0, 53.0, *spec[:5], ellps=spec[5])
        assert abs(float(E) - 196105.283) < 0.001
        assert abs(float(N) - 557057.739) < 0.001
        lon, lat = proj.oblst_inverse(E, N, *spec[:5], ellps=spec[5])
        assert abs(float(lon) - 6.0) < 1e-11
        assert abs(float(lat) - 53.0) < 1e-11

    def test_roundtrip_property(self):
        import numpy as np

        from sedona_db_spark.geometry import proj

        rng = np.random.default_rng(6)
        spec = proj.OBLST_CRS["EPSG:28992"]
        lon = rng.uniform(3.2, 7.2, 300)
        lat = rng.uniform(50.7, 53.6, 300)
        E, N = proj.oblst_forward(lon, lat, *spec[:5], ellps=spec[5])
        lon2, lat2 = proj.oblst_inverse(E, N, *spec[:5], ellps=spec[5])
        assert np.max(np.abs(lon2 - lon)) < 1e-10
        assert np.max(np.abs(lat2 - lat)) < 1e-10

    def test_st_transform_rdnew(self, spark):
        """4326 -> 28992 applies the Amersfoort datum shift (~100 m from
        projection-only) and roundtrips; +proj=sterea parses."""
        import numpy as np
        from pyspark.sql import functions as F

        from sedona_db_spark.functions import st
        from sedona_db_spark.geometry import proj, wkb

        df = spark.createDataFrame(
            [(0, bytes(wkb.encode_points_xy(np.array([4.9041]),
                                            np.array([52.3676]))[0]))],
            "id LONG, g BINARY")  # Amsterdam, WGS84
        o = df.select(
            st.ST_X(st.ST_Transform(F.col("g"), F.lit("EPSG:4326"),
                                    F.lit("EPSG:28992"))).alias("e"),
            st.ST_Y(st.ST_Transform(F.col("g"), F.lit("EPSG:4326"),
                                    F.lit("EPSG:28992"))).alias("n"),
        ).collect()[0]
        # Amsterdam RD: E ~ 121k, N ~ 487k
        assert 115_000 < o["e"] < 128_000 and 480_000 < o["n"] < 493_000
        spec = proj.OBLST_CRS["EPSG:28992"]
        E0, N0 = proj.oblst_forward(4.9041, 52.3676, *spec[:5], ellps=spec[5])
        shift = ((o["e"] - float(E0)) ** 2 + (o["n"] - float(N0)) ** 2) ** 0.5
        assert 30.0 < shift < 200.0  # the Amersfoort<->WGS84 datum offset
        back = df.select(st.ST_AsText(st.ST_Transform(
            st.ST_Transform(F.col("g"), F.lit("EPSG:4326"), F.lit("EPSG:28992")),
            F.lit("EPSG:28992"), F.lit("EPSG:4326"))).alias("t")).collect()[0]
        xs = back["t"].replace("POINT (", "").rstrip(")").split()
        assert abs(float(xs[0]) - 4.9041) < 1e-6
        assert abs(float(xs[1]) - 52.3676) < 1e-6
        # proj4 spelling routes to the same kernel (no datum shift term)
        spec4 = proj.parse_proj4(
            "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 "
            "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel")
        assert spec4[0] == "OBLST" and spec4[1][5] == "BESSEL"


class TestObliqueMercator:
    """Hotine Oblique Mercator variant B (EPSG 9815): the EPSG GN 7-2
    worked example (Timbalai 1948 / RSO Borneo) pins the general-azimuth
    branch; Swiss LV95/LV03 (azimuth 90°, PROJ `somerc`) pins the special
    case — its projection center maps to the false origin by definition."""

    def test_gn72_borneo_worked_example(self):
        from sedona_db_spark.geometry import proj

        p = proj.OMERC_CRS["EPSG:29873"]
        lat = 5 + 23 / 60 + 14.1129 / 3600
        lon = 115 + 48 / 60 + 19.8196 / 3600
        E, N = proj.omerc_forward(np.array([lon]), np.array([lat]),
                                  *p[:7], ellps=p[7])
        # EPSG GN 7-2 §3.2.4 publishes E 679245.73, N 596562.78
        assert abs(float(E[0]) - 679245.73) < 0.02
        assert abs(float(N[0]) - 596562.78) < 0.02
        lo, la = proj.omerc_inverse(E, N, *p[:7], ellps=p[7])
        assert abs(float(lo[0]) - lon) < 1e-12
        assert abs(float(la[0]) - lat) < 1e-12

    def test_swiss_center_and_directions(self):
        from sedona_db_spark.geometry import proj

        p = proj.OMERC_CRS["EPSG:2056"]
        E, N = proj.omerc_forward(np.array([p[1], p[1] + 0.1, p[1]]),
                                  np.array([p[0], p[0], p[0] + 0.1]),
                                  *p[:7], ellps=p[7])
        assert abs(float(E[0]) - 2_600_000.0) < 1e-6
        assert abs(float(N[0]) - 1_200_000.0) < 1e-6
        assert E[1] > E[0] and N[2] > N[0]  # east -> +E, north -> +N
        rng = np.random.default_rng(0)
        lons = rng.uniform(5.9, 10.5, 200)
        lats = rng.uniform(45.8, 47.8, 200)
        Eg, Ng = proj.omerc_forward(lons, lats, *p[:7], ellps=p[7])
        lo, la = proj.omerc_inverse(Eg, Ng, *p[:7], ellps=p[7])
        assert np.abs(lo - lons).max() < 1e-12
        assert np.abs(la - lats).max() < 1e-12

    def test_st_transform_lv95_roundtrip(self, spark):
        from sedona_db_spark.functions import st
        from sedona_db_spark.geometry import wkb

        df = spark.createDataFrame(
            [(0, bytes(wkb.encode_points_xy(np.array([7.4474]),
                                            np.array([46.9480]))[0]))],
            "id LONG, g BINARY")  # Bern city, WGS84
        o = df.select(
            st.ST_X(st.ST_Transform(F.col("g"), F.lit("EPSG:4326"),
                                    F.lit("EPSG:2056"))).alias("e"),
            st.ST_Y(st.ST_Transform(F.col("g"), F.lit("EPSG:4326"),
                                    F.lit("EPSG:2056"))).alias("n"),
        ).collect()[0]
        # Bern LV95: E ~ 2600.6 km, N ~ 1199.5 km
        assert 2_595_000 < o["e"] < 2_606_000
        assert 1_194_000 < o["n"] < 1_205_000
        back = df.select(st.ST_AsText(st.ST_Transform(
            st.ST_Transform(F.col("g"), F.lit("EPSG:4326"), F.lit("EPSG:2056")),
            F.lit("EPSG:2056"), F.lit("EPSG:4326"))).alias("t")).collect()[0]
        xs = back["t"].replace("POINT (", "").rstrip(")").split()
        assert abs(float(xs[0]) - 7.4474) < 1e-6
        assert abs(float(xs[1]) - 46.9480) < 1e-6
        # LV03 differs from LV95 by exactly the 2,000,000/1,000,000 offset
        o3 = df.select(
            st.ST_X(st.ST_Transform(F.col("g"), F.lit("EPSG:4326"),
                                    F.lit("EPSG:21781"))).alias("e")).collect()[0]
        assert abs((o["e"] - 2_000_000.0) - o3["e"]) < 1e-6

    def test_somerc_proj4_matches_epsg(self):
        from sedona_db_spark.geometry import proj

        pj = proj.parse_proj4(
            "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 "
            "+k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel "
            "+towgs84=674.374,15.056,405.346,0,0,0,0")
        assert pj[0] == "OMERC"
        p = proj.OMERC_CRS["EPSG:2056"]
        E1, N1 = proj.omerc_forward(np.array([8.0]), np.array([47.0]),
                                    *pj[1][:7], ellps=pj[1][7])
        E2, N2 = proj.omerc_forward(np.array([8.0]), np.array([47.0]),
                                    *p[:7], ellps=p[7])
        assert abs(float(E1[0] - E2[0])) < 1e-6
        assert abs(float(N1[0] - N2[0])) < 1e-6

    def test_omerc_variant_a_refused(self):
        import pytest

        from sedona_db_spark.geometry import proj

        with pytest.raises(NotImplementedError):
            proj.parse_proj4("+proj=omerc +lat_0=4 +lonc=115 +alpha=53.3 "
                             "+k_0=0.99984 +no_uoff +ellps=WGS84")


class TestLcc1SP:
    """LCC one-standard-parallel (EPSG 9801): GN 7-2 Jamaica worked
    example + the NTF France Lambert zone II (k0, Clarke 1880 IGN, Paris
    meridian folded into lon0, Helmert datum shift)."""

    def test_gn72_jamaica_worked_example(self):
        from sedona_db_spark.geometry import proj

        lat = 17 + 55 / 60 + 55.80 / 3600
        lon = -(76 + 56 / 60 + 37.26 / 3600)
        E, N = proj.lcc_forward(np.array([lon]), np.array([lat]),
                                18.0, 18.0, 18.0, -77.0,
                                250_000.0, 150_000.0, k0=1.0, ellps="CLRK66")
        # EPSG GN 7-2 §3.1.1.2 publishes E 255966.58, N 142493.51
        assert abs(float(E[0]) - 255966.58) < 0.02
        assert abs(float(N[0]) - 142493.51) < 0.02

    def test_1sp_degenerates_to_2sp_at_k0_1(self):
        from sedona_db_spark.geometry import proj

        E1, N1 = proj.lcc_forward(np.array([3.0]), np.array([45.0]),
                                  46.5, 46.5, 46.5, 3.0, 0.0, 0.0, k0=1.0)
        E2, N2 = proj.lcc_forward(np.array([3.0]), np.array([45.0]),
                                  46.5, 46.5, 46.5, 3.0, 0.0, 0.0)
        assert abs(float(E1[0] - E2[0])) < 1e-9
        assert abs(float(N1[0] - N2[0])) < 1e-9

    def test_france_lambert_ii_roundtrip_and_proj4_twin(self):
        from sedona_db_spark.geometry import proj

        p = proj.CONIC_CRS["EPSG:27572"]
        rng = np.random.default_rng(1)
        lons = rng.uniform(-1.0, 6.0, 100)
        lats = rng.uniform(44.0, 50.0, 100)
        E, N = proj.conic_forward(lons, lats, p)
        lo, la = proj.conic_inverse(E, N, p)
        # Helmert inverse iteration leaves < 1e-8 deg (~1 mm)
        assert np.abs(lo - lons).max() < 1e-7
        assert np.abs(la - lats).max() < 1e-7
        pj = proj.parse_proj4(
            "+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=2.337229166666667 "
            "+k_0=0.99987742 +x_0=600000 +y_0=2200000 +ellps=CLRK80IGN "
            "+towgs84=-168,-60,320,0,0,0,0")
        assert pj[0] == "CONIC"
        E2, N2 = proj.conic_forward(np.array([2.3522]), np.array([48.8566]), pj[1])
        E3, N3 = proj.conic_forward(np.array([2.3522]), np.array([48.8566]), p)
        assert abs(float(E2[0] - E3[0])) < 1e-9
        assert abs(float(N2[0] - N3[0])) < 1e-9

    def test_st_transform_jamaica(self, spark):
        from sedona_db_spark.functions import st
        from sedona_db_spark.geometry import wkb

        df = spark.createDataFrame(
            [(0, bytes(wkb.encode_points_xy(np.array([-76.8]),
                                            np.array([18.0]))[0]))],
            "id LONG, g BINARY")
        o = df.select(
            st.ST_X(st.ST_Transform(F.col("g"), F.lit("EPSG:4326"),
                                    F.lit("EPSG:24200"))).alias("e"),
            st.ST_Y(st.ST_Transform(F.col("g"), F.lit("EPSG:4326"),
                                    F.lit("EPSG:24200"))).alias("n"),
        ).collect()[0]
        # ~0.2 deg east of the CM at the origin parallel
        assert 260_000 < o["e"] < 285_000 and 140_000 < o["n"] < 165_000
        back = df.select(st.ST_AsText(st.ST_Transform(
            st.ST_Transform(F.col("g"), F.lit("EPSG:4326"), F.lit("EPSG:24200")),
            F.lit("EPSG:24200"), F.lit("EPSG:4326"))).alias("t")).collect()[0]
        xs = back["t"].replace("POINT (", "").rstrip(")").split()
        assert abs(float(xs[0]) + 76.8) < 1e-6
        assert abs(float(xs[1]) - 18.0) < 1e-6

    def test_lcc_proj4_k0_not_dropped(self):
        from sedona_db_spark.geometry import proj

        with_k0 = proj.parse_proj4("+proj=lcc +lat_1=46.8 +lat_0=46.8 "
                                   "+lon_0=0 +k_0=0.99987742 +ellps=WGS84")
        without = proj.parse_proj4("+proj=lcc +lat_1=46.8 +lat_0=46.8 "
                                   "+lon_0=0 +ellps=WGS84")
        E1, _ = proj.conic_forward(np.array([2.0]), np.array([45.0]), with_k0[1])
        E2, _ = proj.conic_forward(np.array([2.0]), np.array([45.0]), without[1])
        assert abs(float(E1[0] / E2[0]) - 0.99987742) < 1e-9

    def test_albers_refuses_scale_factor(self):
        import pytest

        from sedona_db_spark.geometry import proj

        with pytest.raises(ValueError):
            proj.aea_forward(np.array([0.0]), np.array([45.0]),
                             29.5, 45.5, 23.0, -96.0, k0=0.5)


def test_projjson_crs_input(spark):
    """ST_Transform accepts a PROJJSON object string as a CRS (the
    reference's crs.rs parses authority codes or PROJJSON; GeoParquet 1.1
    metadata carries CRS in this shape)."""
    import json

    from sedona_db_spark.functions import st

    pj = json.dumps({"type": "ProjectedCRS", "name": "CH1903+ / LV95",
                     "id": {"authority": "EPSG", "code": 2056}})
    df = spark.createDataFrame(
        [(0, bytes(wkb.encode_points_xy(np.array([7.4474]),
                                        np.array([46.9480]))[0]))],
        "id LONG, g BINARY")
    e_pj = df.select(st.ST_X(st.ST_Transform(
        F.col("g"), F.lit("EPSG:4326"), F.lit(pj))).alias("e")).collect()[0]["e"]
    e_code = df.select(st.ST_X(st.ST_Transform(
        F.col("g"), F.lit("EPSG:4326"), F.lit("EPSG:2056"))).alias("e")).collect()[0]["e"]
    assert e_pj == e_code
    # malformed / id-less PROJJSON fails loudly, not silently
    with pytest.raises(Exception):
        df.select(st.ST_Transform(
            F.col("g"), F.lit("EPSG:4326"),
            F.lit('{"type":"GeographicCRS","name":"weird"}'))).collect()


class TestEqcSinu:
    def test_sinu_modis_extent(self):
        # the canonical MODIS sinusoidal grid west edge
        x, y = proj.sinu_forward(np.array([-180.0]), np.array([0.0]))
        assert x[0] == pytest.approx(-20015109.354, abs=0.01)
        lon, lat = proj.sinu_inverse(x, y)
        assert lon[0] == pytest.approx(-180.0) and lat[0] == pytest.approx(0.0)

    def test_sinu_round_trip_grid(self):
        lon = np.linspace(-179, 179, 23)
        lat = np.linspace(-85, 85, 23)
        x, y = proj.sinu_forward(lon, lat)
        lo, la = proj.sinu_inverse(x, y)
        assert np.allclose(lo, lon, atol=1e-9)
        assert np.allclose(la, lat, atol=1e-9)

    def test_eqc_round_trip_and_lat_ts(self):
        x, y = proj.eqc_forward(np.array([10.0]), np.array([45.0]),
                                lat_ts=30.0)
        lo, la = proj.eqc_inverse(x, y, lat_ts=30.0)
        assert lo[0] == pytest.approx(10.0) and la[0] == pytest.approx(45.0)
        # true scale at lat_ts: x shrinks by cos(30 deg)
        x0, _ = proj.eqc_forward(np.array([10.0]), np.array([45.0]))
        assert x[0] == pytest.approx(x0[0] * np.cos(np.radians(30.0)))

    def test_st_transform_proj4(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_AsText(ST_Transform(ST_Point(-180.0D, 0.0D), "
            "  'EPSG:4326', "
            "  '+proj=sinu +R=6371007.180918474')) AS s, "
            "ST_X(ST_Transform(ST_Transform(ST_Point(12.0D, 55.0D), "
            "  'EPSG:4326', '+proj=eqc'), "
            "  '+proj=eqc', 'EPSG:4326')) AS rt"
        ).collect()[0]
        assert row.s.startswith("POINT (-20015109.35")
        assert row.rt == pytest.approx(12.0)


class TestKrovak:
    """Krovak (EPSG 9819, S-JTSK) — EPSG Guidance Note 7-2 worked example
    + round-trip + axis-variant consistency (round-5; the reference
    reaches Krovak through PROJ, st_transform.rs:43-160)."""

    def test_epsg_worked_example(self):
        from sedona_db_spark.geometry import proj as P

        lat = 50 + 12 / 60 + 32.4416 / 3600
        lon = 16 + 50 / 60 + 59.1790 / 3600
        # the GN7-2 example is on the S-JTSK datum already: no shift
        X, Y = P.krovak_forward([lon], [lat], variant="south_west",
                                towgs84=None)
        assert X[0] == pytest.approx(1050538.643, abs=1e-2)
        assert Y[0] == pytest.approx(568990.997, abs=1e-2)
        blon, blat = P.krovak_inverse(X, Y, variant="south_west",
                                      towgs84=None)
        assert blon[0] == pytest.approx(lon, abs=1e-11)
        assert blat[0] == pytest.approx(lat, abs=1e-11)

    def test_roundtrip_with_datum_over_czechia(self):
        from sedona_db_spark.geometry import proj as P

        rng = np.random.default_rng(5)
        lon = rng.uniform(12.2, 18.8, 200)
        lat = rng.uniform(48.6, 51.0, 200)
        E, N = P.krovak_forward(lon, lat)          # EPSG:5514 axes
        assert np.all(E < 0) and np.all(N < 0)     # east-north are negative
        blon, blat = P.krovak_inverse(E, N)
        assert np.allclose(blon, lon, atol=1e-9)
        assert np.allclose(blat, lat, atol=1e-9)
        # the two variants are axis mirrors of each other
        X, Y = P.krovak_forward(lon, lat, variant="south_west")
        assert np.allclose(X, -N) and np.allclose(Y, -E)

    def test_st_transform_krovak_and_proj4(self, spark):
        from sedona_db_spark.functions import st

        df = spark.createDataFrame([(14.42, 50.09)], "x double, y double")
        g = df.select(st.ST_Point("x", "y").alias("geom"))
        row = g.select(
            st.ST_X(st.ST_Transform("geom", F.lit("EPSG:4326"),
                                    F.lit("EPSG:5514"))).alias("e"),
            st.ST_X(st.ST_Transform(
                st.ST_Transform("geom", F.lit("EPSG:4326"),
                                F.lit("EPSG:5514")),
                F.lit("EPSG:5514"), F.lit("EPSG:4326"))).alias("back_x"),
        ).collect()[0]
        # Prague lands in the S-JTSK east range (negative, ~-745 km)
        assert -760_000 < row["e"] < -730_000
        assert row["back_x"] == pytest.approx(14.42, abs=1e-7)  # ~1 cm
        # +proj=krovak with explicit parameters matches EPSG:5514
        p4 = ("+proj=krovak +lat_0=49.5 +lon_0=24.8333333333333 "
              "+alpha=30.2881397527778 +k=0.9999 +ellps=bessel "
              "+towgs84=589,76,480")
        row2 = g.select(
            st.ST_X(st.ST_Transform("geom", F.lit("EPSG:4326"),
                                    F.lit(p4))).alias("e")).collect()[0]
        assert row2["e"] == pytest.approx(row["e"], abs=1e-3)


class TestObliqueStere:
    """Oblique ellipsoidal stereographic (PROJ `stere` non-polar aspect;
    Snyder 1987 §21 conformal-latitude form, round-5 — the reference
    reaches it through PROJ, c/sedona-proj/src/st_transform.rs)."""

    def test_snyder_worked_example(self):
        # Snyder 1987 p. 313: Clarke 1866, phi1=40N lam0=100W k0=0.9999,
        # point 30N 90W -> x = 971630.8, y = -1063049.3 (published to 0.1 m)
        from sedona_db_spark.geometry.proj import (
            stere_obl_forward, stere_obl_inverse)
        x, y = stere_obl_forward(
            np.array([-90.0]), np.array([30.0]), lat0=40.0, lon0=-100.0,
            k0=0.9999, ellps="CLRK66")
        assert x[0] == pytest.approx(971630.8, abs=0.5)
        assert y[0] == pytest.approx(-1063049.3, abs=0.5)
        lon, lat = stere_obl_inverse(
            x, y, lat0=40.0, lon0=-100.0, k0=0.9999, ellps="CLRK66")
        assert lon[0] == pytest.approx(-90.0, abs=1e-9)
        assert lat[0] == pytest.approx(30.0, abs=1e-9)

    def test_roundtrip_grid(self):
        from sedona_db_spark.geometry.proj import (
            stere_obl_forward, stere_obl_inverse)
        rng = np.random.default_rng(7)
        lon = rng.uniform(-30, 30, 200)
        lat = rng.uniform(20, 70, 200)
        x, y = stere_obl_forward(lon, lat, lat0=52.0, lon0=5.0, k0=0.9999)
        lo, la = stere_obl_inverse(x, y, lat0=52.0, lon0=5.0, k0=0.9999)
        np.testing.assert_allclose(lo, lon, atol=1e-9)
        np.testing.assert_allclose(la, lat, atol=1e-9)

    def test_origin_scale_is_k0_and_conformal(self):
        # at the projection origin the scale must be k0 in every
        # direction (conformality): probe 1-meter geodesic steps N and E
        from sedona_db_spark.geometry.proj import stere_obl_forward
        lat0, lon0, k0 = 45.0, 7.0, 0.9995
        a, f = 6378137.0, 1 / 298.257223563
        e2 = f * (2 - f)
        p = math.radians(lat0)
        M = a * (1 - e2) / (1 - e2 * math.sin(p) ** 2) ** 1.5
        Nrad = a / math.sqrt(1 - e2 * math.sin(p) ** 2)
        dlat = math.degrees(1.0 / M)   # ~1 m north
        dlon = math.degrees(1.0 / (Nrad * math.cos(p)))  # ~1 m east
        lons = np.array([lon0, lon0, lon0 + dlon])
        lats = np.array([lat0, lat0 + dlat, lat0])
        x, y = stere_obl_forward(lons, lats, lat0=lat0, lon0=lon0, k0=k0)
        dn = math.hypot(x[1] - x[0], y[1] - y[0])
        de = math.hypot(x[2] - x[0], y[2] - y[0])
        assert dn == pytest.approx(k0, rel=1e-6)
        assert de == pytest.approx(k0, rel=1e-6)

    def test_agrees_with_sterea_near_origin(self):
        # single and double stereographic are distinct constructions that
        # agree in value and first derivative at the origin, so their
        # difference grows QUADRATICALLY with range (measured: 0.2 mm at
        # 1 km, 2 cm at 9 km, 96 m at 620 km). Near must agree to mm; far
        # must NOT agree (kernel-swap tripwire).
        from sedona_db_spark.geometry.proj import (
            oblst_forward, stere_obl_forward)
        lat0, lon0, k0 = 52.15616056, 5.38763889, 0.9999079
        near = (np.array([lon0 + 0.01]), np.array([lat0 + 0.005]))
        far = (np.array([lon0 + 6.0]), np.array([lat0 - 4.0]))
        for (lo, la), tol, must_agree in ((near, 1e-3, True), (far, 1.0, False)):
            xs, ys = stere_obl_forward(lo, la, lat0=lat0, lon0=lon0, k0=k0,
                                       ellps="BESSEL")
            xd, yd = oblst_forward(lo, la, lat0=lat0, lon0=lon0, k0=k0,
                                   ellps="BESSEL")
            d = math.hypot(xs[0] - xd[0], ys[0] - yd[0])
            assert (d < tol) == must_agree, d

    def test_st_transform_proj4_oblique_stere(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_X(p2) AS rx, ST_Y(p2) AS ry FROM (SELECT "
            "ST_Transform(ST_Transform(ST_Point(6.5D, 51.2D), 'EPSG:4326', "
            " '+proj=stere +lat_0=52 +lon_0=5 +k_0=0.9999 "
            "  +x_0=100000 +y_0=200000'), "
            " '+proj=stere +lat_0=52 +lon_0=5 +k_0=0.9999 "
            "  +x_0=100000 +y_0=200000', 'EPSG:4326') AS p2)"
        ).collect()[0]
        assert row.rx == pytest.approx(6.5, abs=1e-9)
        assert row.ry == pytest.approx(51.2, abs=1e-9)

    def test_polar_stere_ellipsoid_guard(self):
        from sedona_db_spark.geometry.proj import parse_proj4
        with pytest.raises(NotImplementedError, match="WGS84/GRS80-only"):
            parse_proj4("+proj=stere +lat_0=90 +ellps=bessel")
        with pytest.raises(NotImplementedError, match="lat_ts"):
            parse_proj4("+proj=stere +lat_0=50 +lat_ts=50")
        tag = parse_proj4("+proj=stere +lat_0=52 +lon_0=5 +ellps=bessel "
                          "+towgs84=565.417,50.3319,465.552,-0.398957,"
                          "0.343988,-1.8774,4.0725")
        assert tag[0] == "STEREOBL" and tag[1][5] == "BESSEL"


class TestRegionalUtmRegistry:
    """Round 5: ETRS89/NAD83/GDA94 UTM zone families + TM35FIN, Poland
    CS92, GDA94 Lambert — registry breadth for the most common regional
    datum variants (all GRS80, no shift)."""

    def test_zone_families_registered(self):
        assert proj.TMERC_CRS["EPSG:25832"][1] == 9.0
        assert proj.TMERC_CRS["EPSG:26918"][1] == -75.0
        assert proj.TMERC_CRS["EPSG:28355"][1] == 147.0
        assert proj.TMERC_CRS["EPSG:28355"][4] == 10_000_000.0

    def test_etrs89_utm_matches_wgs84_utm_to_sub_mm(self):
        # GRS80 and WGS84 differ only in 1/f at the 1e-7 level: the same
        # zone in EPSG:25832 and EPSG:32632 must agree to < 1 mm
        lon = np.array([8.5, 9.0, 11.9])
        lat = np.array([47.1, 54.0, 48.7])
        p = proj.TMERC_CRS["EPSG:25832"]
        e1, n1 = proj.tmerc_forward(lon, lat, lat0=p[0], lon0=p[1], k0=p[2],
                                    fe=p[3], fn=p[4], ellps=p[5])
        e2, n2 = proj.utm_forward(lon, lat, 32, True)
        assert np.max(np.abs(e1 - e2)) < 1e-3
        assert np.max(np.abs(n1 - n2)) < 1e-3

    def test_mga_zone_matches_southern_utm(self):
        lon = np.array([147.3, 145.1])
        lat = np.array([-37.8, -42.9])
        p = proj.TMERC_CRS["EPSG:28355"]
        e1, n1 = proj.tmerc_forward(lon, lat, lat0=p[0], lon0=p[1], k0=p[2],
                                    fe=p[3], fn=p[4], ellps=p[5])
        e2, n2 = proj.utm_forward(lon, lat, 55, False)
        assert np.max(np.abs(e1 - e2)) < 1e-3
        assert np.max(np.abs(n1 - n2)) < 1e-3

    def test_single_zone_grids_roundtrip(self):
        cases = [("EPSG:3067", 25.0, 62.0), ("EPSG:2180", 19.9, 52.2)]
        for code, lon, lat in cases:
            p = proj.TMERC_CRS[code]
            E, N = proj.tmerc_forward(np.array([lon]), np.array([lat]),
                                      lat0=p[0], lon0=p[1], k0=p[2],
                                      fe=p[3], fn=p[4], ellps=p[5])
            lo, la = proj.tmerc_inverse(E, N, lat0=p[0], lon0=p[1], k0=p[2],
                                        fe=p[3], fn=p[4], ellps=p[5])
            assert lo[0] == pytest.approx(lon, abs=1e-9)
            assert la[0] == pytest.approx(lat, abs=1e-9)

    def test_poland_cs92_negative_false_northing(self):
        # the -5,300,000 m false northing puts all of Poland in positive
        # six-digit northings well below 1e6
        p = proj.TMERC_CRS["EPSG:2180"]
        _, N = proj.tmerc_forward(np.array([19.0]), np.array([52.0]),
                                  lat0=p[0], lon0=p[1], k0=p[2],
                                  fe=p[3], fn=p[4], ellps=p[5])
        assert 0 < N[0] < 1_000_000

    def test_gda94_lambert_roundtrip_and_st_transform(self, spark):
        from pyspark.sql import functions as F

        from sedona_db_spark.functions import st

        df = spark.createDataFrame([(134.0, -25.0), (147.5, -38.0)],
                                   "x double, y double")
        out = (df.select(
            F.col("x"), F.col("y"),
            st.ST_Transform(
                st.ST_Transform(st.ST_Point("x", "y"),
                                F.lit("EPSG:4326"), F.lit("EPSG:3112")),
                F.lit("EPSG:3112"), F.lit("EPSG:4326")).alias("g"))
            .select(F.abs(st.ST_X("g") - F.col("x")).alias("dx"),
                    F.abs(st.ST_Y("g") - F.col("y")).alias("dy"))
            .collect())
        for r in out:
            assert r["dx"] < 1e-9 and r["dy"] < 1e-9
