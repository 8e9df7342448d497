"""UTM transform tests (geometry/proj.py — Krüger/Karney 6th-order series,
replacing the reference's PROJ-backed arbitrary ST_Transform for the UTM
family, c/sedona-proj/src/st_transform.rs)."""

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
