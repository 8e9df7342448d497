"""NTv2 grid-shift datums (round-5, VERDICT r4 next #4): .gsb reader /
writer round-trips, bilinear worked examples, the +nadgrids pipeline
through parse_proj4 and ST_Transform (reference reaches grid-shift
datums via PROJ, c/sedona-proj/src/st_transform.rs:43-160)."""

import numpy as np
import pytest

from sedona_db_spark.geometry import ntv2, proj


def _grid(name="TESTGRID", parent="NONE", s_lat=0.0, n_lat=3600.0,
          e_lon=3600.0, w_lon=7200.0, inc=360.0, dlat=None, dlon=None):
    nrows = int(round((n_lat - s_lat) / inc)) + 1
    ncols = int(round((w_lon - e_lon) / inc)) + 1
    if dlat is None:
        dlat = np.full((nrows, ncols), 1.0)
    if dlon is None:
        dlon = np.full((nrows, ncols), 2.0)
    return dict(name=name, parent=parent, s_lat=s_lat, n_lat=n_lat,
                e_lon=e_lon, w_lon=w_lon, lat_inc=inc, lon_inc=inc,
                dlat=dlat, dlon=dlon)


# the test grid covers lat 0..1 deg, lon -2..-1 deg (E_LONG=3600" west
# = -1 deg east, W_LONG=7200" west = -2 deg east)
IN_LON, IN_LAT = -1.5, 0.5


class TestGsbFormat:
    @pytest.mark.parametrize("endian", ["<", ">"])
    def test_write_read_roundtrip(self, tmp_path, endian):
        p = str(tmp_path / "t.gsb")
        ntv2.write_gsb(p, [_grid()], endian=endian)
        f = ntv2.read_gsb(p)
        assert len(f.grids) == 1
        g = f.grids[0]
        assert g.name == "TESTGRID" and g.nrows == 11 and g.ncols == 11
        assert np.allclose(g.dlat, 1.0) and np.allclose(g.dlon, 2.0)

    def test_bad_magic_rejected(self, tmp_path):
        p = str(tmp_path / "junk.gsb")
        open(p, "wb").write(b"\x00" * 64)
        with pytest.raises(ValueError, match="magic"):
            ntv2.read_gsb(p)

    def test_gs_count_consistency_checked(self, tmp_path):
        g = _grid()
        g["dlat"] = np.full((3, 3), 1.0)  # wrong shape vs increments
        g["dlon"] = np.full((3, 3), 2.0)
        p = str(tmp_path / "bad.gsb")
        ntv2.write_gsb(p, [g])
        with pytest.raises(ValueError, match="GS_COUNT"):
            ntv2.read_gsb(p)


class TestShiftMath:
    def test_constant_shift_worked_example(self, tmp_path):
        # uniform dlat=+1", dlon=+2" (positive west):
        # lat' = lat + 1/3600, lon'(east) = lon - 2/3600 — exact under
        # bilinear interpolation of a constant field, well under 1 cm
        p = str(tmp_path / "c.gsb")
        ntv2.write_gsb(p, [_grid()])
        lon, lat = ntv2.grids_to_wgs84([IN_LON], [IN_LAT], p)
        assert lon[0] == pytest.approx(IN_LON - 2.0 / 3600.0, abs=1e-12)
        assert lat[0] == pytest.approx(IN_LAT + 1.0 / 3600.0, abs=1e-12)

    def test_bilinear_exact_on_linear_field(self, tmp_path):
        # a bilinear interpolant reproduces any affine field exactly at
        # arbitrary interior points
        nr = nc = 11
        rows = np.arange(nr)[:, None] * np.ones((1, nc))
        cols = np.ones((nr, 1)) * np.arange(nc)[None, :]
        dlat = 0.5 + 0.1 * rows + 0.02 * cols
        dlon = 1.0 - 0.05 * rows + 0.03 * cols
        p = str(tmp_path / "l.gsb")
        ntv2.write_gsb(p, [_grid(dlat=dlat, dlon=dlon)])
        f = ntv2.read_gsb(p)
        rng = np.random.default_rng(3)
        lats = rng.uniform(0.01, 0.99, 50)
        lons = rng.uniform(-1.99, -1.01, 50)
        a, o = f.grids[0].interpolate(lons, lats)
        # row coord = lat_sec/inc, col coord = lon_west_sec/inc - 10
        fr = lats * 3600.0 / 360.0
        fc = (-lons * 3600.0 - 3600.0) / 360.0
        assert np.allclose(a, 0.5 + 0.1 * fr + 0.02 * fc, atol=1e-5)
        assert np.allclose(o, 1.0 - 0.05 * fr + 0.03 * fc, atol=1e-5)

    def test_inverse_roundtrip_property(self, tmp_path):
        rng = np.random.default_rng(7)
        dlat = rng.uniform(-1.5, 1.5, (11, 11))
        dlon = rng.uniform(-1.5, 1.5, (11, 11))
        p = str(tmp_path / "r.gsb")
        ntv2.write_gsb(p, [_grid(dlat=dlat, dlon=dlon)])
        lons = rng.uniform(-1.9, -1.1, 40)
        lats = rng.uniform(0.1, 0.9, 40)
        flon, flat = ntv2.grids_to_wgs84(lons, lats, p)
        blon, blat = ntv2.grids_from_wgs84(flon, flat, p)
        # 1e-10 deg ~ 0.01 mm — far inside the 1 cm criterion
        assert np.allclose(blon, lons, atol=1e-10)
        assert np.allclose(blat, lats, atol=1e-10)

    def test_subgrid_priority_finest_wins(self, tmp_path):
        parent = _grid()
        child = _grid(name="CHILD", parent="TESTGRID",
                      s_lat=1080.0, n_lat=2160.0, e_lon=4320.0, w_lon=5400.0,
                      inc=90.0,
                      dlat=np.full((13, 13), 5.0), dlon=np.full((13, 13), 6.0))
        p = str(tmp_path / "m.gsb")
        ntv2.write_gsb(p, [parent, child])
        f = ntv2.read_gsb(p)
        # inside the child window (lat .3..0.6, lon -1.5..-1.2)
        a, o, cov = f.shift([-1.3], [0.4])
        assert cov[0] and a[0] == 5.0 and o[0] == 6.0
        # outside child, inside parent
        a, o, cov = f.shift([-1.9], [0.9])
        assert cov[0] and a[0] == 1.0 and o[0] == 2.0

    def test_outside_grid_raises_unless_null(self, tmp_path):
        p = str(tmp_path / "g.gsb")
        ntv2.write_gsb(p, [_grid()])
        with pytest.raises(ValueError, match="outside"):
            ntv2.grids_to_wgs84([10.0], [50.0], p)
        lon, lat = ntv2.grids_to_wgs84([10.0], [50.0], f"{p},null")
        assert lon[0] == 10.0 and lat[0] == 50.0

    def test_optional_grid_skipped(self, tmp_path):
        p = str(tmp_path / "g.gsb")
        ntv2.write_gsb(p, [_grid()])
        lon, lat = ntv2.grids_to_wgs84(
            [IN_LON], [IN_LAT], f"@{tmp_path}/missing.gsb,{p}")
        assert lat[0] == pytest.approx(IN_LAT + 1.0 / 3600.0, abs=1e-12)
        with pytest.raises(ValueError, match="unreadable"):
            ntv2.grids_to_wgs84([0.0], [0.0], f"{tmp_path}/missing2.gsb")


class TestProj4Pipeline:
    def test_parse_nadgrids_tag(self, tmp_path):
        p = str(tmp_path / "n.gsb")
        ntv2.write_gsb(p, [_grid()])
        tag = proj.parse_proj4(
            f"+proj=tmerc +lat_0=0 +lon_0=-1.5 +k=0.9996 +x_0=500000 "
            f"+y_0=0 +ellps=clrk66 +nadgrids={p}")
        assert tag[0] == "TMERC"
        assert tag[1][6] == ("nadgrids", p)

    def test_nad27_without_grids_raises(self):
        with pytest.raises(NotImplementedError, match="NAD27"):
            proj.parse_proj4("+proj=tmerc +lon_0=-1.5 +datum=NAD27")

    def test_nadgrids_on_fixed_ellipsoid_family_raises(self, tmp_path):
        p = str(tmp_path / "n.gsb")
        ntv2.write_gsb(p, [_grid()])
        with pytest.raises(NotImplementedError):
            proj.parse_proj4(f"+proj=laea +lon_0=10 +lat_0=52 +nadgrids={p}")

    def test_st_transform_end_to_end(self, spark, tmp_path):
        # EPSG:4326 -> NAD27-style tmerc with a synthetic constant-shift
        # grid: projected coordinates must equal projecting the shifted
        # lon/lat directly; round trip back to 1e-9 deg
        from pyspark.sql import functions as F

        from sedona_db_spark.functions import st

        p = str(tmp_path / "e.gsb")
        ntv2.write_gsb(p, [_grid()])
        crs = (f"+proj=tmerc +lat_0=0 +lon_0=-1.5 +k=0.9996 +x_0=500000 "
               f"+y_0=0 +ellps=clrk66 +nadgrids={p}")
        df = spark.createDataFrame([(IN_LON, IN_LAT)], "x double, y double")
        g = df.select(
            st.ST_Transform(st.ST_Point("x", "y"),
                            F.lit("EPSG:4326"), F.lit(crs)).alias("g"))
        row = g.select(st.ST_X("g").alias("e"), st.ST_Y("g").alias("n"),
                       st.ST_AsText(st.ST_Transform(
                           F.col("g"), F.lit(crs),
                           F.lit("EPSG:4326"))).alias("back")).collect()[0]
        # the INPUT is WGS84; projecting into the NAD27-datum CRS applies
        # the INVERSE grid shift (WGS84 -> NAD27): lon + dlon_west/3600,
        # lat - dlat/3600 (exact for a constant field — the fixed-point
        # iteration converges in one round)
        slon = IN_LON + 2.0 / 3600.0
        slat = IN_LAT - 1.0 / 3600.0
        E, N = proj.tmerc_forward(np.array([slon]), np.array([slat]),
                                  lat0=0.0, lon0=-1.5, k0=0.9996,
                                  fe=500000.0, fn=0.0, ellps="CLRK66")
        assert row["e"] == pytest.approx(E[0], abs=1e-6)
        assert row["n"] == pytest.approx(N[0], abs=1e-6)
        bx, by = [float(v) for v in
                  row["back"].replace("POINT (", "").rstrip(")").split()]
        assert bx == pytest.approx(IN_LON, abs=1e-9)
        assert by == pytest.approx(IN_LAT, abs=1e-9)


class TestLonglatDatum:
    """Round 5: +proj=longlat with a datum (the 'LLD' tag) — a geographic
    CRS on another datum transforms through the shift ALONE (PROJ treats
    `+proj=longlat +ellps=clrk66 +nadgrids=...` as NAD27 geographic)."""

    def test_parse_forms(self, tmp_path):
        p = str(tmp_path / "n.gsb")
        ntv2.write_gsb(p, [_grid()])
        assert proj.parse_proj4("+proj=longlat") == "LL"
        assert proj.parse_proj4("+proj=longlat +ellps=GRS80") == "LL"
        tag = proj.parse_proj4(f"+proj=longlat +ellps=clrk66 +nadgrids={p}")
        assert tag == ("LLD", ("CLRK66", ("nadgrids", p)))
        tag = proj.parse_proj4("+proj=longlat +ellps=bessel +towgs84=589,76,480")
        assert tag == ("LLD", ("BESSEL",
                               (589.0, 76.0, 480.0, 0.0, 0.0, 0.0, 0.0)))
        # an +ellps alone carries no datum info: identity would be wrong
        with pytest.raises(NotImplementedError, match="ambiguous"):
            proj.parse_proj4("+proj=longlat +ellps=bessel")

    def test_st_transform_geographic_shift(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from sedona_db_spark.functions import st

        p = str(tmp_path / "g.gsb")
        ntv2.write_gsb(p, [_grid()])
        crs = f"+proj=longlat +ellps=clrk66 +nadgrids={p},null"
        df = spark.createDataFrame(
            [(IN_LON, IN_LAT), (100.0, 45.0)], "x double, y double")
        rows = (df.select(
            F.col("x"), F.col("y"),
            st.ST_Transform(st.ST_Point("x", "y"),
                            F.lit(crs), F.lit("EPSG:4326")).alias("g"))
            .select("x", "y", st.ST_X("g").alias("lon"),
                    st.ST_Y("g").alias("lat"))
            .orderBy("x").collect())
        # in-grid: NAD27->WGS84 shift applied (dlat=+1", dlon=2" west)
        assert rows[0]["lon"] == pytest.approx(IN_LON - 2.0 / 3600.0,
                                               abs=1e-12)
        assert rows[0]["lat"] == pytest.approx(IN_LAT + 1.0 / 3600.0,
                                               abs=1e-12)
        # out-of-grid falls through the `null` zero-shift entry
        assert rows[1]["lon"] == 100.0 and rows[1]["lat"] == 45.0

    def test_helmert_longlat_roundtrip(self, spark):
        from pyspark.sql import functions as F

        from sedona_db_spark.functions import st

        crs = "+proj=longlat +ellps=bessel +towgs84=589,76,480"
        df = spark.createDataFrame([(14.5, 50.0)], "x double, y double")
        row = (df.select(st.ST_Transform(
                   st.ST_Transform(st.ST_Point("x", "y"),
                                   F.lit("EPSG:4326"), F.lit(crs)),
                   F.lit(crs), F.lit("EPSG:4326")).alias("g"))
               .select(st.ST_X("g").alias("lon"), st.ST_Y("g").alias("lat"))
               .collect()[0])
        # geocentric<->geodetic iteration leaves ~1e-8 deg (~1 mm)
        assert row["lon"] == pytest.approx(14.5, abs=1e-7)
        assert row["lat"] == pytest.approx(50.0, abs=1e-7)
