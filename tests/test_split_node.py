"""ST_Node + ST_Split (noding family, PostGIS/Sedona names)."""

import numpy as np
import pytest

from sedona_db_spark.geometry import algos, wkb
from sedona_db_spark.geometry.split import node_linework, split_geometry
from sedona_db_spark.functions.st import _is_valid

mk, show = wkb.from_wkt, wkb.to_wkt


def _nparts(g):
    return len(g.geometries()) if g.type_id in (
        wkb.MULTILINESTRING, wkb.GEOMETRYCOLLECTION, wkb.MULTIPOLYGON
    ) else 1


class TestNode:
    def test_crossing_lines(self):
        v = node_linework(mk("MULTILINESTRING((0 0,2 2),(0 2,2 0))"))
        assert _nparts(v) == 4
        assert sum(algos.length(p) for p in v.geometries()) == pytest.approx(
            4 * np.hypot(1, 1)
        )

    def test_lattice_maximal_paths(self):
        # 12 raw pieces, but the 4 degree-2 corners chain through:
        # maximal paths between topology nodes = 8 (GEOS dissolve rule)
        g = mk("MULTILINESTRING((0 0,2 0),(0 1,2 1),(0 2,2 2),"
               "(0 0,0 2),(1 0,1 2),(2 0,2 2))")
        v = node_linework(g)
        assert _nparts(v) == 8
        assert algos.length(v) == pytest.approx(12.0)

    def test_duplicates_dissolve(self):
        v = node_linework(mk("MULTILINESTRING((0 0,1 0),(0 0,1 0))"))
        assert show(v) == "LINESTRING (0 0, 1 0)"

    def test_touching_t(self):
        v = node_linework(mk("MULTILINESTRING((0 0,4 0),(2 0,2 3))"))
        assert _nparts(v) == 3

    def test_pure_cycle(self):
        v = node_linework(mk("LINESTRING(0 0,2 0,2 2,0 2,0 0)"))
        assert algos.length(v) == pytest.approx(8.0)


class TestSplit:
    def test_box_by_line(self):
        box = mk("POLYGON((0 0,4 0,4 4,0 4,0 0))")
        v = split_geometry(box, mk("LINESTRING(2 -1,2 5)"))
        areas = sorted(round(algos.area(p), 9) for p in v.polygons())
        assert areas == [8.0, 8.0]
        assert all(_is_valid(p) for p in v.polygons())

    def test_blade_missing_returns_original(self):
        box = mk("POLYGON((0 0,4 0,4 4,0 4,0 0))")
        v = split_geometry(box, mk("LINESTRING(10 10,12 12)"))
        assert len(v.polygons()) == 1
        assert algos.area(v.polygons()[0]) == pytest.approx(16.0)

    def test_donut_by_line(self):
        donut = mk("POLYGON((0 0,6 0,6 6,0 6,0 0),(2 2,4 2,4 4,2 4,2 2))")
        v = split_geometry(donut, mk("LINESTRING(3 -1,3 7)"))
        areas = sorted(round(algos.area(p), 9) for p in v.polygons())
        assert areas == [16.0, 16.0]  # hole area excluded on both halves
        assert sum(areas) == pytest.approx(algos.area(donut))

    def test_partial_cut_no_split(self):
        # blade ends inside the polygon: PostGIS leaves it unsplit
        box = mk("POLYGON((0 0,4 0,4 4,0 4,0 0))")
        v = split_geometry(box, mk("LINESTRING(2 -1,2 2)"))
        assert len(v.polygons()) == 1
        assert algos.area(v.polygons()[0]) == pytest.approx(16.0)

    def test_diagonal_cut(self):
        box = mk("POLYGON((0 0,4 0,4 4,0 4,0 0))")
        v = split_geometry(box, mk("LINESTRING(-1 -1,5 5)"))
        areas = sorted(round(algos.area(p), 9) for p in v.polygons())
        assert areas == [8.0, 8.0]

    def test_line_by_line(self):
        v = split_geometry(mk("LINESTRING(0 0,4 4)"), mk("LINESTRING(0 4,4 0)"))
        parts = sorted(show(l) for l in v.geometries())
        assert parts == ["LINESTRING (0 0, 2 2)", "LINESTRING (2 2, 4 4)"]

    def test_line_by_point(self):
        v = split_geometry(mk("LINESTRING(0 0,4 0)"), mk("POINT(1 0)"))
        parts = sorted(show(l) for l in v.geometries())
        assert parts == ["LINESTRING (0 0, 1 0)", "LINESTRING (1 0, 4 0)"]

    def test_area_partition_law(self):
        # random boxes cut by random full-crossing vertical lines: parts
        # always sum to the original area
        rng = np.random.RandomState(3)
        for _ in range(20):
            x0, y0 = rng.randint(0, 50), rng.randint(0, 50)
            w, h = rng.randint(2, 9), rng.randint(2, 9)
            cx = x0 + rng.randint(1, w)
            box = mk(f"POLYGON(({x0} {y0},{x0+w} {y0},{x0+w} {y0+h},{x0} {y0+h},{x0} {y0}))")
            v = split_geometry(box, mk(f"LINESTRING({cx} {y0-1},{cx} {y0+h+1})"))
            assert len(v.polygons()) == 2
            assert sum(algos.area(p) for p in v.polygons()) == pytest.approx(w * h)


def test_sql_surface(spark):
    from sedona_db_spark.functions.st import register_all

    register_all(spark)
    row = spark.sql(
        "SELECT ST_NumGeometries(ST_Node(ST_GeomFromWKT("
        "'MULTILINESTRING((0 0,2 2),(0 2,2 0))'))) AS n, "
        "ST_NumGeometries(ST_Split(ST_MakeEnvelope(0,0,4,4), "
        "ST_GeomFromWKT('LINESTRING(2 -1,2 5)'))) AS s"
    ).first()
    assert row.n == 4 and row.s == 2
