"""ST_Polygonize — faces of noded linework (GEOS Polygonizer semantics).

PostGIS/Sedona name, beyond the reference's register. Pinned behaviors:
dangle removal, bridge pinch-splitting, hole nesting with the EdgeRing
strictly-inside rule (twin/unbounded contours discarded).
"""

import numpy as np
import pytest

from sedona_db_spark.geometry import algos, wkb
from sedona_db_spark.geometry.polygonize import polygonize
from sedona_db_spark.functions.st import _is_valid

mk = wkb.from_wkt


def _info(w):
    v = polygonize(mk(w))
    polys = v.polygons()
    return len(polys), round(sum(algos.area(p) for p in polys), 9)


CASES = [
    ("closed_ring_line", "LINESTRING(0 0,4 0,4 4,0 4,0 0)", 1, 16.0),
    ("lattice_2x2",
     "MULTILINESTRING((0 0,2 0),(0 1,2 1),(0 2,2 2),(0 0,0 2),(1 0,1 2),(2 0,2 2))",
     4, 4.0),
    ("nested_squares_donut",
     "MULTILINESTRING((0 0,4 0,4 4,0 4,0 0),(1 1,3 1,3 3,1 3,1 1))",
     2, 16.0),
    ("dangle_ignored", "MULTILINESTRING((0 0,2 0,2 2,0 2,0 0),(2 2,5 5))", 1, 4.0),
    ("open_arc_nothing", "LINESTRING(0 0,1 1,2 0)", 0, 0.0),
    ("shared_edge_two_cells",
     "MULTILINESTRING((0 0,2 0,2 2,0 2,0 0),(2 0,4 0,4 2,2 2))", 2, 8.0),
    ("crossed_diagonals_capped",
     "MULTILINESTRING((0 0,4 4),(4 0,0 4),(0 0,4 0),(0 4,4 4))", 2, 8.0),
    ("all_through_one_point_nothing",
     "MULTILINESTRING((0 2,4 2),(2 0,2 4),(0 0,4 4),(0 4,4 0))", 0, 0.0),
]


@pytest.mark.parametrize("name,w,n,a", CASES, ids=[c[0] for c in CASES])
def test_cases(name, w, n, a):
    got_n, got_a = _info(w)
    assert (got_n, got_a) == (n, a)


def test_outputs_are_valid_polygons():
    for _, w, n, _ in CASES:
        v = polygonize(mk(w))
        assert v.type_id == wkb.GEOMETRYCOLLECTION
        for p in v.polygons():
            assert _is_valid(p)


def test_donut_structure():
    v = polygonize(mk(
        "MULTILINESTRING((0 0,4 0,4 4,0 4,0 0),(1 1,3 1,3 3,1 3,1 1))"
    ))
    areas = sorted(round(algos.area(p), 9) for p in v.polygons())
    assert areas == [4.0, 12.0]  # inner square + donut (16 - 4)
    donut = max(v.polygons(), key=algos.area)
    assert len(donut.coords) == 2  # shell + nested hole


def test_polygon_input_uses_rings():
    v = polygonize(mk("POLYGON((0 0,2 0,2 2,0 2,0 0))"))
    assert len(v.polygons()) == 1
    assert algos.area(v.polygons()[0]) == pytest.approx(4.0)


def test_noding_splits_crossings():
    # plus-shaped arrangement: left(1) + right(4) + bottom(1) + top(1)
    # + center(1) = 5 faces, total area 8 — crossings noded mid-line
    w = ("MULTILINESTRING((0 1,6 1),(0 2,6 2),(1 0,1 3),(2 0,2 3),"
         "(0 1,0 2),(6 1,6 2),(1 0,2 0),(1 3,2 3))")
    n, a = _info(w)
    assert n == 5 and a == pytest.approx(8.0)


def test_sql_surface(spark):
    from sedona_db_spark.functions.st import register_all

    register_all(spark)
    row = spark.sql(
        "SELECT ST_NumGeometries(ST_Polygonize(g)) AS n "
        "FROM (SELECT ST_GeomFromWKT('MULTILINESTRING((0 0,2 0),(0 1,2 1),"
        "(0 2,2 2),(0 0,0 2),(1 0,1 2),(2 0,2 2))') AS g)"
    ).first()
    assert row.n == 4
