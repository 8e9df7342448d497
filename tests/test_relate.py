"""ST_Relate (full DE-9IM matrix) — pinned GEOS matrices, predicate
consistency differential, pattern matching, SQL surface.

The 9 boolean predicates the reference registers are each a pattern over
the DE-9IM matrix, so the strongest check is agreement: matrix-derived
predicates vs the independent geometry/algos.py kernels on random
mixed-type pairs.
"""

import numpy as np
import pytest

from sedona_db_spark.geometry import algos, wkb
from sedona_db_spark.geometry.relate import relate, relate_match

mk = wkb.from_wkt

# (a, b, matrix) — values verified against GEOS/PostGIS ST_Relate
PINNED = [
    ("POINT(1 1)", "POINT(1 1)", "0FFFFFFF2"),
    ("POINT(1 1)", "POINT(2 2)", "FF0FFF0F2"),
    ("POINT(1 1)", "LINESTRING(0 0,2 2)", "0FFFFF102"),
    ("POINT(0 0)", "LINESTRING(0 0,2 2)", "F0FFFF102"),
    ("POINT(5 5)", "LINESTRING(0 0,2 2)", "FF0FFF102"),
    ("LINESTRING(0 0,2 2)", "LINESTRING(1 1,3 3)", "1010F0102"),
    ("LINESTRING(0 0,2 2)", "LINESTRING(0 2,2 0)", "0F1FF0102"),
    ("LINESTRING(0 0,2 2)", "LINESTRING(2 2,4 4)", "FF1F00102"),
    ("LINESTRING(0 0,2 2)", "LINESTRING(0 0,2 2)", "1FFF0FFF2"),
    ("LINESTRING(0 0,4 0)", "LINESTRING(1 0,2 0)", "101FF0FF2"),
    ("POINT(1 1)", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "0FFFFF212"),
    ("POINT(2 1)", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "F0FFFF212"),
    ("POINT(5 5)", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "FF0FFF212"),
    ("MULTIPOINT(1 1,5 5)", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "0F0FFF212"),
    ("LINESTRING(1 1,3 1)", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "1010F0212"),
    ("LINESTRING(0 0,0 2)", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "F1FF0F212"),
    ("LINESTRING(1 0.5,1 1.5)", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "1FF0FF212"),
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((1 1,3 1,3 3,1 3,1 1))", "212101212"),
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((2 0,4 0,4 2,2 2,2 0))", "FF2F11212"),
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "2FFF1FFF2"),
    ("POLYGON((0 0,4 0,4 4,0 4,0 0))", "POLYGON((1 1,2 1,2 2,1 2,1 1))", "212FF1FF2"),
    ("POLYGON((1 1,2 1,2 2,1 2,1 1))", "POLYGON((0 0,4 0,4 4,0 4,0 0))", "2FF1FF212"),
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((2 2,4 2,4 4,2 4,2 2))", "FF2F01212"),
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POINT(5 5)", "FF2FF10F2"),
    # hole semantics: a point inside A's hole is in A's EXTERIOR
    ("POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,3 1,3 3,1 3,1 1))", "POINT(2 2)", "FF2FF10F2"),
    # the polygon exactly filling A's hole: boundaries equal, interiors
    # on opposite sides (the case that pinned the covers() overlay confirm)
    ("POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,3 1,3 3,1 3,1 1))",
     "POLYGON((1 1,3 1,3 3,1 3,1 1))", "FF2F112F2"),
]


@pytest.mark.parametrize("aw,bw,exp", PINNED, ids=[f"{i}" for i in range(len(PINNED))])
def test_pinned_matrices(aw, bw, exp):
    assert relate(mk(aw), mk(bw)) == exp


def test_transpose_symmetry():
    for aw, bw, exp in PINNED:
        m, mt = relate(mk(aw), mk(bw)), relate(mk(bw), mk(aw))
        # transpose of the 3x3 matrix
        assert mt == "".join(m[3 * c + r] for r in range(3) for c in range(3))


def test_covers_hole_fill_regression():
    A = mk("POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,3 1,3 3,1 3,1 1))")
    B = mk("POLYGON((1 1,3 1,3 3,1 3,1 1))")
    assert not algos.covers(A, B)
    assert not algos.covered_by(B, A)
    assert algos.covers(A, A)


def test_relate_match():
    m = relate(mk("POINT(1 1)"), mk("POLYGON((0 0,2 0,2 2,0 2,0 0))"))
    assert relate_match(m, "T*F**F***")  # within
    assert relate_match(m, "0********")
    assert not relate_match(m, "FF*FF****")  # disjoint
    assert relate_match("0FFFFFFF2", "0FFFFFFF2")
    with pytest.raises(ValueError):
        relate_match("0FFFFFFF2", "T*")


def test_heterogeneous_collection_raises():
    gc = mk("GEOMETRYCOLLECTION(POINT(0 0),LINESTRING(1 1,2 2))")
    with pytest.raises(NotImplementedError):
        relate(gc, mk("POINT(0 0)"))


def _dim(g):
    if g.polygons():
        return 2
    if any(len(ln.coords) for ln in g.lines()):
        return 1
    return 0


def _matrix_predicates(m, da, db):
    """The OGC predicate definitions as DE-9IM patterns."""
    def match(p):
        return relate_match(m, p)

    out = {
        "equals": match("T*F**FFF*"),
        "disjoint": match("FF*FF****"),
        "intersects": not match("FF*FF****"),
        "touches": match("FT*******") or match("F**T*****") or match("F***T****"),
        "within": match("T*F**F***"),
        "covered_by": (match("T*F**F***") or match("*TF**F***")
                       or match("**FT*F***") or match("**F*TF***")),
    }
    if da < db:
        out["crosses"] = match("T*T******")
    elif da > db:
        out["crosses"] = match("T*****T**")
    else:
        out["crosses"] = match("0********") if da == 1 else False
    if da == db:
        out["overlaps"] = match("1*T***T**") if da == 1 else match("T*T***T**")
    else:
        out["overlaps"] = False
    return out


def _rand_geom(rng):
    kind = rng.randint(0, 6)
    x, y = rng.randint(0, 8), rng.randint(0, 8)
    if kind == 0:
        return mk(f"POINT({x} {y})")
    if kind == 1:
        x2, y2 = rng.randint(0, 8), rng.randint(0, 8)
        return mk(f"MULTIPOINT({x} {y},{x2} {y2})")
    if kind == 2:
        dx, dy = rng.randint(1, 4), rng.randint(-3, 4)
        return mk(f"LINESTRING({x} {y},{x+dx} {y+dy})")
    if kind == 3:
        dx1, dy1 = rng.randint(1, 4), rng.randint(-3, 4)
        dx2, dy2 = rng.randint(1, 4), rng.randint(-3, 4)
        return mk(f"LINESTRING({x} {y},{x+dx1} {y+dy1},{x+dx1+dx2} {y+dy1+dy2})")
    if kind == 4:
        w, h = rng.randint(1, 5), rng.randint(1, 5)
        return mk(f"POLYGON(({x} {y},{x+w} {y},{x+w} {y+h},{x} {y+h},{x} {y}))")
    w = rng.randint(2, 5)
    return mk(f"POLYGON(({x} {y},{x+w} {y},{x} {y+w},{x} {y}))")  # triangle


def test_predicate_consistency_differential():
    """Matrix-derived predicates must agree with the independent
    geometry/algos kernels on random mixed-type pairs."""
    rng = np.random.RandomState(7)
    kernels = {
        "equals": algos.equals,
        "disjoint": algos.disjoint,
        "intersects": algos.intersects,
        "touches": algos.touches,
        "within": algos.within,
        "covered_by": algos.covered_by,
        "crosses": algos.crosses,
        "overlaps": algos.overlaps,
    }
    for trial in range(200):
        a, b = _rand_geom(rng), _rand_geom(rng)
        m = relate(a, b)
        derived = _matrix_predicates(m, _dim(a), _dim(b))
        for name, got in derived.items():
            want = bool(kernels[name](a, b))
            assert bool(got) == want, (
                f"trial {trial}: {name} matrix={m} derived={got} kernel={want} "
                f"a={wkb.to_wkt(a)} b={wkb.to_wkt(b)}"
            )


def test_sql_surface(spark):
    from sedona_db_spark.functions.st import register_all

    register_all(spark)
    row = spark.sql(
        "SELECT ST_Relate(ST_Point(1,1), g) AS m, "
        "ST_RelateMatch(ST_Relate(ST_Point(1,1), g), 'T*F**F***') AS w "
        "FROM (SELECT ST_GeomFromWKT('POLYGON((0 0,2 0,2 2,0 2,0 0))') AS g)"
    ).first()
    assert row.m == "0FFFFF212" and row.w
