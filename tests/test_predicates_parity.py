"""Predicate truth tables pinned to the reference's own expectations
(`/root/reference/python/sedonadb/tests/functions/test_predicates.py` —
every non-null row of its GEOS/PostGIS-validated contains/covers/
covered_by/disjoint/dwithin/equals/intersects/touches/within/crosses/
overlaps tables, re-derived as direct kernel assertions)."""

import pytest

from sedona_db_spark.geometry import algos, wkb

P = wkb.from_wkt

UNIT_SQ = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
FAR_SQ = "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"
GC3 = ("GEOMETRYCOLLECTION (POINT (0 0), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)), "
       "LINESTRING (0 0, 1 1))")

CONTAINS = [
    (UNIT_SQ, "POINT (0 0)", False),          # boundary contact only
    (UNIT_SQ, "POINT (0.5 0.5)", True),
    ("POINT (0 0)", "POINT EMPTY", False),
    ("POINT (0 0)", "LINESTRING (0 0, 1 1)", False),
    (UNIT_SQ, "LINESTRING (0 0, 1 1)", True),
    (UNIT_SQ, FAR_SQ, False),
    ("POINT (1 1)", GC3, False),
]

COVERED_BY = [
    ("POINT (0 0)", UNIT_SQ, True),
    ("POINT (0.5 0.5)", UNIT_SQ, True),
    ("POINT (0 0)", "POINT EMPTY", False),
    ("POINT (0 0)", "LINESTRING (0 0, 1 1)", True),
    ("LINESTRING (0 0, 1 1)", UNIT_SQ, True),
    (UNIT_SQ, FAR_SQ, False),
    ("POINT (1 1)", GC3, True),
]

COVERS = [
    (UNIT_SQ, "POINT (0 0)", True),
    (UNIT_SQ, "POINT (0.5 0.5)", True),
    ("POINT (0 0)", "POINT EMPTY", False),
    ("POINT (0 0)", "LINESTRING (0 0, 1 1)", False),
    (UNIT_SQ, "LINESTRING (0 0, 1 1)", True),
    (UNIT_SQ, FAR_SQ, False),
    ("POINT (1 1)", GC3, False),
]

DISJOINT = [
    ("POINT (0 0)", "POINT (0 0)", False),
    (UNIT_SQ, UNIT_SQ, False),
    ("POINT EMPTY", "POINT (0 0)", True),
    ("POINT (0 0)", "LINESTRING (0 0, 1 1)", False),
    (UNIT_SQ, "LINESTRING (0 0, 1 1)", False),
    (UNIT_SQ, FAR_SQ, True),
    ("POINT (1 1)", GC3, False),
]

DWITHIN = [
    ("POINT (0 0)", "POINT (0 0)", 1.0, True),
    ("POINT (0 0)", "POINT (5 0)", 2.0, False),
    ("LINESTRING (0 0, 1 1)", "LINESTRING (2 2, 3 3)", 1.0, False),
    ("LINESTRING (0 0, 1 1)", "LINESTRING (10 0, 11 1)", 2.0, False),
    (UNIT_SQ, FAR_SQ, 6.2, True),
    ("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1))",
     "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1))", 1.0, True),
]

EQUALS = [
    ("POINT (0 0)", "POINT (0 0)", True),
    (UNIT_SQ, UNIT_SQ, True),
    ("POINT EMPTY", "POINT (0 0)", False),
    ("POINT (0 0)", "LINESTRING (0 0, 1 1)", False),
    (UNIT_SQ, "LINESTRING (0 0, 1 1)", False),
    (UNIT_SQ, FAR_SQ, False),
    ("POINT (1 1)", GC3, False),
]

INTERSECTS = [
    ("POINT (0 0)", "POINT (0 0)", True),
    ("POINT EMPTY", "POINT (0 0)", False),
    ("POINT (0 0)", "LINESTRING (0 0, 1 1)", True),
    (UNIT_SQ, "LINESTRING (0 0, 1 1)", True),
    (UNIT_SQ, FAR_SQ, False),
    ("POINT (1 1)", GC3, True),
]

TOUCHES = [
    ("POINT (0 0)", "POINT (1 1)", False),
    ("POINT (0 0)", "LINESTRING (0 0, 1 1)", True),
    ("POINT (0 0)", UNIT_SQ, True),
    ("POINT (0 0)", "MULTIPOINT ((0 0), (1 1))", False),
    (UNIT_SQ, "MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))", False),
    ("LINESTRING (0 0, 1 1)",
     "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((0 0, 1 0, 1 1, 0 1, 0 0)))",
     False),
    ("POINT (0 0)", GC3, True),
    ("POINT (0 0)", "POINT (0 0)", False),
    (UNIT_SQ, UNIT_SQ, False),
    ("LINESTRING (0 0, 1 1)", "LINESTRING (0 0, 1 1)", False),
]

WITHIN = [
    ("POINT (0 0)", "POINT (1 1)", False),
    ("POINT (0 0)", "LINESTRING (0 0, 1 1)", False),  # endpoint = boundary
    ("POINT (0.5 0.5)", UNIT_SQ, True),
    ("POINT (0 0)", "MULTIPOINT ((0 0), (1 1))", True),
    (UNIT_SQ, "MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))", False),
    ("LINESTRING (0 0, 1 1)",
     "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((0 0, 1 0, 1 1, 0 1, 0 0)))",
     True),
    ("POINT (0 0)", "POINT (0 0)", True),
    (UNIT_SQ, UNIT_SQ, True),
    ("LINESTRING (0 0, 1 1)", "LINESTRING (0 0, 1 1)", True),
]

CROSSES = [
    ("POINT (0 0)", "POINT EMPTY", False),
    ("POINT (0 0)", "POINT (0 0)", False),
    ("POINT (0.5 0.5)", "LINESTRING (0 0, 1 1)", False),
    ("POINT (0 0)", "LINESTRING (0 0, 1 1)", False),
    ("POINT (0.5 0.5)", UNIT_SQ, False),
    ("POINT (0 0)", UNIT_SQ, False),
    ("LINESTRING (0 0, 1 1)", "LINESTRING (0 1, 1 0)", True),
    ("LINESTRING (0 0, 1 1)", "LINESTRING (1 1, 2 2)", False),
    ("LINESTRING (0 0, 2 2)", "LINESTRING (1 1, 3 3)", False),
    ("LINESTRING (-1 -1, 1 1)", UNIT_SQ, True),
    ("LINESTRING (-1 0, 0 0)", UNIT_SQ, False),
    ("LINESTRING (0.1 0.1, 0.5 0.5)", UNIT_SQ, False),
    ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", False),
]

OVERLAPS = [
    ("POINT (0 0)", "POINT EMPTY", False),
    ("POINT (0 0)", "LINESTRING (0 0, 1 1)", False),
    ("LINESTRING (0 0, 2 2)", "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", False),
    ("MULTIPOINT ((0 0), (1 1))", "MULTIPOINT ((1 1), (2 2))", True),
    ("MULTIPOINT ((0 0), (1 1))", "MULTIPOINT ((0 0), (1 1))", False),
    ("POINT (0 0)", "POINT (0 0)", False),
    ("LINESTRING (0 0, 2 2)", "LINESTRING (1 1, 3 3)", True),   # collinear partial
    ("LINESTRING (0 0, 1 1)", "LINESTRING (0 1, 1 0)", False),  # crossing
    ("LINESTRING (0 0, 1 1)", "LINESTRING (1 1, 2 2)", False),  # endpoint touch
    ("LINESTRING (0 0, 1 1)", "LINESTRING (0 0, 1 1)", False),  # identical
    ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", True),
    (UNIT_SQ, "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))", False),    # shared edge
    (UNIT_SQ, UNIT_SQ, False),
    ("POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))", "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", False),
]


def _run(fn, rows):
    for g1, g2, *rest in rows:
        expected = rest[-1]
        args = [P(g1), P(g2)] + [r for r in rest[:-1]]
        got = bool(fn(*args))
        assert got == expected, f"{fn.__name__}({g1!r}, {g2!r}) = {got}, want {expected}"


def test_contains():
    _run(algos.contains, CONTAINS)


def test_covered_by():
    _run(algos.covered_by, COVERED_BY)


def test_covers():
    _run(algos.covers, COVERS)


def test_disjoint():
    _run(algos.disjoint, DISJOINT)


def test_dwithin():
    _run(algos.dwithin, DWITHIN)


def test_equals():
    _run(algos.equals, EQUALS)


def test_intersects():
    _run(algos.intersects, INTERSECTS)


def test_touches():
    _run(algos.touches, TOUCHES)


def test_within():
    _run(algos.within, WITHIN)


def test_crosses():
    _run(algos.crosses, CROSSES)


def test_overlaps():
    _run(algos.overlaps, OVERLAPS)
