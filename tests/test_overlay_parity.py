"""Overlay semantics pinned to the reference's own expectations
(`/root/reference/python/sedonadb/tests/functions/test_overlay.py` — the
GEOS/PostGIS-validated intersection/difference/symdifference/union rows).
Assertions are re-derived here (typed EMPTY results, noded lineal union,
point absorption, mixed-collection decomposition) — behavior parity, not
code translation."""

import numpy as np
import pytest

from sedona_db_spark.functions.st import (
    _difference,
    _intersection,
    _symdifference,
    _union,
)
from sedona_db_spark.geometry import algos, wkb

P = wkb.from_wkt
W = wkb.to_wkt


def wset(g):
    """Order-insensitive canonical form: set of component WKTs."""
    if g.type_id in (wkb.MULTIPOINT, wkb.MULTILINESTRING, wkb.MULTIPOLYGON, wkb.GEOMETRYCOLLECTION):
        return {W(p) for p in g.coords}
    return {W(g)}


class TestIntersectionParity:
    def test_same_point(self):
        assert W(_intersection(P("POINT (0 0)"), P("POINT (0 0)"))) == "POINT (0 0)"

    def test_distinct_points_empty_is_puntal(self):
        out = _intersection(P("POINT (0 0)"), P("POINT (1 1)"))
        assert out.is_empty and out.type_id == wkb.POINT

    def test_point_on_line(self):
        assert W(_intersection(P("POINT (0 0)"), P("LINESTRING (0 0, 1 1)"))) == "POINT (0 0)"

    def test_disjoint_lines_empty_is_lineal(self):
        out = _intersection(P("LINESTRING (0 0, 1 1)"), P("LINESTRING (2 2, 3 3)"))
        assert out.is_empty and out.type_id == wkb.LINESTRING

    def test_lines_touch_at_endpoint(self):
        assert W(_intersection(P("LINESTRING (0 0, 1 1)"), P("LINESTRING (1 1, 2 2)"))) == "POINT (1 1)"

    def test_disjoint_polygons_empty_is_areal(self):
        out = _intersection(
            P("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
            P("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
        )
        assert out.is_empty and out.type_id == wkb.POLYGON

    def test_collection_vs_collection(self):
        out = _intersection(
            P("GEOMETRYCOLLECTION (POINT (-1 0), LINESTRING (0 0, 2 2))"),
            P("GEOMETRYCOLLECTION (POINT (-1 0), LINESTRING (0 0, 1 1))"),
        )
        assert wset(out) == {"POINT (-1 0)", "LINESTRING (0 0, 1 1)"}


class TestDifferenceParity:
    def test_point_minus_same_point_empty_puntal(self):
        out = _difference(P("POINT (0 0)"), P("POINT (0 0)"))
        assert out.is_empty and out.type_id == wkb.POINT

    def test_point_minus_line_through_it(self):
        out = _difference(P("POINT (0 0)"), P("LINESTRING (0 0, 1 1)"))
        assert out.is_empty and out.type_id == wkb.POINT

    def test_line_minus_overlapping_line(self):
        out = _difference(P("LINESTRING (0 0, 1 1)"), P("LINESTRING (0.5 0.5, 1 1)"))
        assert algos.length(out) == pytest.approx(np.hypot(0.5, 0.5), abs=1e-9)
        assert algos.bounds(out) == (0.0, 0.0, 0.5, 0.5)

    def test_disjoint_polygons_unchanged(self):
        a = P("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
        out = _difference(a, P("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"))
        assert algos.area(out) == 1.0

    def test_collection_minus_collection(self):
        out = _difference(
            P("GEOMETRYCOLLECTION (POINT (-1 0), LINESTRING (0 0, 2 2))"),
            P("GEOMETRYCOLLECTION (POINT (-1 0), LINESTRING (0 0, 1 1))"),
        )
        assert wset(out) == {"LINESTRING (1 1, 2 2)"}


class TestSymDifferenceParity:
    def test_same_point_empty(self):
        out = _symdifference(P("POINT (0 0)"), P("POINT (0 0)"))
        assert out.is_empty and out.type_id == wkb.POINT

    def test_point_on_line_gives_line(self):
        out = _symdifference(P("POINT (0 0)"), P("LINESTRING (0 0, 1 1)"))
        assert wset(out) == {"LINESTRING (0 0, 1 1)"}

    def test_distinct_points_multipoint(self):
        out = _symdifference(P("POINT (0 0)"), P("POINT (1 1)"))
        assert wset(out) == {"POINT (0 0)", "POINT (1 1)"}

    def test_partial_lineal_overlap(self):
        out = _symdifference(P("LINESTRING (0 0, 1 1)"), P("LINESTRING (0.5 0.5, 1 1)"))
        assert algos.length(out) == pytest.approx(np.hypot(0.5, 0.5), abs=1e-9)

    def test_disjoint_polygons_multipolygon(self):
        out = _symdifference(
            P("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
            P("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
        )
        assert out.type_id == wkb.MULTIPOLYGON and algos.area(out) == 2.0

    def test_collection_vs_collection(self):
        out = _symdifference(
            P("GEOMETRYCOLLECTION (POINT (-1 0), LINESTRING (0 0, 2 2))"),
            P("GEOMETRYCOLLECTION (POINT (-1 0), LINESTRING (0 0, 1 1))"),
        )
        assert wset(out) == {"LINESTRING (1 1, 2 2)"}


class TestUnionParity:
    def test_same_point(self):
        assert W(_union(P("POINT (0 0)"), P("POINT (0 0)"))) == "POINT (0 0)"

    def test_point_absorbed_by_line(self):
        out = _union(P("POINT (0 0)"), P("LINESTRING (0 0, 1 1)"))
        assert wset(out) == {"LINESTRING (0 0, 1 1)"}

    def test_distinct_points_multipoint(self):
        out = _union(P("POINT (0 0)"), P("POINT (1 1)"))
        assert wset(out) == {"POINT (0 0)", "POINT (1 1)"}

    def test_noded_lineal_union(self):
        out = _union(P("LINESTRING (0 0, 1 1)"), P("LINESTRING (0.5 0.5, 1 1)"))
        # pieces split at the original endpoint 0.5, shared part deduped
        assert wset(out) == {"LINESTRING (0 0, 0.5 0.5)", "LINESTRING (0.5 0.5, 1 1)"}

    def test_disjoint_polygons_multipolygon(self):
        out = _union(
            P("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
            P("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
        )
        assert out.type_id == wkb.MULTIPOLYGON and algos.area(out) == 2.0

    def test_identical_collections(self):
        g = "GEOMETRYCOLLECTION (POINT (-1 0), LINESTRING (0 0, 1 1))"
        out = _union(P(g), P(g))
        assert wset(out) == {"POINT (-1 0)", "LINESTRING (0 0, 1 1)"}

    def test_empty_operand_passthrough(self):
        a = P("POINT (0 0)")
        assert W(_union(a, P("POINT EMPTY"))) == "POINT (0 0)"
