"""Line / ring structure family (geometry/lineops.py + st.py SQL names):
boundary mod-2 rule, reverse, ring accessors, collection extract, force
2D/3D, vertex editing, segmentize length law, line substring fractions,
line-merge degree-2 stitching."""

from __future__ import annotations

import numpy as np
import pytest

from sedona_db_spark.geometry import algos, lineops, wkb


def _g(wkt):
    return wkb.from_wkt(wkt)


def _w(g):
    return wkb.to_wkt(g)


# --------------------------------------------------------------------------
# boundary
# --------------------------------------------------------------------------

def test_boundary_cases():
    assert _w(lineops.boundary(_g("POINT (1 2)"))) == "GEOMETRYCOLLECTION EMPTY"
    assert _w(lineops.boundary(_g("LINESTRING (0 0, 5 5)"))) == "MULTIPOINT ((0 0), (5 5))"
    assert _w(lineops.boundary(_g("LINESTRING (0 0, 1 0, 0 1, 0 0)"))) == "MULTIPOINT EMPTY"
    assert _w(lineops.boundary(_g("POLYGON ((0 0, 1 0, 1 1, 0 0))"))) == \
        "LINESTRING (0 0, 1 0, 1 1, 0 0)"
    holed = _g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    b = lineops.boundary(holed)
    assert b.type_id == wkb.MULTILINESTRING and len(b.coords) == 2


def test_boundary_multilinestring_mod2():
    # shared endpoint (1,1) has degree 2 -> interior, not boundary
    ml = _g("MULTILINESTRING ((0 0, 1 1), (1 1, 2 0))")
    assert _w(lineops.boundary(ml)) == "MULTIPOINT ((0 0), (2 0))"


def test_boundary_gc_raises():
    with pytest.raises(ValueError, match="GEOMETRYCOLLECTION"):
        lineops.boundary(_g("GEOMETRYCOLLECTION (POINT (1 1))"))


# --------------------------------------------------------------------------
# reverse / rings / parts
# --------------------------------------------------------------------------

def test_reverse():
    assert _w(lineops.reverse(_g("LINESTRING (0 0, 1 1, 2 0)"))) == \
        "LINESTRING (2 0, 1 1, 0 0)"
    p = lineops.reverse(_g("POLYGON ((0 0, 1 0, 1 1, 0 0))"))
    assert _w(p) == "POLYGON ((0 0, 1 1, 1 0, 0 0))"
    assert abs(algos.area(p) - 0.5) < 1e-12  # area is orientation-free


def test_ring_accessors():
    holed = _g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    assert _w(lineops.exterior_ring(holed)) == "LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)"
    assert lineops.num_interior_rings(holed) == 1
    assert _w(lineops.interior_ring_n(holed, 1)) == "LINESTRING (1 1, 2 1, 2 2, 1 2, 1 1)"
    assert lineops.interior_ring_n(holed, 2) is None
    assert lineops.exterior_ring(_g("POINT (1 1)")) is None
    assert lineops.num_interior_rings(_g("LINESTRING (0 0, 1 1)")) is None


def test_geometry_n():
    mp = _g("MULTIPOINT (1 2, 3 4, 5 6)")
    assert _w(lineops.geometry_n(mp, 2)) == "POINT (3 4)"
    assert lineops.geometry_n(mp, 4) is None
    assert lineops.geometry_n(mp, 0) is None
    # simple geometry is its own part 1
    assert _w(lineops.geometry_n(_g("POINT (9 9)"), 1)) == "POINT (9 9)"


def test_collection_extract():
    gc = _g("GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1), "
            "POLYGON ((0 0, 1 0, 1 1, 0 0)), MULTIPOINT (2 2, 3 3))")
    assert _w(lineops.collection_extract(gc, 1)) == "MULTIPOINT ((1 1), (2 2), (3 3))"
    assert _w(lineops.collection_extract(gc, 2)) == "MULTILINESTRING ((0 0, 1 1))"
    assert lineops.collection_extract(gc, 3).type_id == wkb.MULTIPOLYGON
    with pytest.raises(ValueError):
        lineops.collection_extract(gc, 4)


def test_force_dims():
    g3 = lineops.force_3d(_g("LINESTRING (1 2, 3 4)"), 7.0)
    assert _w(g3) == "LINESTRING Z (1 2 7, 3 4 7)"
    assert _w(lineops.force_2d(g3)) == "LINESTRING (1 2, 3 4)"
    zm = _g("POINT ZM (1 2 3 4)")
    assert _w(lineops.force_2d(zm)) == "POINT (1 2)"
    assert lineops.force_3d(zm) is zm  # already 3D


# --------------------------------------------------------------------------
# vertex editing
# --------------------------------------------------------------------------

def test_add_remove_set_point():
    ln = _g("LINESTRING (0 0, 2 2)")
    assert _w(lineops.add_point(ln, _g("POINT (1 1)"), 1)) == \
        "LINESTRING (0 0, 1 1, 2 2)"
    assert _w(lineops.add_point(ln, _g("POINT (3 3)"))) == \
        "LINESTRING (0 0, 2 2, 3 3)"
    three = _g("LINESTRING (0 0, 1 1, 2 2)")
    assert _w(lineops.remove_point(three, 1)) == "LINESTRING (0 0, 2 2)"
    assert _w(lineops.set_point(three, -1, _g("POINT (9 9)"))) == \
        "LINESTRING (0 0, 1 1, 9 9)"
    with pytest.raises(ValueError, match="fewer than 2"):
        lineops.remove_point(ln, 0)
    with pytest.raises(ValueError, match="out of range"):
        lineops.add_point(ln, _g("POINT (1 1)"), 5)
    with pytest.raises(ValueError, match="LINESTRING"):
        lineops.add_point(_g("POINT (0 0)"), _g("POINT (1 1)"))


# --------------------------------------------------------------------------
# segmentize / line substring / merge
# --------------------------------------------------------------------------

def test_segmentize_length_law():
    ln = _g("LINESTRING (0 0, 3 4)")  # length 5
    out = lineops.segmentize(ln, 1.0)
    assert len(out.coords) == 6  # 5 equal pieces
    assert abs(algos.length(out) - 5.0) < 1e-12
    d = np.diff(out.coords[:, :2], axis=0)
    assert np.allclose(np.hypot(d[:, 0], d[:, 1]), 1.0)
    # polygon rings densify too, area preserved
    box = _g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    dens = lineops.segmentize(box, 0.5)
    assert abs(algos.area(dens) - 4.0) < 1e-12
    assert len(dens.coords[0]) == 17
    with pytest.raises(ValueError):
        lineops.segmentize(ln, 0.0)


def test_line_substring():
    ln = _g("LINESTRING (0 0, 10 0)")
    assert _w(lineops.line_substring(ln, 0.2, 0.6)) == "LINESTRING (2 0, 6 0)"
    assert _w(lineops.line_substring(ln, 0.5, 0.5)) == "POINT (5 0)"
    assert _w(lineops.line_substring(ln, 0.0, 1.0)) == "LINESTRING (0 0, 10 0)"
    bent = _g("LINESTRING (0 0, 1 0, 1 1)")  # length 2
    assert _w(lineops.line_substring(bent, 0.25, 0.75)) == \
        "LINESTRING (0.5 0, 1 0, 1 0.5)"
    with pytest.raises(ValueError, match="within"):
        lineops.line_substring(ln, -0.1, 0.5)
    with pytest.raises(ValueError, match="exceeds"):
        lineops.line_substring(ln, 0.8, 0.2)


def test_line_merge():
    ml = _g("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2), (2 2, 3 3))")
    assert _w(lineops.line_merge(ml)) == "LINESTRING (0 0, 1 1, 2 2, 3 3)"
    # reversed middle piece still stitches
    ml2 = _g("MULTILINESTRING ((0 0, 1 1), (2 2, 1 1), (2 2, 3 3))")
    assert _w(lineops.line_merge(ml2)) == "LINESTRING (0 0, 1 1, 2 2, 3 3)"
    # degree-3 junction stays a break
    star = _g("MULTILINESTRING ((0 0, 1 1), (1 1, 2 0), (1 1, 2 2))")
    m = lineops.line_merge(star)
    assert m.type_id == wkb.MULTILINESTRING and len(m.coords) >= 2
    # total length is invariant
    assert abs(algos.length(m) - algos.length(star)) < 1e-12
    with pytest.raises(ValueError, match="LINESTRING"):
        lineops.line_merge(_g("POINT (0 0)"))


# --------------------------------------------------------------------------
# SQL surface
# --------------------------------------------------------------------------

def test_sql_surface(spark):
    from sedona_db_spark.functions.st import register_all

    register_all(spark)
    row = spark.sql(
        "SELECT ST_AsText(ST_Boundary(ST_MakeEnvelope(0.0D,0.0D,2.0D,2.0D))) AS b, "
        "ST_AsText(ST_Reverse(ST_GeomFromWKT('LINESTRING (0 0, 1 1)'))) AS r, "
        "ST_NumInteriorRings(ST_MakeEnvelope(0.0D,0.0D,1.0D,1.0D)) AS nir, "
        "ST_AsText(ST_LineSubstring(ST_GeomFromWKT('LINESTRING (0 0, 10 0)'), 0.1D, 0.3D)) AS ls, "
        "ST_NPoints(ST_Segmentize(ST_GeomFromWKT('LINESTRING (0 0, 3 4)'), 1.0D)) AS np, "
        "ST_AsText(ST_GeometryN(ST_GeomFromWKT('MULTIPOINT (1 2, 3 4)'), 2)) AS gn, "
        "ST_AsText(ST_Force3D(ST_Point(1.0D, 2.0D), 5.0D)) AS f3"
    ).collect()[0]
    assert row["b"] == "LINESTRING (0 0, 2 0, 2 2, 0 2, 0 0)"
    assert row["r"] == "LINESTRING (1 1, 0 0)"
    assert row["nir"] == 0
    assert row["ls"] == "LINESTRING (1 0, 3 0)"
    assert row["np"] == 6
    assert row["gn"] == "POINT (3 4)"
    assert row["f3"] == "POINT Z (1 2 5)"
