"""WKB/WKT codec unit tests (pure python, no Spark).

Mirrors the reference's codec coverage: ISO + EWKB flags, Z/M/ZM,
EMPTY handling (`rust/sedona-schema`, `rust/sedona-geometry`)."""

import struct

import numpy as np
import pytest

from sedona_db_spark.geometry import wkb

ROUNDTRIP_WKTS = [
    "POINT (1 2)",
    "POINT (-71.064544 42.28787)",
    "POINT Z (1 2 3)",
    "POINT M (1 2 4)",
    "POINT ZM (1 2 3 4)",
    "POINT EMPTY",
    "LINESTRING (0 0, 1 1, 2 0)",
    "LINESTRING EMPTY",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "POLYGON EMPTY",
    "MULTIPOINT ((1 1), (2 2))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))",
    "GEOMETRYCOLLECTION EMPTY",
]


@pytest.mark.parametrize("wkt", ROUNDTRIP_WKTS)
def test_wkt_wkb_roundtrip(wkt):
    g = wkb.from_wkt(wkt)
    assert wkb.to_wkt(g) == wkt
    g2 = wkb.parse(wkb.encode(g))
    assert wkb.to_wkt(g2) == wkt


def test_big_endian_wkb():
    # big-endian point: 00 byte order
    buf = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 3.0, 4.0)
    g = wkb.parse(buf)
    assert g.type_id == wkb.POINT
    assert g.coords[0, 0] == 3.0 and g.coords[0, 1] == 4.0


def test_ewkb_z_and_srid_flags():
    # EWKB point Z with SRID: flags 0x80000000 | 0x20000000
    raw_type = 1 | 0x80000000 | 0x20000000
    buf = b"\x01" + struct.pack("<I", raw_type) + struct.pack("<I", 4326)
    buf += struct.pack("<ddd", 1.0, 2.0, 3.0)
    g = wkb.parse(buf)
    assert g.has_z and not g.has_m
    assert list(g.coords[0]) == [1.0, 2.0, 3.0]
    # re-encode is ISO 1001
    enc = wkb.encode(g)
    assert struct.unpack_from("<I", enc, 1)[0] == 1001


def test_point_fast_path_vectorized():
    x = np.array([1.0, 2.0, -3.5])
    y = np.array([4.0, 5.0, 6.25])
    bufs = wkb.encode_points_xy(x, y)
    assert all(len(b) == 21 for b in bufs)
    dx, dy, valid = wkb.decode_points_xy(list(bufs))
    assert valid.all()
    np.testing.assert_array_equal(dx, x)
    np.testing.assert_array_equal(dy, y)


def test_decode_points_handles_nulls_and_nonpoints():
    poly = wkb.encode(wkb.box(0, 0, 1, 1))
    pt = wkb.encode(wkb.point(7, 8))
    x, y, valid = wkb.decode_points_xy([None, poly, pt])
    assert list(valid) == [False, False, True]
    assert x[2] == 7 and y[2] == 8


def test_multipoint_bare_wkt_form():
    g = wkb.from_wkt("MULTIPOINT (1 1, 2 2)")
    assert g.type_id == wkb.MULTIPOINT
    assert len(g.coords) == 2


def test_empty_point_roundtrip_nan_convention():
    g = wkb.from_wkt("POINT EMPTY")
    enc = wkb.encode(g)
    # encodes as all-NaN coords per the common convention
    vals = struct.unpack_from("<dd", enc, 5)
    assert all(v != v for v in vals)
    assert wkb.parse(enc).is_empty


def test_wkt_multi_with_empty_elements():
    """EMPTY sub-elements inside MULTI* parse (reference ST_Dump cases:
    MULTILINESTRING ((1 1, 2 2), EMPTY, (3 3, 4 4)))."""
    from sedona_db_spark.geometry import wkb

    g = wkb.from_wkt("MULTILINESTRING ((1 1, 2 2), EMPTY, (3 3, 4 4))")
    assert len(g.coords) == 3
    assert g.coords[1].is_empty
    assert wkb.to_wkt(g) == "MULTILINESTRING ((1 1, 2 2), EMPTY, (3 3, 4 4))"
    g2 = wkb.from_wkt("MULTIPOLYGON (((1 1, 2 2, 2 1, 1 1)), EMPTY)")
    assert len(g2.coords) == 2 and g2.coords[1].is_empty
