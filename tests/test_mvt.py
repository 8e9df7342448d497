"""Mapbox Vector Tile encoding: ST_AsMVTGeom quantization + the MVT 2.1
protobuf layer, decoded back by an independent test-side parser."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from sedona_db_spark.geometry import wkb
from sedona_db_spark.sources import mvt


def G(w):
    return wkb.from_wkt(w)


# ---- independent protobuf decoder (test-side, wire-format only) ----

def _read_varint(buf, pos):
    v = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _unzigzag(v):
    return (v >> 1) ^ -(v & 1)


def decode_tile(buf):
    """-> list of layers: {name, extent, version, features:[{id, type, cmds}]}"""
    pos, layers = 0, []
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        assert field == 3 and wire == 2
        ln, pos = _read_varint(buf, pos)
        layers.append(_decode_layer(buf[pos:pos + ln]))
        pos += ln
    return layers


def _decode_layer(buf):
    pos = 0
    out = {"features": []}
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            if field == 15:
                out["version"] = v
            elif field == 5:
                out["extent"] = v
        else:
            ln, pos = _read_varint(buf, pos)
            chunk = buf[pos:pos + ln]
            pos += ln
            if field == 1:
                out["name"] = chunk.decode()
            elif field == 2:
                out["features"].append(_decode_feature(chunk))
    return out


def _decode_feature(buf):
    pos = 0
    f = {"id": None}
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            if field == 1:
                f["id"] = v
            elif field == 3:
                f["type"] = v
        else:
            ln, pos = _read_varint(buf, pos)
            cmds, p2 = [], pos
            while p2 < pos + ln:
                v, p2 = _read_varint(buf, p2)
                cmds.append(v)
            f["cmds"] = cmds
            pos += ln
    return f


def walk_path(cmds):
    """Replay the command stream -> list of (op, points) runs."""
    pos = 0
    cx = cy = 0
    runs = []
    while pos < len(cmds):
        cmd = cmds[pos]
        op, count = cmd & 7, cmd >> 3
        pos += 1
        if op == 7:
            runs.append(("close", []))
            continue
        pts = []
        for _ in range(count):
            cx += _unzigzag(cmds[pos])
            cy += _unzigzag(cmds[pos + 1])
            pos += 2
            pts.append((cx, cy))
        runs.append(("move" if op == 1 else "line", pts))
    return runs


def rings_from_cmds(cmds):
    """Group decoded runs into closed rings (MVT polygon semantics)."""
    runs = walk_path(cmds)
    rings, cur = [], []
    for op, pts in runs:
        if op == "move":
            cur = list(pts)
        elif op == "line":
            cur.extend(pts)
        else:  # close
            rings.append(cur + cur[:1])
            cur = []
    return rings


def shoelace(pts):
    s = 0
    for (x0, y0), (x1, y1) in zip(pts[:-1], pts[1:]):
        s += x0 * y1 - x1 * y0
    return s / 2.0


BOUNDS = (0.0, 0.0, 10.0, 10.0)


class TestAsMVTGeom:
    def test_quantization_and_y_flip(self):
        g = mvt.as_mvt_geom(G("POINT (5 10)"), BOUNDS)
        assert g.coords[0].tolist() == [2048.0, 0.0]
        g = mvt.as_mvt_geom(G("POINT (0 0)"), BOUNDS)
        assert g.coords[0].tolist() == [0.0, 4096.0]

    def test_point_outside_clipped(self):
        assert mvt.as_mvt_geom(G("POINT (50 50)"), BOUNDS) is None

    def test_polygon_clip_area(self):
        g = mvt.as_mvt_geom(G("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"),
                            BOUNDS)
        from sedona_db_spark.geometry import algos
        # the surviving quarter is 5x5 world units = 2048x2048 tile units
        assert algos.area(g) == pytest.approx(2048.0 * 2048.0)

    def test_line_clip(self):
        g = mvt.as_mvt_geom(G("LINESTRING (-5 5, 15 5)"), BOUNDS)
        assert g.coords[:, 0].tolist() == [0.0, 4096.0]

    def test_degenerate_collapse(self):
        tiny = G("POLYGON ((1 1, 1.0001 1, 1.0001 1.0001, 1 1.0001, 1 1))")
        assert mvt.as_mvt_geom(tiny, BOUNDS) is None


class TestLayerBytes:
    def test_roundtrip_polygon(self):
        g = mvt.as_mvt_geom(G("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
                            BOUNDS)
        buf = mvt.mvt_layer_bytes("water", [(7, g)])
        layers = decode_tile(buf)
        assert len(layers) == 1
        L = layers[0]
        assert L["name"] == "water" and L["extent"] == 4096 and L["version"] == 2
        f = L["features"][0]
        assert f["id"] == 7 and f["type"] == 3
        runs = walk_path(f["cmds"])
        assert runs[0][0] == "move" and runs[-1][0] == "close"
        pts = runs[0][1] + runs[1][1]
        assert (0, 4096) in pts and (4096, 0) in pts

    def test_polygon_winding_spec(self):
        # MVT 2.1 §4.3.4.4: in tile coords the exterior ring must have
        # POSITIVE surveyor's-formula area, interior rings NEGATIVE —
        # compliant decoders (Mapbox GL, tippecanoe) classify rings by sign.
        g = mvt.as_mvt_geom(
            G("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
              " (4 4, 6 4, 6 6, 4 6, 4 4))"), BOUNDS)
        buf = mvt.mvt_layer_bytes("w", [(1, g)])
        rings = rings_from_cmds(decode_tile(buf)[0]["features"][0]["cmds"])
        assert len(rings) == 2
        assert shoelace(rings[0]) > 0
        assert shoelace(rings[1]) < 0

    def test_multipolygon_winding_spec(self):
        g = mvt.as_mvt_geom(
            G("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0),"
              "  (1 1, 2 1, 2 2, 1 2, 1 1)),"
              " ((6 6, 9 6, 9 9, 6 9, 6 6)))"), BOUNDS)
        buf = mvt.mvt_layer_bytes("w", [(1, g)])
        rings = rings_from_cmds(decode_tile(buf)[0]["features"][0]["cmds"])
        signs = [1 if shoelace(r) > 0 else -1 for r in rings]
        # positive ring starts a new polygon: shell, hole, shell
        assert signs == [1, -1, 1]

    def test_roundtrip_multipoint_and_line(self):
        p = mvt.as_mvt_geom(G("MULTIPOINT ((1 1), (2 2))"), BOUNDS)
        ln = mvt.as_mvt_geom(G("LINESTRING (0 0, 5 0, 5 5)"), BOUNDS)
        buf = mvt.mvt_layer_bytes("misc", [(None, p), (None, ln)])
        L = decode_tile(buf)[0]
        assert [f["type"] for f in L["features"]] == [1, 2]
        line_runs = walk_path(L["features"][1]["cmds"])
        assert line_runs[0][1] == [(0, 4096)]
        assert line_runs[1][1] == [(2048, 4096), (2048, 2048)]


@pytest.mark.usefixtures("spark")
class TestDistributed:
    def test_as_mvt_groupby(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        # two tiles at z=1; quantize against each tile's envelope via SQL
        df = spark.sql(
            "SELECT id, z, x, y, "
            "ST_AsMVTGeom(ST_Point(px, py), ST_TileEnvelope(z, x, y)) AS geom "
            "FROM VALUES "
            " (1, 1, 0, 0, -10018754.0D, 10018754.0D), "
            " (2, 1, 0, 0, -5009377.0D,   5009377.0D), "
            " (3, 1, 1, 0,  10018754.0D, 10018754.0D) "
            " t(id, z, x, y, px, py)")
        out = {(r.z, r.x, r.y): bytes(r.mvt)
               for r in mvt.as_mvt(df, geom_col="geom", id_col="id").collect()}
        assert set(out) == {(1, 0, 0), (1, 1, 0)}
        L = decode_tile(out[(1, 0, 0)])[0]
        assert sorted(f["id"] for f in L["features"]) == [1, 2]
        # tile-center point lands at the tile-space center
        runs = walk_path(L["features"][0]["cmds"])
        assert runs[0][1] == [(2048, 2048)]
