"""Mapbox Vector Tile (MVT 2.1) encoding — PostGIS names ST_AsMVTGeom
(per-geometry tile-space quantization) and ST_AsMVT (layer encoding).

From-scratch implementation of the PUBLIC spec
(github.com/mapbox/vector-tile-spec, 2.1): protobuf wire format is
hand-rolled varints (the spec is 4 message types — no protobuf library
needed or available here), geometry commands are the MoveTo/LineTo/
ClosePath zigzag stream.

Pipeline shape (the PostGIS idiom, over this engine's operators):

    tile = ST_TileEnvelope(z, x, y)                    # geometry/grids.py
    g    = ST_AsMVTGeom(geom, tile)                    # quantize + clip
    tilebytes = mvt_layer_bytes(rows)                  # per-tile groupBy

ST_AsMVTGeom quantization is the PostGIS formula: tile-local integer
coords on a 4096 extent with the Y axis FLIPPED (MVT y grows downward).
Clipping composes the existing overlay engine.  The per-tile aggregation
is a plain groupBy(z, x, y) + collect_list feeding one encode UDF — the
shuffle carries already-quantized small geometries, never raw WKB.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

from ..geometry import wkb
from ..geometry.wkb import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
)

EXTENT = 4096


# ---------------------------------------------------------------------------
# ST_AsMVTGeom — quantize into tile space
# ---------------------------------------------------------------------------

def as_mvt_geom(g: Optional[Geometry], bounds: Tuple[float, float, float, float],
                extent: int = EXTENT, clip: bool = True) -> Optional[Geometry]:
    """Geometry mapped into MVT tile space (PostGIS ST_AsMVTGeom):
    x' = round((x - x0) / (x1 - x0) * extent),
    y' = round((y1 - y) / (y1 - y0) * extent)   (MVT y grows DOWNWARD).
    With ``clip`` the geometry is first intersected with the tile bounds
    (areal/lineal via the overlay engine; points dropped when outside).
    Degenerate results (empty after clip) return None."""
    if g is None:
        return None
    x0, y0, x1, y1 = bounds
    if clip:
        from ..geometry.overlay import polygon_overlay

        tile_ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        tile = Geometry(POLYGON, [tile_ring])
        if g.type_id in (POLYGON, MULTIPOLYGON):
            g = polygon_overlay(g, tile, "intersection")
        elif g.type_id in (POINT, MULTIPOINT):
            pts = [g] if g.type_id == POINT else list(g.coords)
            kept = [p for p in pts if len(p.coords) and
                    x0 <= p.coords[0, 0] <= x1 and y0 <= p.coords[0, 1] <= y1]
            if not kept:
                return None
            g = kept[0] if len(kept) == 1 and g.type_id == POINT else \
                Geometry(MULTIPOINT, kept)
        # lineal: clip each segment parametrically to the box
        elif g.type_id in (LINESTRING, MULTILINESTRING):
            g = _clip_lines_to_box(g, x0, y0, x1, y1)
    if g is None or g.is_empty:
        return None

    sx = extent / (x1 - x0)
    sy = extent / (y1 - y0)

    def q(arr: np.ndarray) -> np.ndarray:
        out = np.empty((len(arr), 2))
        out[:, 0] = np.round((arr[:, 0] - x0) * sx)
        out[:, 1] = np.round((y1 - arr[:, 1]) * sy)
        return out

    def walk(geom: Geometry) -> Optional[Geometry]:
        t = geom.type_id
        if t == POINT:
            return Geometry(t, q(geom.coords)) if len(geom.coords) else None
        if t == LINESTRING:
            c = q(geom.coords)
            keep = np.concatenate([[True], np.any(np.diff(c, axis=0) != 0, axis=1)])
            c = c[keep]
            return Geometry(t, c) if len(c) >= 2 else None
        if t == POLYGON:
            rings = []
            for r in geom.coords:
                c = q(r)
                keep = np.concatenate([[True], np.any(np.diff(c, axis=0) != 0, axis=1)])
                c = c[keep]
                if len(c) >= 3:
                    if not np.all(c[0] == c[-1]):
                        c = np.vstack([c, c[:1]])
                    if len(c) >= 4:
                        # MVT 2.1 §4.3.4.4: winding is defined on the TILE
                        # coordinates (post y-flip) by the surveyor's formula —
                        # exterior rings positive area, interior negative.  The
                        # y-flip mirrored every ring, so reorient here (PostGIS
                        # mvt.c applies the same force after quantization).
                        a = _shoelace2(c)
                        want_positive = len(rings) == 0
                        if (a < 0) == want_positive:
                            c = c[::-1]
                        rings.append(c)
            if not rings:
                return None
            return Geometry(t, rings)
        parts = [walk(s) for s in geom.coords]
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return Geometry(t, parts)

    return walk(g)


def _shoelace2(c: np.ndarray) -> float:
    """Twice the signed shoelace area of a closed ring (tile coords)."""
    x, y = c[:, 0], c[:, 1]
    return float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _clip_lines_to_box(g: Geometry, x0, y0, x1, y1) -> Optional[Geometry]:
    """Liang-Barsky per segment, re-chained into runs."""
    lines = [g] if g.type_id == LINESTRING else list(g.coords)
    out: List[np.ndarray] = []
    for ln in lines:
        c = ln.coords[:, :2]
        run: List[np.ndarray] = []
        for i in range(len(c) - 1):
            p, r = c[i], c[i + 1] - c[i]
            t0, t1 = 0.0, 1.0
            ok = True
            for pi, qi in ((-r[0], p[0] - x0), (r[0], x1 - p[0]),
                           (-r[1], p[1] - y0), (r[1], y1 - p[1])):
                if pi == 0:
                    if qi < 0:
                        ok = False
                        break
                    continue
                t = qi / pi
                if pi < 0:
                    t0 = max(t0, t)
                else:
                    t1 = min(t1, t)
            if not ok or t0 > t1:
                if len(run) >= 2:
                    out.append(np.array(run))
                run = []
                continue
            a, b = c[i] + t0 * r, c[i] + t1 * r
            if not run or not np.allclose(run[-1], a):
                if len(run) >= 2:
                    out.append(np.array(run))
                run = [a]
            run.append(b)
        if len(run) >= 2:
            out.append(np.array(run))
    if not out:
        return None
    if len(out) == 1:
        return Geometry(LINESTRING, out[0])
    return Geometry(MULTILINESTRING,
                    [Geometry(LINESTRING, r) for r in out])


# ---------------------------------------------------------------------------
# MVT protobuf encoding
# ---------------------------------------------------------------------------

def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _geom_commands(g: Geometry) -> Tuple[int, List[int]]:
    """(mvt geom type, command stream) with delta-encoded zigzag coords."""
    cmds: List[int] = []
    cx = cy = 0

    def move_line(arr, close):
        nonlocal cx, cy
        pts = [(int(x), int(y)) for x, y in arr[:, :2]]
        if close and len(pts) > 1 and pts[0] == pts[-1]:
            pts = pts[:-1]
        cmds.append((1 << 3) | 1)                      # MoveTo, count 1
        dx, dy = pts[0][0] - cx, pts[0][1] - cy
        cmds.extend([_zigzag(dx), _zigzag(dy)])
        cx, cy = pts[0]
        rest = pts[1:]
        if rest:
            cmds.append((len(rest) << 3) | 2)          # LineTo
            for x, y in rest:
                cmds.extend([_zigzag(x - cx), _zigzag(y - cy)])
                cx, cy = x, y
        if close:
            cmds.append((1 << 3) | 7)                  # ClosePath

    t = g.type_id
    if t == POINT:
        move_line(g.coords, False)
        return 1, cmds
    if t == MULTIPOINT:
        pts = np.vstack([p.coords[:1, :2] for p in g.coords])
        cmds.append((len(pts) << 3) | 1)
        for x, y in pts:
            cmds.extend([_zigzag(int(x) - cx), _zigzag(int(y) - cy)])
            cx, cy = int(x), int(y)
        return 1, cmds
    if t == LINESTRING:
        move_line(g.coords, False)
        return 2, cmds
    if t == MULTILINESTRING:
        for s in g.coords:
            move_line(s.coords, False)
        return 2, cmds
    if t == POLYGON:
        for r in g.coords:
            move_line(r, True)
        return 3, cmds
    if t == MULTIPOLYGON:
        for p in g.coords:
            for r in p.coords:
                move_line(r, True)
        return 3, cmds
    raise ValueError(f"MVT cannot encode geometry type {t}")


def mvt_layer_bytes(name: str, feats: List[Tuple[Optional[int], Geometry]],
                    extent: int = EXTENT) -> bytes:
    """One MVT layer (Tile message bytes) from (id, tile-space geometry)
    pairs — attributes intentionally out of scope (ids carry the join key
    back to the catalog, the engine's convention for payload columns)."""
    layer = bytearray()
    layer += _tag(15, 0) + _varint(2)                    # version = 2
    layer += _tag(1, 2) + _varint(len(name.encode())) + name.encode()
    for fid, g in feats:
        gt, cmds = _geom_commands(g)
        feat = bytearray()
        if fid is not None:
            feat += _tag(1, 0) + _varint(int(fid))
        feat += _tag(3, 0) + _varint(gt)
        body = b"".join(_varint(c) for c in cmds)
        feat += _tag(4, 2) + _varint(len(body)) + body
        layer += _tag(2, 2) + _varint(len(feat)) + bytes(feat)
    layer += _tag(5, 0) + _varint(extent)
    return bytes(_tag(3, 2) + _varint(len(layer)) + bytes(layer))


def as_mvt(df: DataFrame, geom_col: str = "geom", id_col: Optional[str] = None,
           tile_cols: Tuple[str, str, str] = ("z", "x", "y"),
           layer: str = "layer", extent: int = EXTENT) -> DataFrame:
    """Per-tile MVT bytes: groupBy the tile key, collect the (already
    ST_AsMVTGeom-quantized) geometries, one encode UDF per tile.  Output:
    (z, x, y, mvt BINARY)."""
    zc, xc, yc = tile_cols
    idc = F.col(id_col).cast("long") if id_col else F.lit(None).cast("long")
    rows = df.select(
        F.col(zc).alias("z"), F.col(xc).alias("x"), F.col(yc).alias("y"),
        F.struct(idc.alias("fid"), F.col(geom_col).alias("g")).alias("feat"),
    )
    grouped = rows.groupBy("z", "x", "y").agg(
        F.collect_list("feat").alias("feats"))

    @pandas_udf(BinaryType())
    def encode(feats: pd.Series) -> pd.Series:
        out = []
        for fl in feats:
            pairs = []
            for item in fl:
                fid = item["fid"]
                g = wkb.parse(bytes(item["g"]))
                if g is not None:
                    pairs.append((None if fid is None else int(fid), g))
            out.append(mvt_layer_bytes(layer, pairs, extent))
        return pd.Series(out, dtype=object)

    return grouped.select("z", "x", "y", encode(F.col("feats")).alias("mvt"))
