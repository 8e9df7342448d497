"""ST_SubDivide — split complex polygons until every part has at most
``max_vertices`` vertices (PostGIS/Apache Sedona semantics; the
reference engine has no subdivide — beyond-reference op).

Why it matters at scale: one 500k-vertex coastline polygon serializes
every spatial-join task that touches its cell — the refine cost rides
on the BIGGEST geometry, not the average.  Subdividing first rebalances
that skew: each part covers a smaller envelope (fewer candidate pairs)
and refines in bounded time, and the parts table co-partitions like any
other geometry column.  This composes with `adaptive_pip_join` (which
bounds the COVER explosion; subdivide bounds the REFINE cost).

Split rule (PostGIS-compatible): while a piece has more than
``max_vertices`` vertices, cut it at the midpoint of the LONGER axis of
its envelope (x wins ties) and recurse into both halves.  Clips run
through the exact snap-rounded overlay engine (`geometry/overlay.py`);
axis-box pieces short-circuit to pure min/max arithmetic.  Multi-part
clip results recurse per part, so every emitted row is a single
POLYGON.  The part rows together partition the input: Σ part areas =
original area (test-pinned law, same as tile_cut).

Plan shape: one `mapInPandas`-free pandas UDF pass + `posexplode` — the
recursion happens per geometry inside the Arrow batch (the per-geometry
overlay op dominates, the same trade the buffer/overlay wrappers make),
and the explode multiplies rows AFTER the parse so the text/WKB of the
parent is never duplicated through a shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, BinaryType

from sedona_db_spark.geometry import algos, overlay, wkb

__all__ = ["subdivide", "subdivide_parts"]

_MAX_DEPTH = 48  # 2^48 splits of any finite envelope is far past exhaustion


def _strip_collinear_ring(ring):
    """Drop exactly-collinear straight-through vertices from a closed ring.

    The overlay clip keeps the parent's vertices where they fall ON the
    cut line, so a clipped rectangle comes back with 6-7 vertices and
    the vertex count never reaches the target — the recursion would
    fragment forever around the old corners.  Removing points with zero
    cross product and non-reversing direction is area-exact.  2D only
    (clips are planar); spikes (reversals) are kept.
    """
    import numpy as np

    pts = ring[:-1]  # drop the closing duplicate
    changed = True
    while changed and len(pts) > 3:
        n = len(pts)
        prv = pts[np.arange(n) - 1]
        nxt = pts[(np.arange(n) + 1) % n]
        d1 = pts[:, :2] - prv[:, :2]
        d2 = nxt[:, :2] - pts[:, :2]
        cross = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
        dot = d1[:, 0] * d2[:, 0] + d1[:, 1] * d2[:, 1]
        drop = (cross == 0.0) & (dot >= 0.0)
        if drop.any():
            keep = ~drop
            if keep.sum() < 3:
                break
            pts = pts[keep]
        else:
            changed = False
    return np.vstack([pts, pts[:1]])


def _strip_collinear(g):
    """Polygon/MultiPolygon with straight-through vertices removed."""
    if g is None:
        return g
    if g.type_id == wkb.POLYGON:
        out = wkb.parse(wkb.encode(g))  # cheap deep copy
        out.coords = [_strip_collinear_ring(r) for r in g.coords]
        return out
    if g.type_id in (wkb.MULTIPOLYGON, wkb.GEOMETRYCOLLECTION):
        out = wkb.parse(wkb.encode(g))
        out.coords = [_strip_collinear(p) for p in g.coords]
        return out
    return g


def _subdivide_one(g, max_vertices: int, depth: int = 0) -> list:
    """List of encoded polygon parts for one parsed geometry."""
    if g is None:
        return []
    if g.type_id == wkb.MULTIPOLYGON:
        out = []
        for part in g.coords:
            out.extend(_subdivide_one(part, max_vertices, depth))
        return out
    if g.type_id == wkb.GEOMETRYCOLLECTION:
        # a clip can emit degenerate lower-dimensional pieces alongside
        # the areal ones (tangent boundaries) — keep only the areal parts
        out = []
        for part in g.coords:
            if part.type_id in (wkb.POLYGON, wkb.MULTIPOLYGON):
                out.extend(_subdivide_one(part, max_vertices, depth))
        return out
    if g.type_id != wkb.POLYGON:
        raise NotImplementedError(
            "subdivide handles areal geometries (Polygon/MultiPolygon) "
            f"only; got type_id={g.type_id}")
    if algos.area(g) <= 0.0:
        return []
    if algos.num_points(g) <= max_vertices or depth >= _MAX_DEPTH:
        return [wkb.encode(g)]
    xmin, ymin, xmax, ymax = algos.bounds(g)
    if (xmax - xmin) >= (ymax - ymin):
        mid = (xmin + xmax) / 2.0
        halves = (wkb.box(xmin, ymin, mid, ymax),
                  wkb.box(mid, ymin, xmax, ymax))
    else:
        mid = (ymin + ymax) / 2.0
        halves = (wkb.box(xmin, ymin, xmax, mid),
                  wkb.box(xmin, mid, xmax, ymax))
    out = []
    for h in halves:
        piece = overlay.polygon_overlay(g, h, "intersection")
        if piece is None or algos.area(piece) <= 0.0:
            continue
        piece = _strip_collinear(piece)
        out.extend(_subdivide_one(piece, max_vertices, depth + 1))
    return out


def subdivide_parts(max_vertices: int = 128):
    """WKB -> array<WKB> pandas UDF of subdivision parts."""
    if max_vertices < 5:
        # a closed rectangle is 5 vertices — nothing areal fits below
        raise ValueError(f"max_vertices must be >= 5, got {max_vertices}")

    @F.pandas_udf(ArrayType(BinaryType()))
    def parts(bufs: pd.Series) -> pd.Series:
        out = []
        for v in bufs:
            if v is None:
                out.append(None)
                continue
            out.append(_subdivide_one(wkb.parse(bytes(v)), max_vertices))
        return pd.Series(out, dtype=object)

    return parts


def subdivide(df: DataFrame, geom_col: str = "geometry",
              max_vertices: int = 128,
              part_col: str = "part") -> DataFrame:
    """One row per subdivision part: input columns + ``part_idx`` +
    ``part`` (polygon WKB with ≤ max_vertices vertices).

    NULL geometries and empty/zero-area inputs emit no rows (there is
    nothing areal to balance)."""
    parts = subdivide_parts(max_vertices)
    return (
        df.withColumn("_parts", parts(F.col(geom_col)))
        .where(F.col("_parts").isNotNull())
        .select("*", F.posexplode("_parts").alias("part_idx", part_col))
        .drop("_parts")
    )
