"""Grid generators (PostGIS names ST_TileEnvelope, ST_SquareGrid,
ST_HexagonGrid, ST_Hexagon, ST_Square).

The engine's join-side tiling is the quadkey grid (tiling.py); these are
the USER-facing grid constructors a PostGIS vector-tile pipeline calls.

Semantics notes (documented, pinned by tests):
* ``tile_envelope`` — XYZ / web-mercator tile bounds in EPSG:3857, the
  standard half-open pyramid over the full ±20037508.342789244 extent
  (PostGIS default SRID 3857 behavior; the optional custom-bounds
  argument is not supported).
* ``square_grid`` — origin-aligned (0, 0) cells of side ``size`` whose
  INTERIOR intersects the input's envelope (half-open: cells touching
  the envelope only along an edge are excluded).  PostGIS emits
  edge-touching cells too; the half-open rule makes counts closed-form
  and keeps adjacent envelopes' grids disjoint — documented deviation.
* ``hexagon_grid`` — PostGIS layout: flat-topped hexagons of side
  ``size``, column pitch 1.5*size, row pitch sqrt(3)*size, odd columns
  shifted up half a row, cell (0,0) centered at the origin.  Emitted
  cells are those whose center lies within one cell radius of the
  envelope (superset coverage guaranteed; exact-intersection trimming is
  the caller's ST_Intersects filter, matching how PostGIS pipelines use
  it).
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

from .wkb import GEOMETRYCOLLECTION, POLYGON, Geometry

WEBMERC_EXTENT = 20037508.342789244


def _box(x0: float, y0: float, x1: float, y1: float) -> Geometry:
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    dtype=np.float64)
    return Geometry(POLYGON, [ring])


def tile_envelope(z: int, x: int, y: int) -> Geometry:
    """Envelope of XYZ web-mercator tile (z, x, y) in EPSG:3857
    (PostGIS ST_TileEnvelope): y counts from the TOP (north) edge."""
    z, x, y = int(z), int(x), int(y)
    if z < 0 or z > 31:
        raise ValueError(f"tile zoom {z} out of range [0, 31]")
    n = 1 << z
    if not (0 <= x < n and 0 <= y < n):
        raise ValueError(f"tile ({x}, {y}) out of range for zoom {z}")
    # every edge is computed FROM ITS INDEX (never x0 + s): a parent's
    # edge and its children's shared edge are then the same rounding of
    # index * (2A / 2^z), so pyramid edges are bit-identical across zooms
    s = 2.0 * WEBMERC_EXTENT / n
    x0 = -WEBMERC_EXTENT + x * s
    x1 = -WEBMERC_EXTENT + (x + 1) * s
    y1 = WEBMERC_EXTENT - y * s
    y0 = WEBMERC_EXTENT - (y + 1) * s
    return _box(x0, y0, x1, y1)


def square(cx: int, cy: int, size: float) -> Geometry:
    """Cell (cx, cy) of the origin-aligned square grid (PostGIS
    ST_Square)."""
    return _box(cx * size, cy * size, (cx + 1) * size, (cy + 1) * size)


def square_grid(size: float, g: Optional[Geometry]) -> Optional[Geometry]:
    """GEOMETRYCOLLECTION of origin-aligned squares whose interior
    intersects the envelope of ``g`` (see module docstring)."""
    if g is None or g.is_empty:
        return None
    if size <= 0:
        raise ValueError(f"grid size must be positive, got {size}")
    c = g.all_coords()
    x0, x1 = float(np.min(c[:, 0])), float(np.max(c[:, 0]))
    y0, y1 = float(np.min(c[:, 1])), float(np.max(c[:, 1]))
    # half-open: a cell [i*s, (i+1)*s) intersects (x0, x1) interior-wise
    i0 = math.floor(x0 / size + 1e-12)
    i1 = math.ceil(x1 / size - 1e-12)
    j0 = math.floor(y0 / size + 1e-12)
    j1 = math.ceil(y1 / size - 1e-12)
    n = (i1 - i0) * (j1 - j0)
    if n > 4_000_000:
        raise ValueError(
            f"square_grid would emit {n} cells — raise the size or tile "
            "the input first (this is a per-row kernel, not the join grid)"
        )
    cells: List[Geometry] = []
    for i in range(i0, i1):
        for j in range(j0, j1):
            cells.append(square(i, j, size))
    return Geometry(GEOMETRYCOLLECTION, cells)


def hexagon(ci: int, cj: int, size: float) -> Geometry:
    """Flat-topped hexagon cell (ci, cj) of side ``size`` (PostGIS
    ST_Hexagon layout: column pitch 1.5*size, row pitch sqrt(3)*size,
    odd columns shifted up half a row, cell (0,0) centered at origin)."""
    h = math.sqrt(3.0) * size
    cx = 1.5 * size * ci
    cy = h * (cj + (0.5 if ci % 2 else 0.0))
    ring = np.array([
        [cx - size, cy],
        [cx - size / 2, cy - h / 2],
        [cx + size / 2, cy - h / 2],
        [cx + size, cy],
        [cx + size / 2, cy + h / 2],
        [cx - size / 2, cy + h / 2],
        [cx - size, cy],
    ], dtype=np.float64)
    return Geometry(POLYGON, [ring])


def hexagon_grid(size: float, g: Optional[Geometry]) -> Optional[Geometry]:
    """GEOMETRYCOLLECTION of hexagons covering the envelope of ``g``
    (cells whose center lies within one circumradius of the envelope —
    a guaranteed superset; see module docstring)."""
    if g is None or g.is_empty:
        return None
    if size <= 0:
        raise ValueError(f"grid size must be positive, got {size}")
    c = g.all_coords()
    x0, x1 = float(np.min(c[:, 0])), float(np.max(c[:, 0]))
    y0, y1 = float(np.min(c[:, 1])), float(np.max(c[:, 1]))
    h = math.sqrt(3.0) * size
    i0 = math.floor((x0 - size) / (1.5 * size))
    i1 = math.ceil((x1 + size) / (1.5 * size))
    j0 = math.floor((y0 - h) / h) - 1
    j1 = math.ceil((y1 + h) / h) + 1
    n = (i1 - i0 + 1) * (j1 - j0 + 1)
    if n > 4_000_000:
        raise ValueError(
            f"hexagon_grid would emit up to {n} cells — raise the size or "
            "tile the input first"
        )
    cells: List[Geometry] = []
    for i in range(i0, i1 + 1):
        cy_off = 0.5 * h if i % 2 else 0.0
        for j in range(j0, j1 + 1):
            cx = 1.5 * size * i
            cy = h * j + cy_off
            # keep cells whose center is within one circumradius of the box
            if (x0 - size <= cx <= x1 + size and
                    y0 - size * math.sqrt(3) <= cy <= y1 + size * math.sqrt(3)):
                cells.append(hexagon(i, j, size))
    return Geometry(GEOMETRYCOLLECTION, cells)
