"""GeoJSON (RFC 7946) codec over the WKB Geometry model.

PostGIS-shaped semantics (the reference engine has no GeoJSON functions;
this is part of the "complete engine" IO surface alongside WKT/WKB):

* ``to_geojson`` emits the bare geometry object — Z rides along, M is
  dropped (GeoJSON positions are [x, y(, z)]; RFC 7946 §3.1.1 forbids a
  fourth element, matching PostGIS ST_AsGeoJSON).
* ``from_geojson`` accepts a geometry object only; a Feature or
  FeatureCollection raises with guidance (PostGIS ST_GeomFromGeoJSON
  behaves the same) — extracting `.geometry` is the caller's one-liner.
* Numbers format through the same shortest-repr rule as the WKT writer,
  so round-trips are bit-exact.
"""

from __future__ import annotations

import json
from typing import List, Optional

import numpy as np

from . import wkb
from .wkb import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
)

_TYPE_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}
_NAME_TYPES = {v: k for k, v in _TYPE_NAMES.items()}


def _fmt(v: float) -> str:
    return wkb._fmt_num(float(v))


def _pos(row: np.ndarray, keep: int) -> str:
    return "[" + ",".join(_fmt(c) for c in row[:keep]) + "]"


def _ring(arr: np.ndarray, keep: int) -> str:
    return "[" + ",".join(_pos(r, keep) for r in arr) + "]"


def to_geojson(g: Optional[Geometry]) -> Optional[str]:
    """Geometry -> RFC 7946 JSON string (Z kept, M dropped)."""
    if g is None:
        return None
    keep = 3 if g.has_z else 2  # x, y[, z] — never m
    t = g.type_id
    name = _TYPE_NAMES[t]
    if t == POINT:
        body = _pos(g.coords[0], keep) if len(g.coords) else "[]"
    elif t == LINESTRING:
        body = _ring(g.coords, keep) if len(g.coords) else "[]"
    elif t == POLYGON:
        rings = [r for r in g.coords if len(r)]
        body = "[" + ",".join(_ring(r, keep) for r in rings) + "]"
    elif t == GEOMETRYCOLLECTION:
        inner = ",".join(to_geojson(s) for s in g.coords)
        return '{"type":"GeometryCollection","geometries":[' + inner + "]}"
    else:  # MULTIPOINT / MULTILINESTRING / MULTIPOLYGON
        parts: List[str] = []
        for sub in g.coords:
            k = 3 if sub.has_z else 2
            if sub.type_id == POINT:
                parts.append(_pos(sub.coords[0], k) if len(sub.coords) else "[]")
            elif sub.type_id == LINESTRING:
                parts.append(_ring(sub.coords, k) if len(sub.coords) else "[]")
            else:  # polygon part
                parts.append(
                    "[" + ",".join(_ring(r, k) for r in sub.coords if len(r)) + "]"
                )
        body = "[" + ",".join(parts) + "]"
    return '{"type":"' + name + '","coordinates":' + body + "}"


def _arr(positions, ctx: str) -> np.ndarray:
    if not positions:
        return np.empty((0, 2), dtype=np.float64)
    widths = {len(p) for p in positions}
    if not widths <= {2, 3}:
        raise ValueError(
            f"GeoJSON {ctx}: positions must have 2 or 3 elements, got {sorted(widths)}"
        )
    ndim = max(widths)
    out = np.zeros((len(positions), ndim), dtype=np.float64)
    for i, p in enumerate(positions):
        out[i, : len(p)] = [float(c) for c in p]
    return out


def _from_obj(obj) -> Geometry:
    if not isinstance(obj, dict) or "type" not in obj:
        raise ValueError("GeoJSON input must be an object with a 'type' member")
    t = obj["type"]
    if t in ("Feature", "FeatureCollection"):
        raise ValueError(
            f"GeoJSON {t} is not a geometry; pass its 'geometry' member "
            "(PostGIS ST_GeomFromGeoJSON raises the same way)"
        )
    if t == "GeometryCollection":
        subs = [_from_obj(s) for s in obj.get("geometries", [])]
        return Geometry(GEOMETRYCOLLECTION, subs,
                        any(s.has_z for s in subs), False)
    if t not in _NAME_TYPES:
        raise ValueError(f"unknown GeoJSON geometry type {t!r}")
    tid = _NAME_TYPES[t]
    c = obj.get("coordinates", [])
    if tid == POINT:
        arr = _arr([c] if c else [], "Point")
        return Geometry(POINT, arr, arr.shape[1] == 3 if len(arr) else False, False)
    if tid == LINESTRING:
        arr = _arr(c, "LineString")
        return Geometry(LINESTRING, arr, arr.shape[1] == 3 if len(arr) else False, False)
    if tid == POLYGON:
        rings = [_arr(r, "Polygon ring") for r in c]
        has_z = any(len(r) and r.shape[1] == 3 for r in rings)
        rings = [_widen(r, has_z) for r in rings]
        return Geometry(POLYGON, rings, has_z, False)
    if tid == MULTIPOINT:
        subs = [_from_obj({"type": "Point", "coordinates": p}) for p in c]
    elif tid == MULTILINESTRING:
        subs = [_from_obj({"type": "LineString", "coordinates": p}) for p in c]
    else:  # MULTIPOLYGON
        subs = [_from_obj({"type": "Polygon", "coordinates": p}) for p in c]
    has_z = any(s.has_z for s in subs)
    if has_z:
        subs = [_widen_geom(s) for s in subs]
    return Geometry(tid, subs, has_z, False)


def _widen(arr: np.ndarray, has_z: bool) -> np.ndarray:
    if not has_z or (len(arr) and arr.shape[1] == 3):
        return arr
    if not len(arr):
        return np.empty((0, 3), dtype=np.float64)
    out = np.zeros((len(arr), 3), dtype=np.float64)
    out[:, :2] = arr[:, :2]
    return out


def _widen_geom(g: Geometry) -> Geometry:
    if g.has_z:
        return g
    if g.type_id in (POINT, LINESTRING):
        return Geometry(g.type_id, _widen(g.coords, True), True, False)
    if g.type_id == POLYGON:
        return Geometry(POLYGON, [_widen(r, True) for r in g.coords], True, False)
    return Geometry(g.type_id, [_widen_geom(s) for s in g.coords], True, False)


def from_geojson(s: Optional[str]) -> Optional[Geometry]:
    """RFC 7946 JSON string -> Geometry (mixed 2D/3D parts widen to 3D,
    missing z = 0, matching WKB mixed-dimension promotion)."""
    if s is None:
        return None
    try:
        obj = json.loads(s)
    except json.JSONDecodeError as e:
        raise ValueError(f"invalid JSON for GeoJSON geometry: {e}") from e
    return _from_obj(obj)
