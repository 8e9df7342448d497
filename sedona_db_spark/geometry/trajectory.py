"""Spatio-temporal trajectory kernels (PostGIS names
ST_IsValidTrajectory, ST_ClosestPointOfApproach, ST_DistanceCPA,
ST_CPAWithin).

A trajectory is a LINESTRING M whose measure is the timestamp and must
be STRICTLY increasing (the PostGIS rule).  Between vertices motion is
linear, so the squared distance between two moving points is a quadratic
in t — the closest point of approach over each co-temporal segment pair
is the clamped vertex of that parabola, and the global CPA is the min
over pairs.  Pure numpy over the WKB Geometry model; no reference
analogue (the reference engine has no trajectory support).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from .wkb import LINESTRING, Geometry


def _traj_coords(g: Geometry) -> np.ndarray:
    if g.type_id != LINESTRING or not g.has_m:
        raise ValueError(
            "trajectory must be a LINESTRING M (x y [z] m) — build one "
            "with 'LINESTRING M (...)' WKT or ST_Force3DM"
        )
    c = g.coords
    if len(c) < 2:
        raise ValueError("trajectory needs at least 2 vertices")
    mc = 2 + int(g.has_z)
    out = np.column_stack([c[:, 0], c[:, 1],
                           c[:, 2] if g.has_z else np.zeros(len(c)),
                           c[:, mc]])
    return out


def is_valid_trajectory(g: Optional[Geometry]) -> Optional[bool]:
    """True when the geometry is a LINESTRING M with strictly increasing
    measures (PostGIS ST_IsValidTrajectory).  Non-M or non-line input
    returns False (PostGIS raises; a boolean is friendlier in a filter —
    documented deviation, the strict form is the raise in _traj_coords)."""
    if g is None:
        return None
    try:
        c = _traj_coords(g)
    except ValueError:
        return False
    return bool(np.all(np.diff(c[:, 3]) > 0))


def _cpa_scan(a: Geometry, b: Geometry) -> Optional[Tuple[float, float]]:
    """(time, distance) of the closest point of approach, or None when
    the trajectories share no time interval."""
    ca, cb = _traj_coords(a), _traj_coords(b)
    if not (np.all(np.diff(ca[:, 3]) > 0) and np.all(np.diff(cb[:, 3]) > 0)):
        raise ValueError("invalid trajectory: measures must strictly increase")
    best: Optional[Tuple[float, float]] = None
    for i in range(len(ca) - 1):
        ta0, ta1 = ca[i, 3], ca[i + 1, 3]
        for j in range(len(cb) - 1):
            tb0, tb1 = cb[j, 3], cb[j + 1, 3]
            t0, t1 = max(ta0, tb0), min(ta1, tb1)
            if t1 < t0:
                continue
            # positions linear in t over the overlap
            va = (ca[i + 1, :3] - ca[i, :3]) / (ta1 - ta0)
            vb = (cb[j + 1, :3] - cb[j, :3]) / (tb1 - tb0)
            dp0 = (ca[i, :3] + (t0 - ta0) * va) - (cb[j, :3] + (t0 - tb0) * vb)
            dv = va - vb
            dv2 = float(dv @ dv)
            if dv2 > 0:
                tstar = t0 - float(dp0 @ dv) / dv2
                tstar = min(max(tstar, t0), t1)
            else:
                tstar = t0
            d = dp0 + (tstar - t0) * dv
            dist = float(np.linalg.norm(d))
            if best is None or dist < best[1] or (
                    dist == best[1] and tstar < best[0]):
                best = (tstar, dist)
    return best


def closest_point_of_approach(a: Optional[Geometry],
                              b: Optional[Geometry]) -> Optional[float]:
    """The measure (time) at which two trajectories are closest
    (PostGIS ST_ClosestPointOfApproach); NULL when they never overlap
    in time."""
    if a is None or b is None:
        return None
    r = _cpa_scan(a, b)
    return None if r is None else r[0]


def distance_cpa(a: Optional[Geometry],
                 b: Optional[Geometry]) -> Optional[float]:
    """The distance at the closest point of approach (PostGIS
    ST_DistanceCPA); NULL when the trajectories never overlap in time."""
    if a is None or b is None:
        return None
    r = _cpa_scan(a, b)
    return None if r is None else r[1]


def cpa_within(a: Optional[Geometry], b: Optional[Geometry],
               d: float) -> Optional[bool]:
    """True when the trajectories ever come within ``d`` of each other
    while co-temporal (PostGIS ST_CPAWithin; false — not NULL — when
    they never overlap in time, matching PostGIS)."""
    if a is None or b is None:
        return None
    r = _cpa_scan(a, b)
    return False if r is None else bool(r[1] <= d)
