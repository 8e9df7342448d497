"""From-scratch vectorized S2 cell ids (cube faces + Hilbert curve).

The S2 hierarchy (public: Google S2 geometry docs, s2geometry
`s2coords.h` / `s2cell_id.cc` algorithm descriptions) maps the sphere
onto 6 cube faces, applies the quadratic ST transform to equalize cell
areas, and orders the level-30 quadtree leaves along a face-local
Hilbert curve.  A 64-bit cell id is::

    id = (face << 61) | (hilbert_pos << 1) | 1        # level 30 leaf
    parent(l): keep the top 3 + 2l bits, set the new trailing 1

All kernels here are numpy-vectorized (the Hilbert walk is a 30-step
loop over whole arrays, not a per-row loop) so a pandas UDF processes
Arrow batches at millions of rows/sec.  Ids are returned as *signed*
int64 reinterpretations of the uint64 cell id (Spark has no unsigned
type); ordering comparisons must use the unsigned view, which
:func:`range_min`/:func:`range_max` preserve because faces 4-5 ids are
negative but still contiguous per cell in signed space (two's
complement keeps within-face order: the sign bit is constant inside a
face).

Why S2 and not only the planar Morton grid in ``tiling.py``: the north
rule's geotagging pipeline keys web pages by *spherical* cell — S2 cells
have bounded area distortion and a space-filling-curve id whose RANGES
are exactly the containment sets, which is what cell-id range
partitioning of a 10^12-row table needs (`range_min..range_max` of a
level-k cell covers precisely its leaf descendants).

Reference parity: SedonaDB carries s2geography for geography kernels
(`c/sedona-s2geography`); Apache Sedona exposes `ST_S2CellIDs`.  This
module re-derives the cell-id math from the published algorithm — no
code consulted or copied.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "MAX_LEVEL",
    "cell_id_from_latlng",
    "cell_level",
    "cell_parent",
    "cell_token",
    "cell_center_latlng",
    "range_min",
    "range_max",
]

MAX_LEVEL = 30

# Hilbert sub-cell orders (s2coords.cc constants, public):
#   kPosToIJ[orientation][pos]   -> ij   (i << 1 | j)
#   kIJtoPos[orientation][ij]    -> pos  (inverse of the above)
#   kPosToOrientation[pos]       -> orientation XOR delta
_SWAP, _INVERT = 1, 2
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.uint64
)
_IJ_TO_POS = np.array(
    [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]], dtype=np.uint64
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _SWAP | _INVERT], dtype=np.uint64)


def _latlng_to_xyz(lat, lng):
    la, lo = np.radians(np.asarray(lat, float)), np.radians(np.asarray(lng, float))
    cl = np.cos(la)
    return cl * np.cos(lo), cl * np.sin(lo), np.sin(la)


def _face_uv(x, y, z):
    """Largest-|component| face selection + per-face (u, v)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    face = np.where(comp >= 0, axis, axis + 3).astype(np.int64)
    # ValidFaceXYZtoUV (s2coords.h): per-face ratios
    u = np.empty_like(ax)
    v = np.empty_like(ax)
    for f, (un, ud, us, vn, vd, vs) in enumerate([
        # face: (u numerator, u denominator, u sign, v ...)
        ("y", "x", 1, "z", "x", 1),
        ("x", "y", -1, "z", "y", 1),
        ("x", "z", -1, "y", "z", -1),
        ("z", "x", 1, "y", "x", 1),
        ("z", "y", 1, "x", "y", -1),
        ("y", "z", -1, "x", "z", -1),
    ]):
        m = face == f
        if not m.any():
            continue
        c = {"x": x, "y": y, "z": z}
        u[m] = us * c[un][m] / c[ud][m]
        v[m] = vs * c[vn][m] / c[vd][m]
    return face, u, v


def _uv_to_st(u):
    """Quadratic ST transform (s2coords.h UVtoST)."""
    u = np.asarray(u, float)
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_uv(s):
    s = np.asarray(s, float)
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


def _st_to_ij(s):
    i = np.floor(s * float(1 << MAX_LEVEL)).astype(np.int64)
    return np.clip(i, 0, (1 << MAX_LEVEL) - 1).astype(np.uint64)


def _from_face_ij(face, i, j):
    """Level-30 cell id from (face, i, j) — vectorized Hilbert walk."""
    face = np.asarray(face, np.uint64)
    i = np.asarray(i, np.uint64)
    j = np.asarray(j, np.uint64)
    orient = face & np.uint64(_SWAP)
    pos = np.zeros_like(i, dtype=np.uint64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = (((i >> np.uint64(k)) & np.uint64(1)) << np.uint64(1)) | (
            (j >> np.uint64(k)) & np.uint64(1)
        )
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p
        orient = orient ^ _POS_TO_ORIENT[p]
    return ((face << np.uint64(61)) | (pos << np.uint64(1)) | np.uint64(1)).view(
        np.int64
    )


def _to_face_ij(cell):
    """Inverse of :func:`_from_face_ij` for level-30 ids."""
    cid = np.asarray(cell, np.int64).view(np.uint64)
    face = (cid >> np.uint64(61)).astype(np.uint64)
    pos = (cid >> np.uint64(1)) & np.uint64((1 << 60) - 1)
    orient = face & np.uint64(_SWAP)
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    for k in range(MAX_LEVEL - 1, -1, -1):
        p = (pos >> np.uint64(2 * k)) & np.uint64(3)
        ij = _POS_TO_IJ[orient, p]
        i = (i << np.uint64(1)) | (ij >> np.uint64(1))
        j = (j << np.uint64(1)) | (ij & np.uint64(1))
        orient = orient ^ _POS_TO_ORIENT[p]
    return face.astype(np.int64), i.astype(np.int64), j.astype(np.int64)


def cell_id_from_latlng(lat, lng, level: int = MAX_LEVEL):
    """Signed-int64 S2 cell id of each (lat, lng) degree pair at ``level``."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError("level must be in [0, 30]")
    x, y, z = _latlng_to_xyz(lat, lng)
    face, u, v = _face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    leaf = _from_face_ij(face, i, j)
    return cell_parent(leaf, level)


def _lsb_for_level(level: int) -> np.uint64:
    return np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))


def cell_parent(cell, level: int):
    """Ancestor id at ``level`` (clears finer bits, sets the new lsb)."""
    cid = np.asarray(cell, np.int64).view(np.uint64)
    lsb = _lsb_for_level(level)
    neg = (~lsb + np.uint64(1))  # two's-complement -lsb: mask of bits >= lsb
    return ((cid & neg) | lsb).view(np.int64)


def cell_level(cell):
    """Level encoded by the trailing set bit."""
    cid = np.asarray(cell, np.int64).view(np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    # log2 of lsb via float is exact for powers of two < 2^64
    return (MAX_LEVEL - (np.log2(lsb.astype(np.float64)) / 2.0)).astype(np.int64)


def range_min(cell):
    """Smallest leaf id contained in the cell (unsigned order)."""
    cid = np.asarray(cell, np.int64).view(np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    return (cid - (lsb - np.uint64(1))).view(np.int64)


def range_max(cell):
    """Largest leaf id contained in the cell (unsigned order)."""
    cid = np.asarray(cell, np.int64).view(np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    return (cid + (lsb - np.uint64(1))).view(np.int64)


def cell_token(cell):
    """Canonical hex token: 16 nibbles of the uint64, trailing zeros cut."""
    cid = np.asarray(cell, np.int64).view(np.uint64)
    out = []
    for v in cid.tolist():
        t = format(v, "016x").rstrip("0")
        out.append(t if t else "X")  # id 0 is invalid; sentinel matches S2
    return np.array(out, dtype=object)


def cell_center_latlng(cell):
    """(lat, lng) degrees of the cell center (center of its ij range)."""
    cid = np.asarray(cell, np.int64).view(np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    face, i, j = _to_face_ij(cid.view(np.int64))
    # center leaf offset: half the ij span of the cell
    # ij span = sqrt(lsb/2 leaves) -> shift = (trailing/2) bits
    tz = np.log2(lsb.astype(np.float64)).astype(np.int64)  # 2*(30-level)
    span = np.int64(1) << (tz // 2)  # cell width in leaf columns
    base_i = i & ~(span - 1)
    base_j = j & ~(span - 1)
    # exact ij-square midpoint: (base + span/2) columns; a leaf (span=1)
    # centers at +0.5
    off = np.where(span > 1, span.astype(np.float64) / 2.0, 0.5)
    s = (base_i.astype(np.float64) + off) / float(1 << MAX_LEVEL)
    t = (base_j.astype(np.float64) + off) / float(1 << MAX_LEVEL)
    u, v = _st_to_uv(s), _st_to_uv(t)
    # FaceUVtoXYZ (s2coords.h)
    one = np.ones_like(u)
    xyz_by_face = [
        (one, u, v),
        (-u, one, v),
        (-u, -v, one),
        (-one, -v, -u),
        (v, -one, -u),
        (v, u, -one),
    ]
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, (fx, fy, fz) in enumerate(xyz_by_face):
        m = face == f
        if m.any():
            x[m], y[m], z[m] = fx[m], fy[m], fz[m]
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng
