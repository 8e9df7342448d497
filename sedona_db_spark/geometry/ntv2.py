"""NTv2 grid-shift datum transforms (the ``+nadgrids=`` pipeline step).

From-scratch implementation of the PUBLIC NTv2 binary grid format
(National Transformation version 2, Natural Resources Canada; the same
``.gsb`` layout PROJ reads — reference behavior:
``/root/reference/c/sedona-proj/src/st_transform.rs:43-160`` reaches
grid-shift datums through PROJ).  No grid files ship in this sandbox, so
:func:`write_gsb` can synthesize spec-conformant grids for tests and for
users who bring their own shift models.

Layout (all records 16 bytes = 8-char name + 8-byte value):

* overview header, 11 records: NUM_OREC/NUM_SREC/NUM_FILE (int32 + 4 pad
  bytes), GS_TYPE ("SECONDS "), VERSION, SYSTEM_F, SYSTEM_T (8-char
  strings), MAJOR_F/MINOR_F/MAJOR_T/MINOR_T (doubles);
* per subgrid, 11 records: SUB_NAME/PARENT/CREATED/UPDATED (strings),
  S_LAT/N_LAT/E_LONG/W_LONG/LAT_INC/LONG_INC (doubles, ARC-SECONDS,
  longitudes POSITIVE WEST), GS_COUNT (int32 + pad);
* GS_COUNT nodes x 16 bytes: float32 lat shift (arcsec), lon shift
  (arcsec, positive west), lat accuracy, lon accuracy.  Node order is
  row-major from the SOUTH-EAST corner: longitude increases WESTWARD
  within a row, rows run south -> north.

Shift semantics (the NTv2 spec's NAD27->NAD83 convention): the grid
stores source->target corrections, applied as

    lat_t = lat_s + dlat/3600
    lon_t = lon_s - dlon/3600        (east-positive lon; dlon is
                                      positive-west, hence the minus)

The inverse (target->source) has no closed form; it converges by
fixed-point iteration (4 rounds, the standard PROJ approach — shifts are
arcseconds, so the iteration contracts at ~1e-5/round).

``+nadgrids`` value syntax follows PROJ: a comma-separated grid list;
``@`` prefixes mark a grid optional (silently skipped if unreadable);
the literal ``null`` is a zero-shift fallback for points outside every
grid.  Without a ``null`` entry, out-of-grid points raise — a silent
no-shift would be a wrong answer.
"""

from __future__ import annotations

import os
import struct
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["Ntv2Grid", "Ntv2File", "read_gsb", "write_gsb", "load",
           "grids_to_wgs84", "grids_from_wgs84"]


class Ntv2Grid:
    """One subgrid: bounds in positive-west arc-seconds, row-major shift
    arrays (rows south->north, cols east->west)."""

    def __init__(self, name: str, parent: str, s_lat: float, n_lat: float,
                 e_lon: float, w_lon: float, lat_inc: float, lon_inc: float,
                 dlat: np.ndarray, dlon: np.ndarray):
        self.name, self.parent = name, parent
        self.s_lat, self.n_lat = float(s_lat), float(n_lat)
        self.e_lon, self.w_lon = float(e_lon), float(w_lon)
        self.lat_inc, self.lon_inc = float(lat_inc), float(lon_inc)
        self.nrows = int(round((self.n_lat - self.s_lat) / self.lat_inc)) + 1
        self.ncols = int(round((self.w_lon - self.e_lon) / self.lon_inc)) + 1
        if dlat.shape != (self.nrows, self.ncols):
            raise ValueError(
                f"subgrid {name!r}: GS_COUNT {dlat.size} != "
                f"{self.nrows}x{self.ncols} from the header increments")
        self.dlat, self.dlon = dlat, dlon

    def contains(self, lon_deg, lat_deg):
        """Vectorized membership (east-positive degrees in)."""
        lat_s = np.asarray(lat_deg, dtype=np.float64) * 3600.0
        lon_w = -np.asarray(lon_deg, dtype=np.float64) * 3600.0
        return ((lat_s >= self.s_lat) & (lat_s <= self.n_lat)
                & (lon_w >= self.e_lon) & (lon_w <= self.w_lon))

    def interpolate(self, lon_deg, lat_deg):
        """Bilinear (dlat_sec, dlon_west_sec) at east-positive degrees.
        Caller guarantees containment."""
        lat_s = np.asarray(lat_deg, dtype=np.float64) * 3600.0
        lon_w = -np.asarray(lon_deg, dtype=np.float64) * 3600.0
        fr = (lat_s - self.s_lat) / self.lat_inc
        fc = (lon_w - self.e_lon) / self.lon_inc
        r0 = np.clip(np.floor(fr).astype(np.int64), 0, self.nrows - 2)
        c0 = np.clip(np.floor(fc).astype(np.int64), 0, self.ncols - 2)
        tr = fr - r0
        tc = fc - c0
        out = []
        for g in (self.dlat, self.dlon):
            v = (g[r0, c0] * (1 - tr) * (1 - tc)
                 + g[r0 + 1, c0] * tr * (1 - tc)
                 + g[r0, c0 + 1] * (1 - tr) * tc
                 + g[r0 + 1, c0 + 1] * tr * tc)
            out.append(v)
        return out[0], out[1]


class Ntv2File:
    """A parsed .gsb: subgrids finest-first for point dispatch (a child
    subgrid always has a strictly smaller increment than its parent, so
    sorting by increment implements child-over-parent selection)."""

    def __init__(self, grids: List[Ntv2Grid]):
        self.grids = sorted(grids, key=lambda g: (g.lat_inc, g.lon_inc))

    def shift(self, lon_deg, lat_deg):
        """(dlat_sec, dlon_west_sec, covered_mask) for east-positive
        degree arrays; uncovered points get 0 shift + False mask."""
        lon = np.asarray(lon_deg, dtype=np.float64)
        lat = np.asarray(lat_deg, dtype=np.float64)
        dlat = np.zeros_like(lon)
        dlon = np.zeros_like(lon)
        todo = np.ones(lon.shape, dtype=bool)
        for g in self.grids:
            m = todo & g.contains(lon, lat)
            if m.any():
                a, o = g.interpolate(lon[m], lat[m])
                dlat[m], dlon[m] = a, o
                todo &= ~m
            if not todo.any():
                break
        return dlat, dlon, ~todo


_NAME = {k: k.ljust(8).encode("ascii") for k in (
    "NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_TYPE", "VERSION", "SYSTEM_F",
    "SYSTEM_T", "MAJOR_F", "MINOR_F", "MAJOR_T", "MINOR_T", "SUB_NAME",
    "PARENT", "CREATED", "UPDATED", "S_LAT", "N_LAT", "E_LONG", "W_LONG",
    "LAT_INC", "LONG_INC", "GS_COUNT", "END")}


def _rec_str(name: str, v: str) -> bytes:
    return _NAME[name] + v.ljust(8).encode("ascii")[:8]


def _rec_int(name: str, v: int, end: str) -> bytes:
    return _NAME[name] + struct.pack(end + "i", v) + b"\x00" * 4


def _rec_dbl(name: str, v: float, end: str) -> bytes:
    return _NAME[name] + struct.pack(end + "d", v)


def write_gsb(path: str, grids: Sequence[dict], endian: str = "<",
              system_f: str = "NAD27", system_t: str = "NAD83",
              major_f: float = 6378206.4, minor_f: float = 6356583.8,
              major_t: float = 6378137.0, minor_t: float = 6356752.314):
    """Write a spec-conformant .gsb.  Each grid dict: name, parent
    ('NONE' for top-level), s_lat/n_lat/e_lon/w_lon/lat_inc/lon_inc
    (arc-seconds, positive-west longitudes), dlat/dlon (2-D float arrays,
    rows south->north, cols east->west, arc-seconds)."""
    out = bytearray()
    out += _rec_int("NUM_OREC", 11, endian)
    out += _rec_int("NUM_SREC", 11, endian)
    out += _rec_int("NUM_FILE", len(grids), endian)
    out += _rec_str("GS_TYPE", "SECONDS")
    out += _rec_str("VERSION", "NTv2.0")
    out += _rec_str("SYSTEM_F", system_f)
    out += _rec_str("SYSTEM_T", system_t)
    out += _rec_dbl("MAJOR_F", major_f, endian)
    out += _rec_dbl("MINOR_F", minor_f, endian)
    out += _rec_dbl("MAJOR_T", major_t, endian)
    out += _rec_dbl("MINOR_T", minor_t, endian)
    for g in grids:
        dlat = np.asarray(g["dlat"], dtype=np.float32)
        dlon = np.asarray(g["dlon"], dtype=np.float32)
        nrows, ncols = dlat.shape
        out += _rec_str("SUB_NAME", g["name"])
        out += _rec_str("PARENT", g.get("parent", "NONE"))
        out += _rec_str("CREATED", "2026")
        out += _rec_str("UPDATED", "2026")
        for k, fld in (("S_LAT", "s_lat"), ("N_LAT", "n_lat"),
                       ("E_LONG", "e_lon"), ("W_LONG", "w_lon"),
                       ("LAT_INC", "lat_inc"), ("LONG_INC", "lon_inc")):
            out += _rec_dbl(k, float(g[fld]), endian)
        out += _rec_int("GS_COUNT", nrows * ncols, endian)
        zero = np.zeros_like(dlat)
        # row-major from the SE corner: rows S->N already; cols E->W
        node = np.stack([dlat, dlon, zero, zero], axis=-1).astype(
            endian + "f4").reshape(-1, 4)
        out += node.tobytes()
    out += _NAME["END"] + b"\x00" * 8
    with open(path, "wb") as fh:
        fh.write(out)


def read_gsb(path: str) -> Ntv2File:
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:8] != _NAME["NUM_OREC"]:
        raise ValueError(f"{path!r} is not an NTv2 .gsb (bad magic record)")
    # endianness: NUM_OREC must be 11
    end = "<" if struct.unpack("<i", buf[8:12])[0] == 11 else ">"
    if struct.unpack(end + "i", buf[8:12])[0] != 11:
        raise ValueError(f"{path!r}: NUM_OREC != 11 in either endianness")

    def s(rec: bytes) -> str:
        return rec[8:16].decode("ascii", "replace").strip("\x00 ")

    def d(rec: bytes) -> float:
        return struct.unpack(end + "d", rec[8:16])[0]

    def i(rec: bytes) -> int:
        return struct.unpack(end + "i", rec[8:12])[0]

    pos = 0
    hdr = {buf[pos + 16 * k: pos + 16 * k + 8].decode("ascii").strip():
           buf[pos + 16 * k: pos + 16 * (k + 1)] for k in range(11)}
    n_sub = i(hdr["NUM_FILE"])
    if s(hdr["GS_TYPE"]).upper() != "SECONDS":
        raise NotImplementedError(
            f"GS_TYPE {s(hdr['GS_TYPE'])!r}: only SECONDS grids supported")
    pos += 16 * 11
    grids = []
    for _ in range(n_sub):
        sub = {buf[pos + 16 * k: pos + 16 * k + 8].decode("ascii").strip():
               buf[pos + 16 * k: pos + 16 * (k + 1)] for k in range(11)}
        pos += 16 * 11
        count = i(sub["GS_COUNT"])
        nodes = np.frombuffer(buf, dtype=end + "f4", count=count * 4,
                              offset=pos).reshape(count, 4)
        pos += 16 * count
        s_lat, n_lat = d(sub["S_LAT"]), d(sub["N_LAT"])
        e_lon, w_lon = d(sub["E_LONG"]), d(sub["W_LONG"])
        lat_inc, lon_inc = d(sub["LAT_INC"]), d(sub["LONG_INC"])
        nrows = int(round((n_lat - s_lat) / lat_inc)) + 1
        ncols = int(round((w_lon - e_lon) / lon_inc)) + 1
        if count != nrows * ncols:
            raise ValueError(
                f"subgrid {s(sub['SUB_NAME'])!r}: GS_COUNT {count} != "
                f"{nrows}x{ncols} from the header increments")
        dlat = nodes[:, 0].astype(np.float64).reshape(nrows, ncols)
        dlon = nodes[:, 1].astype(np.float64).reshape(nrows, ncols)
        grids.append(Ntv2Grid(s(sub["SUB_NAME"]), s(sub["PARENT"]),
                              s_lat, n_lat, e_lon, w_lon, lat_inc, lon_inc,
                              dlat, dlon))
    return Ntv2File(grids)


@lru_cache(maxsize=32)
def load(spec: str) -> Tuple[Tuple[str, Optional[Ntv2File]], ...]:
    """Parse a PROJ-style ``+nadgrids`` value into ((name, file|None), ...)
    — ``None`` marks the ``null`` zero-shift fallback.  Optional (``@``)
    entries that fail to read are skipped."""
    out = []
    for part in spec.split(","):
        part = part.strip()
        optional = part.startswith("@")
        name = part[1:] if optional else part
        if name == "null":
            out.append((name, None))
            continue
        try:
            out.append((name, read_gsb(name)))
        except (OSError, ValueError) as e:
            if not optional:
                raise ValueError(
                    f"+nadgrids grid {name!r} unreadable: {e}") from e
    if not out:
        raise ValueError(f"+nadgrids={spec!r}: no usable grids")
    return tuple(out)


def grids_to_wgs84(lon, lat, spec: str):
    """Apply the source->target (e.g. NAD27->NAD83~WGS84) shift."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    dlat = np.zeros_like(lon)
    dlon = np.zeros_like(lon)
    todo = np.ones(lon.shape, dtype=bool)
    has_null = False
    for name, f in load(spec):
        if f is None:
            has_null = True
            continue
        if not todo.any():
            break
        a, o, cov = f.shift(lon, lat)
        take = todo & cov
        dlat[take], dlon[take] = a[take], o[take]
        todo &= ~cov
    if todo.any() and not has_null:
        bad = np.argwhere(todo).ravel()[0]
        raise ValueError(
            f"point ({lon.flat[bad]:.6f}, {lat.flat[bad]:.6f}) outside "
            f"every +nadgrids grid (append ',null' for a zero-shift "
            f"fallback)")
    return lon - dlon / 3600.0, lat + dlat / 3600.0


def grids_from_wgs84(lon, lat, spec: str, iterations: int = 4):
    """Inverse shift by fixed-point iteration (PROJ's approach)."""
    lon_t = np.asarray(lon, dtype=np.float64)
    lat_t = np.asarray(lat, dtype=np.float64)
    lon_s, lat_s = lon_t.copy(), lat_t.copy()
    for _ in range(iterations):
        f_lon, f_lat = grids_to_wgs84(lon_s, lat_s, spec)
        lon_s = lon_s - (f_lon - lon_t)
        lat_s = lat_s - (f_lat - lat_t)
    return lon_s, lat_s
