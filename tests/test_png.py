"""PNG codec (sources/png.py) — roundtrips plus a hand-crafted IDAT that
exercises every scanline filter type against hand-computed reconstruction
(an independent check on the filter math, not a self-roundtrip)."""

import struct
import zlib

import numpy as np
import pytest

from sedona_db_spark.sources.png import _chunk, _SIG, decode_png, encode_png


def _manual_png(rows_with_filters, width, ch, color_type, palette=None):
    """Build a PNG whose IDAT carries explicit (filter_type, raw_bytes)
    scanlines."""
    raw = bytearray()
    for ftype, line in rows_with_filters:
        raw.append(ftype)
        raw.extend(bytes(line))
    ihdr = struct.pack(">IIBBBBB", width, len(rows_with_filters), 8,
                       color_type, 0, 0, 0)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", bytes(palette))
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


class TestFilters:
    def test_all_five_filters_hand_computed(self):
        # 4-px-wide grayscale, one row per filter type
        rows = [
            (0, [10, 20, 30, 40]),          # None   -> 10 20 30 40
            (1, [5, 5, 5, 5]),              # Sub    -> 5 10 15 20
            (2, [1, 2, 3, 4]),              # Up     -> 6 12 18 24
            (3, [10, 10, 10, 10]),          # Average
            (4, [1, 1, 1, 1]),              # Paeth
        ]
        img = decode_png(_manual_png(rows, 4, 1, 0))
        assert img.shape == (5, 4)
        assert list(img[0]) == [10, 20, 30, 40]
        assert list(img[1]) == [5, 10, 15, 20]
        assert list(img[2]) == [6, 12, 18, 24]
        # Average: recon[x] = raw + floor((left + up)/2)
        r3 = []
        for x in range(4):
            left = r3[x - 1] if x >= 1 else 0
            up = [6, 12, 18, 24][x]
            r3.append((10 + ((left + up) >> 1)) & 0xFF)
        assert list(img[3]) == r3
        # Paeth: recon[x] = raw + paeth(left, up, upleft)
        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        r4 = []
        for x in range(4):
            a = r4[x - 1] if x >= 1 else 0
            b = r3[x]
            c = r3[x - 1] if x >= 1 else 0
            r4.append((1 + paeth(a, b, c)) & 0xFF)
        assert list(img[4]) == r4

    def test_sub_filter_multichannel_lanes(self):
        # RGB Sub: the left neighbour is bpp=3 bytes back, per lane
        rows = [(1, [100, 50, 25, 10, 10, 10])]
        img = decode_png(_manual_png(rows, 2, 3, 2))
        assert img.shape == (1, 2, 3)
        assert list(img[0, 0]) == [100, 50, 25]
        assert list(img[0, 1]) == [110, 60, 35]

    def test_palette_expansion(self):
        pal = [255, 0, 0, 0, 255, 0, 0, 0, 255]  # R, G, B entries
        rows = [(0, [0, 1, 2])]
        img = decode_png(_manual_png(rows, 3, 1, 3, palette=pal))
        assert img.shape == (1, 3, 3)
        assert list(img[0, 0]) == [255, 0, 0]
        assert list(img[0, 2]) == [0, 0, 255]


class TestRoundtrip:
    @pytest.mark.parametrize("shape", [(13, 17), (8, 9, 3), (5, 6, 4)])
    def test_encode_decode_exact(self, shape):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        back = decode_png(encode_png(img))
        assert back.shape == img.shape
        assert np.array_equal(back, img)

    def test_interlace_and_bitdepth_refused(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)  # Adam7
        data = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError, match="Adam7"):
            decode_png(data)
        ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        data16 = _SIG + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError, match="depth"):
            decode_png(data16)

    def test_not_png_raises(self):
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"GIF89a....")


def test_multimodal_real_decode_png(spark):
    """The multimodal pipeline decodes PNG payloads for real — the
    extracted feature equals the mean-pooled normalized pixels."""
    from pyspark.sql import functions as F

    from sedona_db_spark.sources import multimodal as M

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", "image/png", bytearray(encode_png(img)))],
        "media_id LONG, kind STRING, mime STRING, payload BINARY",
    ).withColumn("meta", F.struct(
        F.lit(8).alias("width"), F.lit(8).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("long").alias("sample_rate")))
    rows = M.extract_features(media, decode="strict").collect()
    assert len(rows) == 1
    sig = (img.astype(np.float32).ravel() - 127.5) / 127.5
    pad = (-len(sig)) % M.FEATURE_DIM
    if pad:
        sig = np.pad(sig, (0, pad))
    want = sig.reshape(M.FEATURE_DIM, -1).mean(axis=1)
    got = np.array(rows[0]["feature"], dtype=np.float32)
    assert np.allclose(got, want, atol=1e-6)
