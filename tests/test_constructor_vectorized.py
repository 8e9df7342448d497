"""Vectorized constructor/codec kernels (round-2 VERDICT "What's wrong" #3):
PointZ/M/ZM, MakeEnvelope, MakeLine, FromWKT point fast path, AsText point
fast path — byte-identical to the scalar path and ≥several× faster."""

import time

import numpy as np
import pytest

from pyspark.sql import functions as F

from sedona_db_spark.geometry import wkb


RNG = np.random.default_rng(17)
N = 100_000
X = RNG.uniform(-180, 180, N)
Y = RNG.uniform(-90, 90, N)
Z = RNG.uniform(-100, 100, N)
M = RNG.uniform(0, 1, N)


class TestByteIdentity:
    def test_pointzm_variants(self):
        k = 500
        for kw, mk in [
            (dict(z=Z[:k]), lambda i: wkb.point(X[i], Y[i], Z[i])),
            (dict(m=M[:k]), lambda i: wkb.point(X[i], Y[i], m=M[i])),
            (dict(z=Z[:k], m=M[:k]), lambda i: wkb.point(X[i], Y[i], Z[i], M[i])),
        ]:
            fast = wkb.encode_points_xyzm(X[:k], Y[:k], **kw)
            for i in range(k):
                assert bytes(fast[i]) == wkb.encode(mk(i))

    def test_boxes(self):
        k = 500
        fast = wkb.encode_boxes(X[:k], Y[:k], X[:k] + 1, Y[:k] + 2)
        for i in range(k):
            assert bytes(fast[i]) == wkb.encode(
                wkb.box(X[i], Y[i], X[i] + 1, Y[i] + 2)
            )

    def test_segments_roundtrip(self):
        k = 200
        segs = wkb.encode_segments_xy(X[:k], Y[:k], X[k:2 * k], Y[k:2 * k])
        for i in range(k):
            g = wkb.parse(bytes(segs[i]))
            assert g.type_id == wkb.LINESTRING
            assert np.allclose(g.coords, [[X[i], Y[i]], [X[k + i], Y[k + i]]])


class TestMicrobench:
    def test_pointz_vectorized_speedup(self):
        # best-of-3 each side: single timings are load-sensitive on shared
        # hosts (one stall on either side flips the ratio)
        t_fast, t_slow = float("inf"), float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            wkb.encode_points_xyzm(X, Y, z=Z)
            t_fast = min(t_fast, time.perf_counter() - t0)
            t0 = time.perf_counter()
            _ = [
                wkb.encode(wkb.point(float(a), float(b), float(c)))
                for a, b, c in zip(X[:20000], Y[:20000], Z[:20000])
            ]
            t_slow = min(t_slow, time.perf_counter() - t0)
        per_row = t_slow / 20000 * N
        speedup = per_row / t_fast
        # observed ~11x; assert a conservative floor for noisy CI hosts
        assert speedup >= 3.0, f"speedup {speedup:.1f}x"


class TestSparkSurface:
    def test_constructors_through_spark(self, spark):
        from sedona_db_spark.functions import st

        df = spark.createDataFrame(
            [(1.5, 2.5, 3.5, 4.5), (-10.0, 20.0, 30.0, 40.0)],
            "x DOUBLE, y DOUBLE, z DOUBLE, m DOUBLE",
        )
        rows = df.select(
            st.ST_PointZ("x", "y", "z").alias("pz"),
            st.ST_PointM("x", "y", "m").alias("pm"),
            st.ST_PointZM("x", "y", "z", "m").alias("pzm"),
            st.ST_MakeEnvelope("x", "y", F.col("x") + 1, F.col("y") + 1).alias("env"),
        ).collect()
        g = wkb.parse(bytes(rows[0]["pz"]))
        assert g.has_z and not g.has_m
        assert list(g.coords[0]) == [1.5, 2.5, 3.5]
        g = wkb.parse(bytes(rows[0]["pm"]))
        assert g.has_m and not g.has_z
        g = wkb.parse(bytes(rows[0]["pzm"]))
        assert g.has_z and g.has_m
        env = wkb.parse(bytes(rows[1]["env"]))
        assert env.type_id == wkb.POLYGON
        assert list(env.coords[0][2]) == [-9.0, 21.0]

    def test_fromwkt_fast_and_slow_paths(self, spark):
        from sedona_db_spark.functions import st

        rows = [
            ("POINT (1.5 2.5)",),
            ("POINT(-3 4)",),
            ("  POINT ( 1e2   -0.5 ) ",),
            ("LINESTRING (0 0, 1 1)",),
            ("POINT Z (1 2 3)",),
            (None,),
        ]
        df = spark.createDataFrame(rows, "wkt STRING")
        got = df.select(st.ST_GeomFromText("wkt").alias("g")).collect()
        want = [None if r[0] is None else wkb.encode(wkb.from_wkt(r[0])) for r in rows]
        for g, w in zip(got, want):
            assert (g["g"] is None and w is None) or bytes(g["g"]) == w

    def test_astext_parity(self, spark):
        from sedona_db_spark.functions import st

        geoms = [
            wkb.encode(wkb.point(1.5, -2.0)),
            wkb.encode(wkb.point(3.0, 4.0)),
            wkb.encode(wkb.from_wkt("LINESTRING (0 0, 1.25 2.5)")),
            wkb.encode(wkb.from_wkt("POINT Z (1 2 3)")),
            None,
        ]
        df = spark.createDataFrame([(g,) for g in geoms], "g BINARY")
        got = [r["t"] for r in df.select(st.ST_AsText("g").alias("t")).collect()]
        want = [None if g is None else wkb.to_wkt(wkb.parse(g)) for g in geoms]
        assert got == want

    def test_makeline_fast_and_slow(self, spark):
        from sedona_db_spark.functions import st

        a = wkb.encode(wkb.point(0.0, 0.0))
        b = wkb.encode(wkb.point(1.0, 2.0))
        mp = wkb.encode(wkb.from_wkt("MULTIPOINT (5 5, 6 6)"))
        df = spark.createDataFrame([(a, b), (a, mp), (None, b)], "g1 BINARY, g2 BINARY")
        got = [r["l"] for r in df.select(st.ST_MakeLine("g1", "g2").alias("l")).collect()]
        g0 = wkb.parse(bytes(got[0]))
        assert np.allclose(g0.coords, [[0, 0], [1, 2]])
        g1 = wkb.parse(bytes(got[1]))
        assert np.allclose(g1.coords, [[0, 0], [5, 5], [6, 6]])
        assert got[2] is None


class TestHeaderWalkAccessors:
    """Round-4 (VERDICT r3 #9): accessor kernels answer from the WKB
    header walk, >=3x faster than the full parse on mixed 100k batches,
    byte-identical answers."""

    @staticmethod
    def _mixed_batch(n):
        import numpy as np

        from sedona_db_spark.geometry import wkb as W

        rng = np.random.default_rng(2)
        out = []
        for i in range(n):
            k = i % 6
            if k == 0:
                out.append(W.encode(W.from_wkt(f"POINT ({i} {i+1})")))
            elif k == 1:
                pts = rng.uniform(0, 10, (8, 2))
                out.append(W.encode(W.Geometry(W.LINESTRING, pts)))
            elif k == 2:
                ring = np.array([[0, 0], [4, 0], [4, 4], [0, 0]], dtype=float) + i % 7
                out.append(W.encode(W.Geometry(W.POLYGON, [ring])))
            elif k == 3:
                out.append(W.encode(W.from_wkt("POINT Z (1 2 3)")))
            elif k == 4:
                out.append(W.encode(W.from_wkt(
                    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")))
            else:
                out.append(None if i % 30 == 5 else W.encode(W.from_wkt("POINT EMPTY")))
        return out

    @staticmethod
    def _timed(f):
        import time

        t0 = time.perf_counter()
        f()
        return time.perf_counter() - t0

    def test_parity_and_speed(self):
        import time

        from sedona_db_spark.functions.st import (
            _geometrytype_batch,
            _numgeometries_batch,
            _zmflag_batch,
        )
        from sedona_db_spark.geometry import wkb as W

        bufs = self._mixed_batch(100_000)

        def parse_types(bs):
            return [None if v is None else W.TYPE_NAMES[W.parse(v).type_id]
                    for v in bs]

        # best-of-3 on both sides: a single timing is load-sensitive when
        # the suite shares the host with other work, and one transient
        # stall on either side flips the ratio
        t_new = min(
            self._timed(lambda: _geometrytype_batch(bufs)) for _ in range(3)
        )
        t_old = min(self._timed(lambda: parse_types(bufs)) for _ in range(3))
        got = _geometrytype_batch(bufs)
        want = parse_types(bufs)
        assert got == want
        assert t_old / max(t_new, 1e-9) >= 3.0, (t_new, t_old)

        # parity for the other header kernels
        def n_old(v):
            if v is None:
                return None
            g = W.parse(v)
            if g.type_id in (W.MULTIPOINT, W.MULTILINESTRING, W.MULTIPOLYGON,
                             W.GEOMETRYCOLLECTION):
                return len(g.coords)
            return 0 if g.is_empty else 1

        sample = bufs[:6000]
        assert _numgeometries_batch(sample) == [n_old(v) for v in sample]
        assert _zmflag_batch(sample) == [
            None if v is None else
            (2 if W.parse(v).has_z else 0) + (1 if W.parse(v).has_m else 0)
            for v in sample
        ]

    def test_header_walk_edge_cases(self):
        import struct

        import numpy as np

        from sedona_db_spark.geometry import wkb as W

        # big-endian point, EWKB SRID point, empty multis, truncated blob
        be_pt = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 1.5, 2.5)
        ewkb = b"\x01" + struct.pack("<I", 1 | 0x20000000) + struct.pack("<i", 4326) \
            + struct.pack("<dd", 3.0, 4.0)
        empties = [W.encode(W.from_wkt(w)) for w in
                   ("MULTIPOINT EMPTY", "GEOMETRYCOLLECTION EMPTY",
                    "LINESTRING EMPTY", "POINT EMPTY")]
        bufs = [be_pt, ewkb] + empties + [b"\x01\x01\x00", None]
        t, z, m, cnt, pe, ok = W.decode_headers(bufs)
        assert list(t[:2]) == [W.POINT, W.POINT] and ok[0] and ok[1]
        assert not pe[0] and not pe[1]
        assert list(cnt[2:6]) == [0, 0, 0, -1]
        assert pe[5]
        assert not ok[6] and not ok[7]  # truncated / None fall back

        from sedona_db_spark.functions.st import _geometrytype_batch

        assert _geometrytype_batch([be_pt, ewkb]) == ["ST_Point", "ST_Point"]
