"""Grid-based k-nearest-neighbor join (ST_KNN).

The reference implements kNN with a global R-tree neighbor search plus
optional tie-breakers (`rust/sedona-spatial-join/src/index.rs:499-676`).
Distributed from scratch, we use ring expansion over the quadkey grid:

    1. index the BUILD (object) side by cell at level L;
    2. aggregate per-cell counts — a tiny stats table, broadcast to all
       executors (the distributed stand-in for the shared R-tree);
    3. for each probe point, compute (vectorized, against the broadcast
       counts) the smallest Chebyshev ring radius R whose cells hold ≥ k
       candidates, then add ONE guard ring — candidates within radius R
       guarantee the true k nearest lie within (R+1) cells only if the
       k-th candidate distance ≤ R · cell_size; we *verify* that bound and
       escalate the radius for the (rare) probes that fail it;
    4. explode probes to their (2R+1)² candidate cells, equi-join on cell,
       compute exact distances vectorized, and take `row_number() ≤ k`
       over `Window.partitionBy(probe).orderBy(dist, tiebreak_id)`.

Step 3's escalation loop runs on the driver over a DataFrame filter —
each pass is a full distributed job, and the loop terminates because the
radius doubles each time (≤ log₂(grid_size) passes; in practice 0-1
extra pass).

Correctness contract mirrored from the reference tests
(`python/sedonadb/tests/test_knnjoin.py:60-85`): |result| = |probe|·k
(when build has ≥ k rows) and per-probe distances ascend; ties broken by
object id (deterministic), with `include_ties` adding rank()-style ties
like `knn_include_tie_breakers`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, LongType

from ..geometry import algos, wkb
from ..tiling import Grid


def _points_xy(df: DataFrame, geom_col: str, xname: str, yname: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def px(s: pd.Series) -> pd.Series:
        x, _, v = wkb.decode_points_xy(list(s))
        out = pd.Series(x)
        out[~v] = None
        return out

    @F.pandas_udf(DoubleType())
    def py(s: pd.Series) -> pd.Series:
        _, y, v = wkb.decode_points_xy(list(s))
        out = pd.Series(y)
        out[~v] = None
        return out

    return df.withColumn(xname, px(F.col(geom_col))).withColumn(yname, py(F.col(geom_col)))


def _broadcast_knn(spark, P: DataFrame, B: DataFrame, k: int, pcols, bcols,
                   build_id, use_spheroid: bool, include_ties: bool) -> DataFrame:
    """Exact kNN with the build side broadcast: per probe Arrow batch, one
    vectorized (batch x n_build) distance matrix + argpartition."""
    tie_col = f"_b_{build_id}" if build_id else "_bid"
    brows = B.select("_bid", "_bx", "_by", tie_col).collect()
    bid = np.array([r["_bid"] for r in brows], dtype=np.int64)
    bx = np.array([r["_bx"] for r in brows], dtype=np.float64)
    by = np.array([r["_by"] for r in brows], dtype=np.float64)
    tie = np.array([r[tie_col] for r in brows])
    # pre-sort build by the tie key so ties resolve by position
    order0 = np.argsort(tie, kind="stable")
    bid, bx, by = bid[order0], bx[order0], by[order0]
    bc = spark.sparkContext.broadcast((bid, bx, by))
    k_eff = min(k, len(bid))

    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        list(P.schema.fields)
        + [
            StructField("_bid_m", LongType()),
            StructField("knn_distance", DoubleType()),
            StructField("knn_rank", IntegerType()),
        ]
    )

    def solve(batches):
        bid_, bx_, by_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            px = pdf["_px"].to_numpy(np.float64)
            py = pdf["_py"].to_numpy(np.float64)
            if use_spheroid:
                d = algos.haversine_m(px[:, None], py[:, None], bx_[None, :], by_[None, :])
            else:
                dx = px[:, None] - bx_[None, :]
                dy = py[:, None] - by_[None, :]
                d = dx * dx + dy * dy
            idx_rows, idx_cols, dists, ranks = [], [], [], []
            if include_ties:
                part = np.sort(d, axis=1)
                kth = part[:, k_eff - 1]
                for i in range(len(px)):
                    sel = np.nonzero(d[i] <= kth[i])[0]
                    dv = d[i, sel]
                    o = np.argsort(dv, kind="stable")
                    sel, dv = sel[o], dv[o]
                    # competition rank over distance only
                    rk = np.searchsorted(np.sort(d[i]), dv, side="left") + 1
                    idx_rows.extend([i] * len(sel))
                    idx_cols.extend(sel.tolist())
                    dists.extend(dv.tolist())
                    ranks.extend(rk.astype(int).tolist())
            else:
                # take every candidate within the k-th distance (ties at the
                # boundary included), order by (distance, tie key), keep k —
                # argpartition alone could drop the tie-key-preferred row of
                # a boundary tie
                kth = np.partition(d, k_eff - 1, axis=1)[:, k_eff - 1]
                for i in range(len(px)):
                    sel = np.nonzero(d[i] <= kth[i])[0]
                    o = np.lexsort((sel, d[i, sel]))[:k_eff]
                    sel = sel[o]
                    idx_rows.extend([i] * k_eff)
                    idx_cols.extend(sel.tolist())
                    dists.extend(d[i, sel].tolist())
                    ranks.extend(range(1, k_eff + 1))
            out = pdf.iloc[idx_rows].reset_index(drop=True)
            out["_bid_m"] = bid_[idx_cols]
            dd = np.asarray(dists)
            out["knn_distance"] = dd if use_spheroid else np.sqrt(dd)
            out["knn_rank"] = np.asarray(ranks, dtype=np.int32)
            yield out

    res = P.mapInPandas(solve, out_schema)
    Bj = F.broadcast(B.withColumnRenamed("_bid", "_bid_m").drop("_bx", "_by"))
    joined = res.join(Bj, "_bid_m")
    out_cols = (
        [F.col(f"_p_{c}").alias(c) for c in pcols]
        + [F.col(f"_b_{c}").alias(c) for c in bcols]
        + [F.col("knn_distance"), F.col("knn_rank").cast("int").alias("knn_rank")]
    )
    return joined.select(*out_cols)


def knn_join(
    probe: DataFrame,
    build: DataFrame,
    k: int,
    probe_geom: str = "geometry",
    build_geom: str = "geometry",
    probe_id: Optional[str] = None,
    build_id: Optional[str] = None,
    use_spheroid: bool = False,
    include_ties: bool = False,
    grid_level: int = 8,
    max_radius_passes: int = 6,
    broadcast_threshold: int = 200_000,
) -> DataFrame:
    """For each probe point return its k nearest build points.

    Output: all probe columns + all build columns + `knn_distance` +
    `knn_rank`. Distances are planar euclidean, or haversine meters when
    use_spheroid (the reference's Euclidean/Haversine metric choice,
    `index.rs:34-37`).
    """
    spark = probe.sparkSession
    grid = Grid(grid_level)

    # prefix both sides so duplicate column names can't collide (same
    # contract as spatial_join; output restores original names)
    pcols, bcols = probe.columns, build.columns
    P = probe.select([F.col(c).alias(f"_p_{c}") for c in pcols]).withColumn(
        "_pid", F.monotonically_increasing_id()
    )
    B = build.select([F.col(c).alias(f"_b_{c}") for c in bcols]).withColumn(
        "_bid", F.monotonically_increasing_id()
    )
    P = _points_xy(P, f"_p_{probe_geom}", "_px", "_py").where(F.col("_px").isNotNull())
    B = _points_xy(B, f"_b_{build_geom}", "_bx", "_by").where(F.col("_bx").isNotNull())

    @F.pandas_udf(LongType())
    def cell_of(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(grid.cell_of_points(x.to_numpy(np.float64), y.to_numpy(np.float64)))

    # --- small build side: broadcast the whole build table and solve each
    # probe batch exactly with numpy (the distributed analogue of the
    # reference's shared in-memory R-tree, exec.rs `OnceAsync` build — on a
    # cluster "shared memory" = a broadcast variable). No shuffle of the
    # probe side at all; one window-free pass.
    n_build = B.count()
    if n_build <= broadcast_threshold:
        return _broadcast_knn(
            spark, P, B, k, pcols, bcols, build_id,
            use_spheroid=use_spheroid, include_ties=include_ties,
        )

    B = B.withColumn("_cell", cell_of(F.col("_bx"), F.col("_by"))).cache()

    # --- broadcast per-cell histogram (ix, iy, count) -------------------------
    hist_rows = B.groupBy("_cell").count().collect()
    total_build = int(sum(r["count"] for r in hist_rows))
    k_eff = min(k, total_build) if total_build else 0
    cells = np.array([r["_cell"] for r in hist_rows], dtype=np.int64)
    counts = np.array([r["count"] for r in hist_rows], dtype=np.int64)
    hix, hiy = grid.unpack(cells)
    nx = grid.nx
    # dense 2D prefix-sum for O(1) ring-count queries; level 8 -> 256x256 ints
    dense = np.zeros((nx, nx), dtype=np.int64)
    dense[hix, hiy] = counts
    psum = dense.cumsum(axis=0).cumsum(axis=1)
    bc_psum = spark.sparkContext.broadcast(psum)

    def ring_count(ix, iy, r):
        """Vectorized count of build points within Chebyshev radius r."""
        ps = bc_psum.value
        x0 = np.clip(ix - r, 0, nx - 1)
        y0 = np.clip(iy - r, 0, nx - 1)
        x1 = np.clip(ix + r, 0, nx - 1)
        y1 = np.clip(iy + r, 0, nx - 1)
        total = ps[x1, y1]
        left = np.where(x0 > 0, ps[np.maximum(x0 - 1, 0), y1], 0)
        down = np.where(y0 > 0, ps[x1, np.maximum(y0 - 1, 0)], 0)
        corner = np.where((x0 > 0) & (y0 > 0), ps[np.maximum(x0 - 1, 0), np.maximum(y0 - 1, 0)], 0)
        return total - left - down + corner

    @F.pandas_udf(IntegerType())
    def initial_radius(x: pd.Series, y: pd.Series) -> pd.Series:
        ix, iy = grid.xy_to_ij(x.to_numpy(np.float64), y.to_numpy(np.float64))
        r = np.zeros(len(ix), dtype=np.int64)
        pending = ring_count(ix, iy, r) < k_eff
        # expand until ≥ k candidates; bounded by grid size
        step = 0
        while pending.any() and step < 2 * nx:
            r = np.where(pending, r + 1, r)
            pending = ring_count(ix, iy, r) < k_eff
            step += 1
        return pd.Series((r + 1).astype(np.int32))  # +1 guard ring

    @F.pandas_udf(ArrayType(LongType()))
    def cells_within(x: pd.Series, y: pd.Series, radius: pd.Series) -> pd.Series:
        ix, iy = grid.xy_to_ij(x.to_numpy(np.float64), y.to_numpy(np.float64))
        rr = radius.to_numpy(np.int64)
        ps = bc_psum.value
        out = []
        for i in range(len(ix)):
            r = int(rr[i])
            x0, x1 = max(ix[i] - r, 0), min(ix[i] + r, nx - 1)
            y0, y1 = max(iy[i] - r, 0), min(iy[i] + r, nx - 1)
            xs = np.arange(x0, x1 + 1)
            ys = np.arange(y0, y1 + 1)
            gx, gy = np.meshgrid(xs, ys)
            gx, gy = gx.ravel(), gy.ravel()
            # prune empty cells via the histogram — only emit non-empty ones
            nonzero = dense_lookup(ps, gx, gy)
            keep = nonzero > 0
            out.append(grid.pack(gx[keep], gy[keep]).tolist())
        return pd.Series(out, dtype=object)

    def dense_lookup(ps, gx, gy):
        # exact per-cell count from the prefix sum
        a = ps[gx, gy]
        b = np.where(gx > 0, ps[np.maximum(gx - 1, 0), gy], 0)
        c = np.where(gy > 0, ps[gx, np.maximum(gy - 1, 0)], 0)
        d = np.where((gx > 0) & (gy > 0), ps[np.maximum(gx - 1, 0), np.maximum(gy - 1, 0)], 0)
        return a - b + (-c + d)

    def run_pass(Pr: DataFrame) -> DataFrame:
        cand = (
            Pr.withColumn("_cand_cell", F.explode("_cells"))
            .drop("_cells")
            .join(B, F.col("_cand_cell") == F.col("_cell"), "inner")
            .drop("_cand_cell", "_cell")
        )
        if use_spheroid:
            @F.pandas_udf(DoubleType())
            def dist(px, py, bx, by):
                return pd.Series(
                    algos.haversine_m(px.to_numpy(np.float64), py.to_numpy(np.float64),
                                      bx.to_numpy(np.float64), by.to_numpy(np.float64))
                )
            dcol = dist(F.col("_px"), F.col("_py"), F.col("_bx"), F.col("_by"))
        else:
            # squared distance via plain multiply/add (NOT POWER): the exact
            # IEEE ops any SQL engine uses for (dx*dx + dy*dy), so rankings
            # are bit-reproducible against external oracles
            dx = F.col("_px") - F.col("_bx")
            dy = F.col("_py") - F.col("_by")
            dcol = dx * dx + dy * dy
        cand = cand.withColumn("_rankkey", dcol)
        # rank on the squared distance (sqrt can collapse 1-ulp-distinct
        # keys into equal doubles and reorder vs an external oracle); the
        # reported distance applies sqrt afterwards
        dist_out = F.col("_rankkey") if use_spheroid else F.sqrt("_rankkey")
        if include_ties:
            # rank over distance ONLY: equidistant rows share a rank and all
            # come back (`knn_include_tie_breakers` in the reference,
            # rust/sedona-spatial-join/src/index.rs:499-676)
            w = Window.partitionBy("_pid").orderBy(F.col("_rankkey").asc())
            ranked = cand.withColumn("knn_rank", F.rank().over(w))
        else:
            # deterministic tie-break: a user-named build id beats the
            # synthetic (partitioning-dependent) _bid
            tie = F.col(f"_b_{build_id}").asc() if build_id else F.col("_bid").asc()
            w = Window.partitionBy("_pid").orderBy(F.col("_rankkey").asc(), tie)
            ranked = cand.withColumn("knn_rank", F.row_number().over(w))
        return ranked.withColumn("knn_distance", dist_out).where(
            F.col("knn_rank") <= k
        ).drop("_rankkey")

    P1 = P.withColumn("_r", initial_radius(F.col("_px"), F.col("_py")))
    P1 = P1.withColumn("_cells", cells_within(F.col("_px"), F.col("_py"), F.col("_r"))).cache()

    result = run_pass(P1)

    # --- correctness escalation -------------------------------------------------
    # the k-th distance must not exceed the guaranteed search radius: with
    # every cell within Chebyshev distance r of the probe's cell searched,
    # any unseen point lies in a cell ≥ r+1 away, hence at least r full
    # cells (r * min(cw, ch)) from anywhere in the probe's cell. Probes
    # whose k-th distance exceeds that bound re-run with doubled radius.
    result = result.cache()
    for _ in range(max_radius_passes):
        guarantee = F.col("_r").cast("double") * F.lit(min(grid.cw, grid.ch))
        if use_spheroid:
            # degrees -> meters lower bound at the equator-safe scale:
            # 1 deg >= 111.19 km * cos(|lat|) in lon; use lat-aware factor
            guarantee = guarantee * F.lit(111194.9266) * F.least(
                F.cos(F.radians(F.col("_py"))), F.lit(1.0)
            )
        kth = result.groupBy("_pid").agg(
            F.max("knn_distance").alias("_kth"), F.count("*").alias("_n")
        )
        need = (
            P1.join(kth, "_pid", "left")
            .withColumn("_guarantee", guarantee)
            .where(
                F.col("_kth").isNull()
                | (F.col("_n") < F.lit(k_eff))
                | (F.col("_kth") > F.col("_guarantee"))
            )
        )
        n_need = need.count()
        if n_need == 0:
            break
        # double the radius for unsafe probes and redo their pass
        P_retry = need.select(*P1.columns).withColumn("_r", (F.col("_r") * 2).cast("int"))
        P_retry = P_retry.withColumn("_cells", cells_within(F.col("_px"), F.col("_py"), F.col("_r")))
        retry_res = run_pass(P_retry)
        ok_ids = need.select("_pid")
        result = result.join(ok_ids, "_pid", "left_anti").unionByName(retry_res).cache()
        P1 = P1.join(ok_ids, "_pid", "left_anti").unionByName(P_retry).cache()

    out_cols = (
        [F.col(f"_p_{c}").alias(c) for c in pcols]
        + [F.col(f"_b_{c}").alias(c) for c in bcols]
        + [F.col("knn_distance"), F.col("knn_rank")]
    )
    return result.select(*out_cols)
