"""Replicates the driver's correctness gate locally: run every
`__spark_entry__.queries()` entry on Spark and its `oracle_sql()` twin on
DuckDB at sf0.01, compare row count, column names, and order-insensitive
values. Run: `python tests/oracle_check.py [sf_dir]`."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return "T" if val else "F"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)
    if isinstance(val, (bytes, bytearray)):
        return bytes(val).hex()
    return str(val)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    # ORACLE_SKIP: run these queries SPARK-SIDE ONLY (rows reported, no
    # DuckDB compare). For large-sf validation runs where a twin is
    # inherently quadratic in DuckDB (the kNN oracles are row_number over
    # a full CROSS JOIN — 1.5e9 intermediate rows at sf1; the dbscan /
    # cluster_within twins close connected components with a recursive
    # reachability CTE that materializes O(|component|^2) rows, fine on
    # sf0.01's small clusters but explosive once the sf1 grid connects;
    # the dedup_clusters / corpus_curate twins EMBED the full minhash
    # pipeline — 24 min of DuckDB on its own at sf1 — inside a recursive
    # CTE, which DuckDB re-derives per reachability step: >1 h observed
    # before the round-5 run was cut over to skipping them at sf1; the
    # knn_graph twin is an embeddings x embeddings LATERAL — 4e8 64-dim
    # dot products at sf1; the ripleys_k twin counts pairs from a banded
    # self-join whose pair count grows ~quadratically with density)
    # while the Spark side is the thing under test. The full value
    # compare still gates these queries at sf0.01/sf0.1.
    oracle_skip = set(
        s for s in os.environ.get("ORACLE_SKIP", "").split(",") if s)

    import duckdb

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(os.environ.get("ORACLE_MASTER", "local[8]"))
        .config("spark.sql.shuffle.partitions",
                os.environ.get("ORACLE_SHUFFLE", "8"))
        # sf1 result sets (pair joins, per-doc fingerprints) are collected
        # on the driver for the value compare; the 1g default OOMs there
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time as _time

        t0 = _time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        t_spark = _time.time() - t0
        if name not in oracles:
            print(f"weak {name}: rows={len(srows)} (no oracle)"
                  f" [{t_spark:.1f}s spark]")
            continue
        if name in oracle_skip:
            print(f"ok*  {name}: {len(srows)} rows (oracle skipped via "
                  f"ORACLE_SKIP) [{t_spark:.1f}s spark]")
            continue
        t0 = _time.time()
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL {name}: oracle error {str(e)[:300]}")
            continue
        t_oracle = _time.time() - t0
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            sk, ok = frame_key(scols, srows), frame_key(ocols, orows)
            if sk != ok:
                diffs = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(p[:400] for p in problems)}")
        else:
            print(f"ok   {name}: {len(srows)} rows"
                  f" [{t_spark:.1f}s spark, {t_oracle:.1f}s oracle]")

    # smoke: entry()
    try:
        n = entrymod.entry(spark).count()
        print(f"entry(): {n} rows")
        if n <= 0:
            failures.append(("entry", "0 rows"))
    except Exception as e:
        failures.append(("entry", str(e)))
        print(f"FAIL entry: {e}")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nALL OK")


if __name__ == "__main__":
    main()
