"""kmeans_points: deterministic init, Lloyd iterations, tie rule —
differential vs a plain numpy reference implementation."""

from __future__ import annotations

import numpy as np
import pytest

from sedona_db_spark.geometry import wkb
from sedona_db_spark.operators.kmeans import kmeans_points


def _df(spark, pts):
    rows = [(i, wkb.encode(wkb.point(float(x), float(y))))
            for i, (x, y) in enumerate(pts)]
    return spark.createDataFrame(rows, "id long, geometry binary")


def _reference(pts, k, iterations):
    cents = [tuple(pts[i]) for i in range(k)]  # k smallest ids
    for _ in range(iterations + 1):
        d = np.array([[ (p[0]-c[0])**2 + (p[1]-c[1])**2 for c in cents]
                      for p in pts])
        assign = d.argmin(axis=1)  # numpy argmin = first minimum (tie rule)
        if _ == iterations:
            return assign
        new = []
        for i in range(k):
            sel = pts[assign == i]
            if len(sel):
                new.append((round(float(sel[:, 0].mean()), 6),
                            round(float(sel[:, 1].mean()), 6)))
            else:
                new.append(cents[i])
        cents = new


def test_kmeans_matches_reference(spark):
    rng = np.random.default_rng(3)
    pts = np.vstack([
        rng.normal([0, 0], 1.0, (40, 2)),
        rng.normal([20, 0], 1.0, (30, 2)),
        rng.normal([0, 20], 1.0, (30, 2)),
    ])
    got = {r["id"]: r["cluster"]
           for r in kmeans_points(_df(spark, pts), 3, 4).collect()}
    want = _reference(pts, 3, 4)
    assert got == {i: int(want[i]) for i in range(len(pts))}
    # the three blobs separate
    assert len({got[0], got[45], got[75]}) == 3


def test_kmeans_deterministic_under_partitioning(spark):
    rng = np.random.default_rng(5)
    pts = rng.uniform(-50, 50, (200, 2))
    a = sorted(map(tuple, kmeans_points(_df(spark, pts).repartition(7),
                                        4, 3).collect()))
    b = sorted(map(tuple, kmeans_points(_df(spark, pts).coalesce(1),
                                        4, 3).collect()))
    assert a == b


def test_kmeans_guards(spark):
    df = _df(spark, np.array([[0.0, 0.0]]))
    with pytest.raises(ValueError, match="k must"):
        kmeans_points(df, 0)
    with pytest.raises(ValueError, match="only"):
        kmeans_points(df, 3)
