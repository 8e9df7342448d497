"""sd_random_geometry parity generator tests (FIXTURES.md §3)."""

import json

from pyspark.sql import functions as F

from sedona_db_spark.geometry import algos, wkb
from sedona_db_spark.sources.random_geometry import random_geometry


def test_point_generation_deterministic(spark):
    opts = {"geom_type": "Point", "target_rows": 100, "seed": 42,
            "bounds": [0, 0, 100, 100]}
    a = random_geometry(spark, opts).collect()
    b = random_geometry(spark, json.dumps(opts)).collect()
    assert len(a) == 100
    assert {r["id"]: r["geometry"] for r in a} == {r["id"]: r["geometry"] for r in b}
    for r in a[:20]:
        g = wkb.parse(bytes(r["geometry"]))
        assert g.type_id == wkb.POINT
        x, y = g.coords[0, :2]
        assert 0 <= x <= 100 and 0 <= y <= 100
        assert 0 <= r["dist"] < 100


def test_polygon_generation_with_holes(spark):
    opts = {"geom_type": "Polygon", "target_rows": 60, "seed": 43,
            "polygon_hole_rate": 1.0, "size_range": [2, 10]}
    rows = random_geometry(spark, opts).collect()
    assert len(rows) == 60
    for r in rows[:20]:
        g = wkb.parse(bytes(r["geometry"]))
        assert g.type_id == wkb.POLYGON
        assert len(g.coords) == 2  # shell + hole
        assert algos.area(g) > 0


def test_null_and_empty_rates(spark):
    opts = {"geom_type": "Point", "target_rows": 400, "seed": 1,
            "null_rate": 0.3, "empty_rate": 0.2}
    rows = random_geometry(spark, opts).collect()
    nulls = sum(1 for r in rows if r["geometry"] is None)
    empties = sum(
        1 for r in rows if r["geometry"] is not None and wkb.parse(bytes(r["geometry"])).is_empty
    )
    assert 0.2 < nulls / 400 < 0.4
    assert 0.1 < empties / 400 < 0.3


def test_collections(spark):
    opts = {"geom_type": "GeometryCollection", "target_rows": 30, "seed": 7,
            "num_parts_range": [2, 5]}
    rows = random_geometry(spark, opts).collect()
    for r in rows[:10]:
        g = wkb.parse(bytes(r["geometry"]))
        assert g.type_id == wkb.GEOMETRYCOLLECTION
        assert 2 <= len(g.coords) <= 5


def test_partition_seeding_stable_across_partition_count(spark):
    """Same options, different partitions arg -> per-partition streams are
    seeded by partition id, so identical partitioning is reproducible."""
    opts = {"geom_type": "Point", "target_rows": 50, "seed": 9}
    a = random_geometry(spark, opts, partitions=4).collect()
    b = random_geometry(spark, opts, partitions=4).collect()
    assert {r["id"]: r["geometry"] for r in a} == {r["id"]: r["geometry"] for r in b}
