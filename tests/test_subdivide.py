"""ST_SubDivide (operators/subdivide.py): partition law, vertex bound,
split geometry, identity below the bound, loud failures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sedona_db_spark.geometry import algos, wkb
from sedona_db_spark.operators.subdivide import subdivide, subdivide_parts


def _poly(wkt):
    return wkb.encode(wkb.from_wkt(wkt))


# an L: [0,4]x[0,2] plus [0,2]x[2,3] — envelope [0,4]x[0,3], wider than
# tall, so the first split is at x=2 and both halves are rectangles
L_WKT = "POLYGON ((0 0, 4 0, 4 2, 2 2, 2 3, 0 3, 0 0))"

# 16-gon approximating a circle at (10, 10), radius 4
import math

_GON = "POLYGON ((" + ", ".join(
    f"{10 + 4 * math.cos(2 * math.pi * i / 16):.6f} "
    f"{10 + 4 * math.sin(2 * math.pi * i / 16):.6f}"
    for i in list(range(16)) + [0]) + "))"

HOLED = ("POLYGON ((0 0, 12 0, 12 8, 0 8, 0 0), "
         "(3 2, 5 2, 5 4, 3 4, 3 2))")


def test_l_shape_single_split(spark):
    df = spark.createDataFrame([(1, _poly(L_WKT))], "id long, geom binary")
    out = subdivide(df, "geom", max_vertices=5).collect()
    assert len(out) == 2
    boxes = sorted(
        algos.bounds(wkb.parse(bytes(r["part"]))) for r in out)
    assert boxes == [(0.0, 0.0, 2.0, 3.0), (2.0, 0.0, 4.0, 2.0)]
    assert abs(sum(algos.area(wkb.parse(bytes(r["part"]))) for r in out)
               - 10.0) < 1e-9


@pytest.mark.parametrize("wkt,mv", [(L_WKT, 5), (_GON, 6), (HOLED, 5),
                                    (_GON, 8), (HOLED, 7)])
def test_partition_law_and_vertex_bound(spark, wkt, mv):
    g = wkb.from_wkt(wkt)
    df = spark.createDataFrame([(1, wkb.encode(g))], "id long, geom binary")
    out = subdivide(df, "geom", max_vertices=mv).collect()
    assert out, "subdivision of a positive-area polygon must emit parts"
    total = 0.0
    for r in out:
        p = wkb.parse(bytes(r["part"]))
        assert p.type_id == wkb.POLYGON
        assert algos.num_points(p) <= mv
        total += algos.area(p)
    assert abs(total - algos.area(g)) < 1e-6 * max(1.0, algos.area(g))


def test_identity_below_bound(spark):
    df = spark.createDataFrame([(1, _poly(L_WKT))], "id long, geom binary")
    out = subdivide(df, "geom", max_vertices=16).collect()
    assert len(out) == 1
    assert algos.bounds(wkb.parse(bytes(out[0]["part"]))) == (0, 0, 4, 3)


def test_multipolygon_and_nulls(spark):
    mp = wkb.from_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
                      "((5 0, 9 0, 9 2, 7 2, 7 3, 5 3, 5 0)))")
    df = spark.createDataFrame([(1, wkb.encode(mp)), (2, None)],
                               "id long, geom binary")
    out = subdivide(df, "geom", max_vertices=5).collect()
    # unit square passes through + the L splits into two
    assert len(out) == 3 and {r["id"] for r in out} == {1}


def test_lineal_input_raises(spark):
    df = spark.createDataFrame(
        [(1, wkb.encode(wkb.from_wkt("LINESTRING (0 0, 1 1)")))],
        "id long, geom binary")
    with pytest.raises(Exception, match="areal"):
        subdivide(df, "geom", max_vertices=5).collect()


def test_max_vertices_guard():
    with pytest.raises(ValueError, match=">= 5"):
        subdivide_parts(4)


def test_part_idx_contiguous(spark):
    df = spark.createDataFrame([(7, _poly(_GON))], "id long, geom binary")
    out = subdivide(df, "geom", max_vertices=6).orderBy("part_idx").collect()
    assert [r["part_idx"] for r in out] == list(range(len(out)))
