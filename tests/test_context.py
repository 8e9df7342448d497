"""connect()-style API parity (reference python/sedonadb context.py /
dataframe.py surface re-expressed over a SparkSession)."""

import numpy as np
import pytest

import sedona_db_spark as sd
from sedona_db_spark.geometry import wkb


def test_connect_sql_and_views(spark, tmp_path):
    con = sd.connect(spark)
    # sql with registered functions
    r = con.sql("SELECT ST_Area(ST_GeomFromWKT('POLYGON ((0 0,2 0,2 2,0 2,0 0))')) a").collect()[0]
    assert r["a"] == 4.0
    # create_data_frame + to_view + view + sql-over-view
    import pandas as pd

    df = con.create_data_frame(pd.DataFrame({"id": [1, 2, 3]}))
    con.to_view(df, "t_ctx", overwrite=True)
    assert con.sql("SELECT count(*) c FROM t_ctx").collect()[0]["c"] == 3
    assert con.view("t_ctx").count() == 3
    with pytest.raises(ValueError):
        con.to_view(df, "t_ctx")  # exists, no overwrite
    con.drop_view("t_ctx")
    with pytest.raises(Exception):
        con.view("t_ctx")


def test_connect_geoparquet_roundtrip(spark, tmp_path):
    con = sd.connect(spark)
    x = np.array([1.0, 2.0, 3.0]); y = np.array([4.0, 5.0, 6.0])
    rows = [(int(i), bytes(b)) for i, b in enumerate(wkb.encode_points_xy(x, y))]
    df = spark.createDataFrame(rows, "id LONG, geometry BINARY")
    p = str(tmp_path / "ctx_gp")
    con.to_parquet(df, p)
    back = con.read_parquet(p)
    assert back.count() == 3 and "geometry_bbox" in back.columns
    mem = con.to_memtable(back)
    assert mem.count() == 3
