"""GeoJSONSeq (.geojsonl) source/sink round trips."""

import json

import pytest

from pyspark.sql import functions as F

from sedona_db_spark.geometry import wkb
from sedona_db_spark.sources.geojsonseq import read_geojsonseq, write_geojsonseq


@pytest.fixture()
def sample_path(spark, tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    lines = [
        json.dumps({"type": "Feature",
                    "geometry": {"type": "Point", "coordinates": [1.5, 2.5]},
                    "properties": {"name": "a", "rank": 3}}),
        "",
        json.dumps({"type": "Point", "coordinates": [7, 8]}),  # bare geometry
        "\x1e" + json.dumps({"type": "Feature",
                             "geometry": {"type": "Polygon", "coordinates":
                                          [[[0, 0], [4, 0], [4, 2], [0, 2],
                                            [0, 0]]]},
                             "properties": {"name": "b",
                                            "tags": ["x", "y"]}}),
    ]
    (p / "part-0.geojsonl").write_text("\n".join(lines))
    return str(p)


class TestRead:
    def test_reads_features_and_bare_geoms(self, spark, sample_path):
        df = read_geojsonseq(spark, sample_path)
        rows = df.collect()
        assert len(rows) == 3
        by_name = {}
        for r in rows:
            g = wkb.parse(bytes(r.geometry))
            by_name[(r.properties or {}).get("name")] = (g, r.properties)
        pt, props = by_name["a"]
        assert wkb.to_wkt(pt) == "POINT (1.5 2.5)"
        assert props["rank"] == "3"
        poly, props_b = by_name["b"]
        assert poly.type_id == wkb.POLYGON
        assert json.loads(props_b["tags"]) == ["x", "y"]
        bare, _ = by_name[None]
        assert wkb.to_wkt(bare) == "POINT (7 8)"


class TestRoundTrip:
    def test_write_read(self, spark, tmp_path):
        from sedona_db_spark.functions import st

        df = spark.range(20).select(
            st.ST_Point(F.col("id").cast("double"),
                        (F.col("id") * 2).cast("double")).alias("geometry"),
            F.create_map(F.lit("id"),
                         F.col("id").cast("string")).alias("properties"),
        )
        out = str(tmp_path / "out")
        write_geojsonseq(df, out)
        back = read_geojsonseq(spark, out)
        assert back.count() == 20
        got = sorted(
            (int(r.properties["id"]),
             wkb.parse(bytes(r.geometry)).coords[0].tolist())
            for r in back.collect())
        assert got == [(i, [float(i), float(2 * i)]) for i in range(20)]

    def test_distributed_write_no_driver_collect(self, spark, tmp_path):
        import glob
        from sedona_db_spark.functions import st

        df = spark.range(100).repartition(4).select(
            st.ST_Point(F.col("id").cast("double"), F.lit(0.0))
            .alias("geometry"))
        out = str(tmp_path / "out4")
        write_geojsonseq(df, out, props_col=None)
        parts = [f for f in glob.glob(out + "/part-*") if "crc" not in f]
        assert len(parts) == 4
        assert read_geojsonseq(spark, out).count() == 100
