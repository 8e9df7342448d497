"""GeoJSON codec (geometry/geojson.py + ST_AsGeoJSON/ST_GeomFromGeoJSON):
pinned RFC 7946 strings, WKB round-trips across every type, Z kept /
M dropped, Feature rejection, mixed-dimension promotion."""

from __future__ import annotations

import json

import pytest

from sedona_db_spark.geometry import geojson, wkb


def _gj(wkt):
    return geojson.to_geojson(wkb.from_wkt(wkt))


def _rt(wkt):
    """WKT -> geojson -> Geometry -> WKT"""
    return wkb.to_wkt(geojson.from_geojson(_gj(wkt)))


PINNED = [
    ("POINT (1 2)", '{"type":"Point","coordinates":[1,2]}'),
    ("POINT Z (1 2 3)", '{"type":"Point","coordinates":[1,2,3]}'),
    ("POINT EMPTY", '{"type":"Point","coordinates":[]}'),
    ("LINESTRING (0 0, 1.5 2.5)",
     '{"type":"LineString","coordinates":[[0,0],[1.5,2.5]]}'),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
     '{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]],'
     '[[1,1],[2,1],[2,2],[1,2],[1,1]]]}'),
    ("MULTIPOINT (1 2, 3 4)",
     '{"type":"MultiPoint","coordinates":[[1,2],[3,4]]}'),
    ("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
     '{"type":"MultiLineString","coordinates":[[[0,0],[1,1]],[[2,2],[3,3]]]}'),
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
     '{"type":"MultiPolygon","coordinates":[[[[0,0],[1,0],[1,1],[0,0]]]]}'),
    ("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
     '{"type":"GeometryCollection","geometries":['
     '{"type":"Point","coordinates":[1,2]},'
     '{"type":"LineString","coordinates":[[0,0],[1,1]]}]}'),
]


@pytest.mark.parametrize("wkt,expected", PINNED)
def test_pinned_strings(wkt, expected):
    assert _gj(wkt) == expected


@pytest.mark.parametrize("wkt,_", PINNED)
def test_round_trip(wkt, _):
    # compare against the WKT writer's own canonical spelling
    assert _rt(wkt) == wkb.to_wkt(wkb.from_wkt(wkt))


def test_m_dropped_z_kept():
    assert _gj("POINT ZM (1 2 3 4)") == '{"type":"Point","coordinates":[1,2,3]}'
    assert _gj("POINT M (1 2 9)") == '{"type":"Point","coordinates":[1,2]}'


def test_output_is_valid_json():
    for wkt, _ in PINNED:
        obj = json.loads(_gj(wkt))
        assert obj["type"]


def test_feature_rejected():
    with pytest.raises(ValueError, match="Feature"):
        geojson.from_geojson(
            '{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},'
            '"properties":{}}')


def test_bad_json_and_bad_type():
    with pytest.raises(ValueError, match="invalid JSON"):
        geojson.from_geojson("{nope")
    with pytest.raises(ValueError, match="unknown GeoJSON"):
        geojson.from_geojson('{"type":"Circle","coordinates":[]}')
    with pytest.raises(ValueError, match="2 or 3"):
        geojson.from_geojson('{"type":"LineString","coordinates":[[1,2,3,4],[0,0]]}')


def test_mixed_dim_promotion():
    g = geojson.from_geojson(
        '{"type":"MultiPoint","coordinates":[[1,2],[3,4,5]]}')
    assert g.has_z
    assert wkb.to_wkt(g) == "MULTIPOINT Z ((1 2 0), (3 4 5))"


def test_shortest_repr_round_trip_precision():
    # non-terminating binary fractions survive bit-exactly
    wkt = "POINT (0.1 -122.41942382812499)"
    g = geojson.from_geojson(_gj(wkt))
    orig = wkb.from_wkt(wkt)
    assert g.coords[0].tolist() == orig.coords[0].tolist()


def test_sql_surface(spark):
    from sedona_db_spark.functions.st import register_all

    register_all(spark)
    row = spark.sql(
        "SELECT ST_AsGeoJSON(ST_Point(1.5D, 2.5D)) AS gj, "
        "ST_AsText(ST_GeomFromGeoJSON('{\"type\":\"Point\",\"coordinates\":[3,4]}')) AS back, "
        "ST_AsGeoJSON(CAST(NULL AS BINARY)) AS n"
    ).collect()[0]
    assert row["gj"] == '{"type":"Point","coordinates":[1.5,2.5]}'
    assert row["back"] == "POINT (3 4)"
    assert row["n"] is None
