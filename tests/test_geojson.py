"""GeoJSON writer/parser round-trips (vector_geometry.py:116-123,
wrap_geometry.py:19-81 analogues)."""

import json

import pytest
from pyspark.sql import functions as F

from rasters_spark.functions import vector as V


def test_ring_geojson_roundtrip(spark):
    ring = [{"x": -120.123456789, "y": 40.5}, {"x": -119.0, "y": 40.5},
            {"x": -119.0, "y": 39.5}, {"x": -120.123456789, "y": 40.5}]
    df = spark.createDataFrame([(ring,)], "ring array<struct<x:double,y:double>>")
    js = df.select(V.ring_to_geojson("ring").alias("j")).collect()[0].j
    parsed = json.loads(js)  # valid JSON by a third-party parser
    assert parsed["type"] == "Polygon"
    assert parsed["coordinates"][0][0] == [-120.123457, 40.5]  # %.6f rounding
    back = df.select(V.geojson_to_ring(V.ring_to_geojson("ring")).alias("r")).collect()[0].r
    assert len(back) == 4
    assert back[0].x == pytest.approx(-120.123457) and back[2].y == pytest.approx(39.5)


def test_point_geojson_roundtrip(spark):
    df = spark.range(1)
    js = df.select(V.point_to_geojson(F.lit(12.25), F.lit(-33.5)).alias("j")).collect()[0].j
    assert json.loads(js)["coordinates"] == [12.25, -33.5]
    pt = df.select(V.geojson_to_point(F.lit(js)).alias("p")).collect()[0].p
    assert (pt.x, pt.y) == (12.25, -33.5)


def test_geojson_malformed_inputs_null(spark):
    cases = ["", "{}", "[1,2]", '{"type":"Polygon","coordinates":[]}',
             '{"type":"Point","coordinates":[]}']
    df = spark.createDataFrame([(c,) for c in cases], "js string")
    rings = df.select(V.geojson_to_ring("js").alias("r")).collect()
    assert all(r.r is None or len(r.r) == 0 for r in rings)
    pts = df.select(V.geojson_to_point("js").alias("p")).collect()
    assert all(p.p is None or p.p.x is None for p in pts)
