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


def test_multipolygon_geojson_roundtrip(spark):
    r1 = [{"x": 0.0, "y": 0.0}, {"x": 2.0, "y": 0.0}, {"x": 2.0, "y": 2.0},
          {"x": 0.0, "y": 0.0}]
    r2 = [{"x": 10.0, "y": 10.0}, {"x": 12.5, "y": 10.0}, {"x": 12.5, "y": 11.0},
          {"x": 10.0, "y": 10.0}]
    df = spark.createDataFrame([([r1, r2],)],
                               "rings array<array<struct<x:double,y:double>>>")
    js = df.select(V.rings_to_geojson("rings").alias("j")).collect()[0].j
    parsed = json.loads(js)
    assert parsed["type"] == "MultiPolygon"
    assert len(parsed["coordinates"]) == 2
    assert parsed["coordinates"][1][0][1] == [12.5, 10.0]
    back = df.select(V.geojson_to_rings(V.rings_to_geojson("rings")).alias("r")).collect()[0].r
    assert len(back) == 2 and len(back[0]) == 4 and len(back[1]) == 4
    assert back[1][1].x == pytest.approx(12.5)
    # a plain Polygon parses to a 1-array through the same dispatcher
    single = df.select(V.geojson_to_rings(
        F.lit('{"type": "Polygon", "coordinates": [[[1.0,2.0],[3.0,2.0],[1.0,2.0]]]}')
    ).alias("r")).collect()[0].r
    assert len(single) == 1 and single[0][1].x == 3.0
    # unknown type → NULL, never a throw (wrap_geometry raises; the
    # relational form is NULL)
    bad = df.select(V.geojson_to_rings(F.lit('{"type": "LineString", "coordinates": []}')).alias("r")).collect()[0].r
    assert bad is None


def test_multipoint_geojson_parse(spark):
    df = spark.range(1)
    js = '{"type": "MultiPoint", "coordinates": [[1.5,2.5],[3.0,-4.0]]}'
    pts = df.select(V.geojson_to_points(F.lit(js)).alias("p")).collect()[0].p
    assert [(p.x, p.y) for p in pts] == [(1.5, 2.5), (3.0, -4.0)]
    one = df.select(V.geojson_to_points(
        F.lit('{"type": "Point", "coordinates": [7.0,8.0]}')).alias("p")).collect()[0].p
    assert [(p.x, p.y) for p in one] == [(7.0, 8.0)]


def test_area_centroid_shoelace(spark):
    from rasters_spark.functions import vector as vecfn

    def poly(pid, pts):
        return (pid, [{"x": float(x), "y": float(y)} for x, y in pts])

    square = [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]          # CCW: area +4
    ell = [(0, 0), (3, 0), (3, 1), (1, 1), (1, 2), (0, 2), (0, 0)]  # concave, area 4
    cw = list(reversed(square))                                 # CW: area -4
    df = spark.createDataFrame(
        [poly(1, square), poly(2, ell), poly(3, cw)],
        "poly_id long, ring array<struct<x:double,y:double>>")
    got = {r.poly_id: (r.area, r.cx, r.cy) for r in vecfn.area_centroid(df).collect()}
    assert got[1] == (4.0, 1.0, 1.0)
    a, cx, cy = got[2]
    assert a == 4.0
    # L-shape = 3x1 rect (centroid 1.5, .5) + 1x1 square (centroid .5, 1.5)
    assert cx == pytest.approx((3 * 1.5 + 1 * 0.5) / 4)
    assert cy == pytest.approx((3 * 0.5 + 1 * 1.5) / 4)
    assert got[3][0] == -4.0  # signed: CW ring is negative
