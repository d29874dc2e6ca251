"""GeoPackage (OGC 1.2) sink/source round-trips — stdlib sqlite3 + WKB
(functions/geopackage.py; closes the reference's to_geopackage seam,
raster.py:1789-1865 family)."""

import sqlite3
import tempfile

import pytest
from pyspark.sql import functions as F

from rasters_spark.functions import geopackage as G
from rasters_spark.tiles import load_polygons


def test_wkb_roundtrips():
    assert G.parse_wkb(G.point_wkb(12.5, -3.25)) == ("Point", (12.5, -3.25))
    ring = [(0.0, 0.0), (2.0, 0.0), (2.0, 1.5), (0.0, 0.0)]
    kind, rings = G.parse_wkb(G.polygon_wkb([ring]))
    assert kind == "Polygon" and rings[0] == ring
    hole = [(0.5, 0.25), (1.0, 0.25), (0.5, 0.5), (0.5, 0.25)]
    kind, rings = G.parse_wkb(G.polygon_wkb([ring, hole]))
    assert len(rings) == 2 and rings[1] == hole
    kind, polys = G.parse_wkb(G.multipolygon_wkb([[ring], [hole]]))
    assert kind == "MultiPolygon" and polys[0][0] == ring and polys[1][0] == hole


def test_gpkg_container_contract():
    feats = [{"wkb": G.point_wkb(float(i), float(-i)), "name": f"p{i}"} for i in range(5)]
    blob = G.encode_gpkg("pts", "POINT", feats, [("name", "TEXT")])
    # third-party check: plain sqlite3 sees the GPKG pragmas + metadata
    with tempfile.NamedTemporaryFile(suffix=".gpkg") as fh:
        fh.write(blob)
        fh.flush()
        con = sqlite3.connect(fh.name)
        assert con.execute("PRAGMA application_id").fetchone()[0] == G.GPKG_APPLICATION_ID
        assert con.execute("PRAGMA user_version").fetchone()[0] == G.GPKG_USER_VERSION
        assert con.execute("select data_type, srs_id from gpkg_contents").fetchone() == ("features", 4326)
        assert con.execute("select geometry_type_name from gpkg_geometry_columns").fetchone()[0] == "POINT"
        assert con.execute("select count(*) from gpkg_spatial_ref_sys").fetchone()[0] == 3
        con.close()
    back = G.decode_gpkg(blob)["pts"]
    assert [f["geom"] for f in back] == [("Point", (float(i), float(-i))) for i in range(5)]
    assert [f["name"] for f in back] == [f"p{i}" for i in range(5)]


def test_gpkg_geom_header_roundtrip():
    wkb = G.point_wkb(1.0, 2.0)
    blob = G.gpkg_geom(wkb, srs_id=4326)
    assert blob[:2] == b"GP"
    assert G.parse_gpkg_geom(blob) == wkb
    with pytest.raises(ValueError):
        G.parse_gpkg_geom(b"XX" + blob[2:])


def test_save_geopackage_distributed_sink(spark, tmp_path):
    polys = load_polygons(spark, "/root/testdata/sf0.001").select(
        "poly_id", "ring", "burn_value").repartition(3)
    out = str(tmp_path / "gpkg_out")
    G.save_geopackage(polys, out, layer="polys",
                      attr_cols=[("burn_value", "REAL")])
    import glob
    files = sorted(glob.glob(out + "/part-*.gpkg"))
    assert files  # at least one non-empty partition wrote a file
    got = {}
    for f in files:
        with open(f, "rb") as fh:
            for feat in G.decode_gpkg(fh.read())["polys"]:
                kind, rings = feat["geom"]
                assert kind == "Polygon"
                got[feat["poly_id"]] = (len(rings[0]), feat["burn_value"])
    exp = {r.poly_id: (len(r.ring), r.burn_value) for r in polys.collect()}
    assert got == exp


def test_gpkg_tiles_pyramid_roundtrip():
    """Raster tiles container (raster.py:1715-1741 semantics): a 2x2
    pyramid of PNG tiles survives encode->decode with metadata and
    payload intact, in deterministic (row, col) order."""
    import numpy as np

    from rasters_spark.functions.geopackage import decode_gpkg_tiles, encode_gpkg_tiles
    from rasters_spark.functions.render import decode_png, encode_png

    pngs = {}
    tiles = []
    for row in (0, 1):
        for col in (0, 1):
            img = np.full((8, 8), 40 * (2 * row + col), dtype=np.uint8)
            png = encode_png(img)
            pngs[(row, col)] = png
            tiles.append({"tile_column": col, "tile_row": row, "png": png})
    blob = encode_gpkg_tiles("pyr", tiles, (-10.0, 40.0, -8.0, 42.0),
                             zoom=0, matrix_w=2, matrix_h=2, tile_w=8, tile_h=8,
                             pixel_x=0.125, pixel_y=0.125)
    back = decode_gpkg_tiles(blob)
    assert back["table"] == "pyr" and back["bbox"] == (-10.0, 40.0, -8.0, 42.0)
    assert back["zoom"] == 0 and back["matrix"] == (2, 2)
    assert back["tile_size"] == (8, 8) and back["pixel_size"] == (0.125, 0.125)
    assert [(t["row"], t["col"]) for t in back["tiles"]] == [(0, 0), (0, 1), (1, 0), (1, 1)]
    for t in back["tiles"]:
        assert bytes(t["png"]) == pngs[(t["row"], t["col"])]
        assert decode_png(bytes(t["png"])).shape == (8, 8)
    # deterministic container for deterministic input
    assert encode_gpkg_tiles("pyr", tiles, (-10.0, 40.0, -8.0, 42.0),
                             zoom=0, matrix_w=2, matrix_h=2, tile_w=8, tile_h=8,
                             pixel_x=0.125, pixel_y=0.125) == blob


def test_save_geopackage_tiles_distributed_sink(spark, tmp_path):
    """Partition-level pyramid sink: every partition writes one .gpkg,
    all tiles land exactly once, payload decodes back."""
    import numpy as np
    from pathlib import Path

    from rasters_spark.functions.geopackage import decode_gpkg_tiles, save_geopackage_tiles
    from rasters_spark.functions.render import encode_png

    rows = []
    for row in range(2):
        for col in range(3):
            png = encode_png(np.full((4, 4), 10 * (3 * row + col), dtype=np.uint8))
            rows.append((col, row, bytearray(png),
                         -10.0 + col, 40.0 - row - 1, -10.0 + col + 1, 40.0 - row))
    df = spark.createDataFrame(
        rows, "tile_column int, tile_row int, png binary, "
              "xmin double, ymin double, xmax double, ymax double").repartition(2)
    out = str(tmp_path / "pyr")
    save_geopackage_tiles(df, out, tile_w=4, tile_h=4, pixel_x=0.25, pixel_y=0.25)
    parts = sorted(Path(out).glob("part-*.gpkg"))
    assert parts
    seen = []
    for p in parts:
        back = decode_gpkg_tiles(p.read_bytes())
        assert back["tile_size"] == (4, 4)
        seen += [(t["row"], t["col"]) for t in back["tiles"]]
    assert sorted(seen) == sorted((r, c) for c, r, *_ in rows)
