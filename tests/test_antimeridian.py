"""kNN candidate wrap across the antimeridian (cells.ring_cells pmod)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rasters_spark import codec, grid
from rasters_spark.operators import knn


def _tile_row(iid, x0, y0, w=8, h=8):
    arr = np.full((h, w), 1.0, dtype=np.float32)
    return (iid, codec.encode_tile(arr, "raw"), w, h, "raw", x0, y0, 1.0 / w, -1.0 / h, "EPSG:4326")


def test_knn_wraps_the_seam(spark):
    schema = ("image_id string, bytes binary, w int, h int, fmt string, x_origin double, "
              "y_origin double, cell_width double, cell_height double, crs string")
    rows = [
        _tile_row("west_of_seam", -180.0, 1.0),   # footprint [-180,-179]×[0,1]
        _tile_row("east_of_seam", 179.0, 1.0),    # footprint [179,180]×[0,1]
        _tile_row("far_away", -90.0, 1.0),
    ]
    t = spark.createDataFrame(rows, schema)
    t = t.withColumn("grid", grid.grid_struct("x_origin", "y_origin", "cell_width",
                                              "cell_height", F.col("h"), F.col("w"), "crs"))
    t = t.withColumn("bbox", grid.grid_bbox(F.col("grid")))
    # query just EAST of the seam: nearest tiles are east_of_seam (same side)
    # and west_of_seam (across the wrap) — the latter is only reachable if
    # ring candidacy wraps longitudes
    pts = spark.createDataFrame([(1, 179.9, 0.5)], "point_id long, x double, y double")
    got = knn.knn_tiles(pts, t, k=3, ring=2).orderBy("rank").collect()
    ids = [r.image_id for r in got]
    assert "east_of_seam" in ids
    assert "west_of_seam" in ids, "antimeridian wrap candidate missed"
    assert "far_away" not in ids  # beyond the ring radius
    # NOTE: ranking uses raw coordinate distance (no wrap in the metric
    # itself — matches the reference's planar distances); candidacy wraps.
    assert ids[0] == "east_of_seam"
