"""Grid struct math vs the transcribed reference formulas (npref) —
including the tests/test_subsetting.py grid and banker's-rounding pins."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rasters_spark import grid, npref

# the reference test grid (tests/test_subsetting.py:17-26)
G = dict(x_origin=-120.0, y_origin=40.0, cell_width=0.01, cell_height=-0.01, rows=100, cols=100)


def _grid_col():
    return grid.grid_struct(G["x_origin"], G["y_origin"], G["cell_width"], G["cell_height"], G["rows"], G["cols"], "EPSG:4326")


def test_point_index_matches_reference(spark):
    rng = np.random.default_rng(7)
    xs = np.concatenate([rng.uniform(-120.2, -118.8, 200),
                         # exact half-integer inverse-affine pins (banker's rounding)
                         np.array([-120.0, -119.995, -119.99, -119.985, -118.995, -120.005])])
    ys = np.concatenate([rng.uniform(38.8, 40.2, 200),
                         np.array([40.0, 39.995, 39.99, 39.985, 39.005, 40.005])])
    df = spark.createDataFrame([(float(x), float(y)) for x, y in zip(xs, ys)], "x double, y double")
    g = _grid_col()
    got = df.select(grid.point_row(g, "y").alias("r"), grid.point_col(g, "x").alias("c")).toPandas()
    er, ec = npref.index_point(xs, ys, G["x_origin"], G["y_origin"], G["cell_width"], G["cell_height"])
    np.testing.assert_array_equal(got["r"].to_numpy(), er)
    np.testing.assert_array_equal(got["c"].to_numpy(), ec)


def test_window_subset_origin_shift(spark):
    # Window(col_off=10, row_off=20, w=30, h=40) → origin shift
    # (tests/test_subsetting.py:30-41)
    df = spark.range(1)
    g = _grid_col()
    win = F.struct(F.lit(20).cast("long").alias("row_start"), F.lit(10).cast("long").alias("col_start"),
                   F.lit(60).cast("long").alias("row_end"), F.lit(40).cast("long").alias("col_end"),
                   F.lit(False).alias("oob"))
    sub = df.select(grid.subset_grid(g, win).alias("s")).select("s.*").collect()[0]
    assert sub.rows == 40 and sub.cols == 30
    assert sub.x_origin == pytest.approx(-120.0 + 10 * 0.01, abs=1e-9)
    assert sub.y_origin == pytest.approx(40.0 + 20 * -0.01, abs=1e-9)


def test_window_for_bbox_matches_reference(spark):
    cases = [
        (-119.95, 39.90, -119.90, 39.95),   # interior polygon (test_subsetting.py:62-67)
        (-119.8, 39.2, -119.2, 39.8),       # bbox case
        (-120.5, 39.5, -119.5, 40.5),       # partial overlap → clamped
        (-115.0, 45.0, -114.0, 46.0),       # disjoint → oob
        (-120.0, 39.0, -119.0, 40.0),       # exact full extent
    ]
    df = spark.createDataFrame(cases, "xmin double, ymin double, xmax double, ymax double")
    g = _grid_col()
    bb = grid.bbox_struct("xmin", "ymin", "xmax", "ymax")
    got = df.select(grid.window_for_bbox(g, bb).alias("w")).select("w.*").toPandas()
    for i, (xmin, ymin, xmax, ymax) in enumerate(cases):
        rs, cs, re_, ce, oob = npref.window_for_bbox(
            xmin, ymin, xmax, ymax, G["x_origin"], G["y_origin"], G["cell_width"], G["cell_height"], G["rows"], G["cols"])
        assert got.loc[i, "oob"] == bool(oob), cases[i]
        if not oob:
            assert (got.loc[i, "row_start"], got.loc[i, "col_start"]) == (rs, cs)
            assert (got.loc[i, "row_end"], got.loc[i, "col_end"]) == (re_, ce)


def test_window_buffer_clamps(spark):
    # buffer expands then clamps to the grid (raster_grid.py:790-808)
    df = spark.range(1)
    g = _grid_col()
    bb = grid.bbox_struct(F.lit(-119.95), F.lit(39.90), F.lit(-119.90), F.lit(39.95))
    w0 = df.select(grid.window_for_bbox(g, bb).alias("w")).select("w.*").collect()[0]
    w3 = df.select(grid.window_for_bbox(g, bb, buffer=3).alias("w")).select("w.*").collect()[0]
    assert w3.row_start == max(w0.row_start - 3, 0)
    assert w3.col_end == min(w0.col_end + 3, G["cols"])


def test_grid_bbox_and_centers(spark):
    df = spark.range(1)
    g = _grid_col()
    row = df.select(grid.grid_bbox(g).alias("b"),
                    grid.cell_center_x(g, F.lit(0)).alias("cx"),
                    grid.cell_center_y(g, F.lit(0)).alias("cy")).collect()[0]
    assert row.b.xmin == -120.0 and row.b.ymax == 40.0
    assert row.b.xmax == pytest.approx(-119.0) and row.b.ymin == pytest.approx(39.0)
    ex, ey = npref.cell_center(0, 0, G["x_origin"], G["y_origin"], G["cell_width"], G["cell_height"])
    assert row.cx == pytest.approx(ex) and row.cy == pytest.approx(ey)


def test_buffer_rescale_shift(spark):
    df = spark.range(1)
    g = _grid_col()
    r = df.select(grid.buffer_grid(g, 5).alias("b"), grid.rescale_grid(g, 0.02).alias("r"),
                  grid.shift_xy_grid(g, 1.5, -2.5).alias("s")).collect()[0]
    assert r.b.rows == 110 and r.b.x_origin == pytest.approx(-120.05)
    assert r.r.rows == 50 and r.r.cols == 50 and r.r.cell_height == -0.02
    assert r.s.x_origin == pytest.approx(-118.5) and r.s.y_origin == pytest.approx(37.5)


def test_cell_size_meters_quirk(spark):
    from pyspark.sql import functions as F
    from rasters_spark import grid
    # 1° geographic cell → 40,075,017/180 = 222,639.0166... m — the
    # reference's wrong-on-purpose 2×-physical factor
    # (raster_geometry.py:683-693), transcribed verbatim
    df = spark.range(1).select(grid.grid_struct(0.0, 10.0, 1.0, -1.0, 10, 10).alias("g"))
    row = df.select(
        grid.cell_size(F.col("g")).alias("cs"),
        grid.cell_size_meters(F.col("g")).alias("csm"),
    ).collect()[0]
    assert row.cs == 1.0
    assert row.csm == 1.0 / 180.0 * 40075017.0
    # cell_size is the MIN of width/|height| (raster_geometry.py:667-668)
    df2 = spark.range(1).select(grid.grid_struct(0.0, 10.0, 2.0, -0.5, 10, 10).alias("g"))
    assert df2.select(grid.cell_size(F.col("g")).alias("cs")).collect()[0].cs == 0.5
    # projected CRS → cell_size passes through unchanged
    df3 = spark.range(1).select(
        grid.grid_struct(0.0, 10.0, 30.0, -30.0, 10, 10, "EPSG:32610").alias("g"))
    assert df3.select(grid.cell_size_meters(F.col("g")).alias("m")).collect()[0].m == 30.0
    # default KD-tree radius: 2.0 × nanmax of the two geometries' csm
    # (kdtree.py:27,168-179)
    gsrc = dict(x_origin=0, y_origin=0, cell_width=0.5, cell_height=-0.5, rows=1, cols=1, crs="EPSG:4326")
    gdst = dict(x_origin=0, y_origin=0, cell_width=1.0, cell_height=-1.0, rows=1, cols=1, crs="EPSG:4326")
    r = grid.kdtree_radius_meters(gsrc, gdst)
    assert r == 2.0 * (1.0 / 180.0 * 40075017.0)
    assert grid.meters_to_crs_units(r, gdst) == pytest.approx(2.0, rel=1e-12)


def test_resize_grid_shape_keep_square_quirk(spark):
    from pyspark.sql import functions as F
    from rasters_spark import grid
    # 10x20 grid, cells 1x-0.5 → resize to (5, 5): cw = 1*20/5 = 4,
    # ch = -0.5*10/5 = -1 ≠ -cw → keep_square OVERWRITES ch with -cw
    # (raster_grid.py:617-618: height follows width, extent NOT kept)
    df = spark.range(1).select(grid.grid_struct(0.0, 10.0, 1.0, -0.5, 10, 20).alias("g"))
    g2 = grid.resize_grid_shape(F.col("g"), 5, 5)
    r = df.select(g2.alias("o")).collect()[0].o
    assert (r.cell_width, r.cell_height, r.rows, r.cols) == (4.0, -4.0, 5, 5)
    # keep_square=False keeps the independently scaled height
    g3 = grid.resize_grid_shape(F.col("g"), 5, 5, keep_square=False)
    r3 = df.select(g3.alias("o")).collect()[0].o
    assert (r3.cell_width, r3.cell_height) == (4.0, -1.0)


def test_shift_distance_grid(spark):
    import math
    from pyspark.sql import functions as F
    from rasters_spark import grid
    df = spark.range(1).select(grid.grid_struct(0.0, 10.0, 1.0, -1.0, 10, 10).alias("g"))
    # direction 90° → pure +y shift (x_shift = d·cos90 ≈ 0)
    g2 = grid.shift_distance_grid(F.col("g"), 2.0, 90.0)
    r = df.select(g2.alias("o")).collect()[0].o
    assert r.x_origin == pytest.approx(0.0, abs=1e-12)
    assert r.y_origin == pytest.approx(12.0)
    # direction 0° → pure +x
    g3 = grid.shift_distance_grid(F.col("g"), 3.0, 0.0)
    r3 = df.select(g3.alias("o")).collect()[0].o
    assert r3.x_origin == pytest.approx(3.0) and r3.y_origin == pytest.approx(10.0)
