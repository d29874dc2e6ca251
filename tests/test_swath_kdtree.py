"""Swath operators vs numpy recomputation + persisted resample index."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rasters_spark import fixtures, npref
from rasters_spark.operators import resample, swath as SW
from rasters_spark.tableio import TableIO
from rasters_spark.tiles import load_tiles

SF = "/root/testdata/sf0.001"
TARGET = dict(x_origin=-120.0, y_origin=40.0, cell_width=0.1, cell_height=-0.1,
              rows=10, cols=10, crs="EPSG:4326")


def _swath_df(spark):
    """FIXTURES.md §5 meshgrid: x=linspace(-120,-119,50), y=linspace(40,39,50)."""
    r = spark.range(50).select(F.col("id").alias("row"))
    c = spark.range(50).select(F.col("id").alias("col"))
    return r.crossJoin(c).select(
        F.lit(0).alias("swath_id"), "row", "col",
        (-120.0 + F.col("col") / 49.0).alias("x"),
        (40.0 - F.col("row") / 49.0).alias("y"),
        ((F.col("row") * 50 + F.col("col")).cast("double") * 0.25).alias("value"),
    )


def _swath_np():
    c, r = np.meshgrid(np.arange(50), np.arange(50))
    return r, c, -120.0 + c / 49.0, 40.0 - r / 49.0, (r * 50 + c) * 0.25


def test_swath_bbox_mask_inclusive(spark):
    sw = _swath_df(spark)
    got = SW.swath_bbox_mask(sw, -119.7, 39.3, -119.3, 39.7).count()
    r, c, x, y, v = _swath_np()
    exp = int(((x >= -119.7) & (x <= -119.3) & (y >= 39.3) & (y <= 39.7)).sum())
    assert got == exp > 0


def test_swath_window_tight_bounds_and_buffer(spark):
    sw = _swath_df(spark)
    got = SW.swath_window(sw, -119.7, 39.3, -119.3, 39.7, buffer=2).collect()[0]
    r, c, x, y, v = _swath_np()
    m = (x >= -119.7) & (x <= -119.3) & (y >= 39.3) & (y <= 39.7)
    rr, cc = np.where(m)
    assert got.row_start == max(rr.min() - 2, 0) and got.row_end == min(rr.max() + 2, 49)
    assert got.col_start == max(cc.min() - 2, 0) and got.col_end == min(cc.max() + 2, 49)


def test_swath_window_disjoint_is_empty(spark):
    sw = _swath_df(spark)
    assert SW.swath_window(sw, 10.0, 10.0, 11.0, 11.0).count() == 0


def test_swath_index_point_nearest(spark):
    sw = _swath_df(spark)
    pts = spark.createDataFrame(
        [(1, -119.527, 39.481), (2, -120.0, 40.0), (3, -119.013, 39.977)],
        "point_id long, x double, y double")
    got = {r.point_id: r for r in SW.swath_index_point(sw, pts).collect()}
    r, c, x, y, v = _swath_np()
    for pid, qx, qy in [(1, -119.527, 39.481), (2, -120.0, 40.0), (3, -119.013, 39.977)]:
        d = np.hypot(x - qx, y - qy)
        i = np.unravel_index(np.argmin(d), d.shape)
        assert (got[pid].row, got[pid].col) == (int(i[0]), int(i[1]))
        assert got[pid].dist == pytest.approx(float(d[i]), rel=1e-12)


def test_swath_to_grid_nn_matches_numpy(spark):
    sw = _swath_df(spark)
    got = {(r.trow, r.tcol): (r.value, r.dist) for r in SW.swath_to_grid_nn(sw, TARGET).collect()}
    r, c, x, y, v = _swath_np()
    trow, tcol = npref.index_point(x.ravel(), y.ravel(), TARGET["x_origin"], TARGET["y_origin"],
                                   TARGET["cell_width"], TARGET["cell_height"])
    exp = {}
    for rr_, cc_, tr, tc, vv in zip(r.ravel(), c.ravel(), trow, tcol, v.ravel()):
        if not (0 <= tr < 10 and 0 <= tc < 10):
            continue
        cx, cy = npref.cell_center(tr, tc, TARGET["x_origin"], TARGET["y_origin"],
                                   TARGET["cell_width"], TARGET["cell_height"])
        px = -120.0 + cc_ / 49.0
        py = 40.0 - rr_ / 49.0
        d = float(np.hypot(px - cx, py - cy))
        if d > 0.2:
            continue
        key = (tr, tc)
        if key not in exp or (d, rr_, cc_) < exp[key][1]:
            exp[key] = (float(vv), (d, rr_, cc_))
    assert got.keys() == exp.keys()
    for k in exp:
        assert got[k][0] == exp[k][0] and got[k][1] == pytest.approx(exp[k][1][0], rel=1e-12)


def test_persisted_resample_index_reuse(spark, tmp_path):
    fixtures.ensure_fixtures(SF)
    tiles = load_tiles(spark, SF).filter("image_id < 'img000000000040'")
    target = dict(x_origin=-180.0, y_origin=90.0, cell_width=0.25, cell_height=-0.25,
                  rows=720, cols=1440, crs="EPSG:4326")
    tbl = TableIO(str(tmp_path / "kdt"))
    entry = resample.build_resample_index(tiles, target, tbl)
    assert entry["operation"] == "resample-index" and entry["row_count"] > 0
    direct = resample.to_grid_nearest(tiles, target).toPandas().sort_values(
        ["image_id", "trow", "tcol"]).reset_index(drop=True)
    via_index = resample.resample_with_index(spark, tiles, tbl).toPandas().sort_values(
        ["image_id", "trow", "tcol"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(direct[["image_id", "trow", "tcol", "value"]], via_index, check_exact=True)
    # second application hits the SAME snapshot (no rebuild)
    assert tbl.current_snapshot() == 1
