"""Resampling / compositing onto target grids — the physical operators.

Reference semantics transcribed (copy the code, not the docstring —
SURVEY §1.3(5)):

- ``Raster.merge`` (raster.py:773-822): float inputs composite as the
  MEAN of overlapping valid pixels (sum+count accumulators,
  :804-814). Relational form: nearest-sample every input at each
  target cell center, then ``sum(v)/count(v)``.
- ``mosaic()`` (mosaic.py:13-75): FIRST-non-NaN wins in input order
  (``where(isnan(mosaic), img, mosaic)`` fills only still-empty cells,
  mosaic.py:64) — despite its own docstring claiming later-takes-
  precedence. Relational form: ``min_by(value, seq)`` over valid rows.
- ``Raster.to_grid`` (raster.py:1325-1428): grid→grid warp; kernels
  nearest / bilinear (pinned by pytest goldens) / average
  (area-mean of source pixels per target cell).

Spark shape (SURVEY §3 EP2): target-cell candidates are generated per
tile by PURE SQL (window_for_bbox + sequence/explode — no KD-tree, no
Python), nearest values fetched O(1) per candidate from the binary
blob, composites are plain hash aggregations with map-side combine.
The persisted candidate mapping (image_id, trow, tcol, prow, pcol) IS
the reference's reusable KDTree index (kdtree.py:182-202) — write it
once with TableIO and broadcast-join it for repeated resampling.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from rasters_spark import grid


def target_candidates(tiles: DataFrame, target: dict) -> DataFrame:
    """Per tile × overlapping target cell: (image_id, trow, tcol, tx, ty,
    prow, pcol) with in-bounds nearest source-pixel indices."""
    tg = grid.grid_struct(**target)
    w = grid.window_for_bbox(tg, F.col("bbox"))
    sg = F.col("grid")
    cand = (
        tiles.withColumn("win", w)
        .filter(
            ~F.col("win")["oob"]
            & (F.col("win")["row_end"] > F.col("win")["row_start"])
            & (F.col("win")["col_end"] > F.col("win")["col_start"])
        )
        .withColumn("trow", F.explode(F.sequence(F.col("win")["row_start"], F.col("win")["row_end"] - 1)))
        .withColumn("tcol", F.explode(F.sequence(F.col("win")["col_start"], F.col("win")["col_end"] - 1)))
        .withColumn("tx", grid.cell_center_x(tg, F.col("tcol")))
        .withColumn("ty", grid.cell_center_y(tg, F.col("trow")))
        .withColumn("prow", grid.point_row(sg, F.col("ty")))
        .withColumn("pcol", grid.point_col(sg, F.col("tx")))
        .filter(grid.in_bounds(sg, F.col("prow"), F.col("pcol")))
    )
    return cand


def _with_nearest_value(cand: DataFrame) -> DataFrame:
    # JVM-side byte slicing (sample.sample_nearest): Arrow ships ~8 B per
    # candidate instead of the whole tile blob
    from rasters_spark.operators.sample import sample_nearest

    return sample_nearest(cand)


def merge_mean(tiles: DataFrame, target: dict) -> DataFrame:
    """Raster.merge float path: mean of valid overlaps per target cell
    → (trow, tcol, value, n)."""
    v = _with_nearest_value(target_candidates(tiles, target))
    return v.groupBy("trow", "tcol").agg(
        (F.sum("value") / F.count("value")).alias("value"),
        F.count("value").alias("n"),
    ).filter(F.col("n") > 0)


def mosaic_first(tiles: DataFrame, target: dict, order_col: str = "image_id") -> DataFrame:
    """mosaic(): first-non-NaN in input order per target cell
    → (trow, tcol, value)."""
    v = _with_nearest_value(target_candidates(tiles, target)).filter(F.col("value").isNotNull())
    return v.groupBy("trow", "tcol").agg(F.min_by("value", order_col).alias("value"))


def to_grid_nearest(tiles: DataFrame, target: dict) -> DataFrame:
    """Per-tile grid→grid nearest warp in sparse long form
    (image_id, trow, tcol, value) — the reference's per-raster
    to_grid(resampling='nearest'), one output row per target cell."""
    return _with_nearest_value(target_candidates(tiles, target)).select(
        "image_id", "trow", "tcol", "value"
    )


@pandas_udf(DoubleType())
def _bilinear_kernel(data, w, h, fmt, x0, y0, cw, ch, tx, ty):
    """Standard bilinear over the 4 surrounding pixel centers, neighbors
    clamped at tile edges, NaN if any contributing neighbor is NaN
    (matches rasterio bilinear-with-NaN-nodata propagation)."""
    from rasters_spark import codec

    out = np.empty(len(data), dtype=np.float64)
    for i in range(len(data)):
        arr = codec.decode_tile(data.iloc[i], int(w.iloc[i]), int(h.iloc[i]), fmt.iloc[i])
        hh, ww = arr.shape
        fc = (tx.iloc[i] - x0.iloc[i]) / cw.iloc[i] - 0.5
        fr = (ty.iloc[i] - y0.iloc[i]) / ch.iloc[i] - 0.5
        c0 = int(np.floor(fc)); r0 = int(np.floor(fr))
        dc = fc - c0; dr = fr - r0
        c0c, c1c = min(max(c0, 0), ww - 1), min(max(c0 + 1, 0), ww - 1)
        r0c, r1c = min(max(r0, 0), hh - 1), min(max(r0 + 1, 0), hh - 1)
        v00, v01 = arr[r0c, c0c], arr[r0c, c1c]
        v10, v11 = arr[r1c, c0c], arr[r1c, c1c]
        out[i] = ((1 - dr) * ((1 - dc) * v00 + dc * v01)
                  + dr * ((1 - dc) * v10 + dc * v11))
    return pd.Series(out)


def to_grid_bilinear(tiles: DataFrame, target: dict) -> DataFrame:
    """to_grid(resampling='linear') — bilinear warp per target cell in
    sparse long form (image_id, trow, tcol, value); NaN → NULL."""
    cand = target_candidates(tiles, target)
    g = F.col("grid")
    v = _bilinear_kernel(
        F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt"),
        g["x_origin"], g["y_origin"], g["cell_width"], g["cell_height"],
        F.col("tx"), F.col("ty"))
    return cand.withColumn("value", v).select("image_id", "trow", "tcol", "value")


def to_grid_average(tiles: DataFrame, target: dict) -> DataFrame:
    """to_grid(resampling='average'): area mean — every SOURCE pixel is
    assigned to the target cell containing its center; per (tile,
    target cell) mean. Runs as one Arrow pass per tile (vectorized
    binning, no pixel explosion through the shuffle)."""
    tg = grid.grid_struct(**target)
    t = tiles.select(
        "image_id", "bytes", "w", "h", "fmt",
        "x_origin", "y_origin", "cell_width", "cell_height",
        F.lit(target["x_origin"]).alias("t_x0"), F.lit(target["y_origin"]).alias("t_y0"),
        F.lit(target["cell_width"]).alias("t_cw"), F.lit(target["cell_height"]).alias("t_ch"),
        F.lit(target["rows"]).alias("t_rows"), F.lit(target["cols"]).alias("t_cols"),
    )
    schema = "image_id string, trow long, tcol long, vsum double, n long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rasters_spark import codec, npref

        for pdf in batches:
            frames = []
            for i, arr in enumerate(codec.decode_batch(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])):
                hh, ww = arr.shape
                x0, y0 = pdf["x_origin"].iloc[i], pdf["y_origin"].iloc[i]
                cw, ch = pdf["cell_width"].iloc[i], pdf["cell_height"].iloc[i]
                px = x0 + cw * (np.arange(ww) + 0.5)
                py = y0 + ch * (np.arange(hh) + 0.5)
                PX, PY = np.meshgrid(px, py)
                trow, tcol = npref.index_point(
                    PX.ravel(), PY.ravel(),
                    pdf["t_x0"].iloc[i], pdf["t_y0"].iloc[i], pdf["t_cw"].iloc[i], pdf["t_ch"].iloc[i])
                v = arr.ravel().astype(np.float64)
                ok = (np.isfinite(v) & (trow >= 0) & (trow < pdf["t_rows"].iloc[i])
                      & (tcol >= 0) & (tcol < pdf["t_cols"].iloc[i]))
                if not ok.any():
                    continue
                key = trow[ok] * int(pdf["t_cols"].iloc[i]) + tcol[ok]
                uniq, inv = np.unique(key, return_inverse=True)
                sums = np.zeros(len(uniq)); cnts = np.zeros(len(uniq), dtype=np.int64)
                np.add.at(sums, inv, v[ok])
                np.add.at(cnts, inv, 1)
                frames.append(pd.DataFrame({
                    "image_id": pdf["image_id"].iloc[i],
                    "trow": uniq // int(pdf["t_cols"].iloc[i]),
                    "tcol": uniq % int(pdf["t_cols"].iloc[i]),
                    "vsum": sums, "n": cnts,
                }))
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"image_id": [], "trow": [], "tcol": [], "vsum": [], "n": []})

    partials = t.mapInPandas(run, schema=schema)
    return partials.select("image_id", "trow", "tcol", (F.col("vsum") / F.col("n")).alias("value"), "n")


def reproject_utm(tiles: DataFrame, epsg: int, cell_size_m: float = 2000.0) -> DataFrame:
    """Raster.reproject / Raster.UTM (raster.py:1878-1915): derive a UTM
    target grid from the tiles' union extent (nanmin/max ± half-cell
    padding per grid_to_crs, raster_geometry.py:895-941) and warp every
    pixel center into it (nearest assignment).

    Pipeline: pixel_centroids → transform_xy kernel (numpy TM) → target
    cell assignment → first-per-cell composite. Output long form
    (trow, tcol, value, n_sources) on the UTM grid; the grid descriptor
    is emitted alongside as crossJoin-able metadata.
    """
    from rasters_spark.functions.crs import transform_xy
    from rasters_spark.functions.vector import pixel_centroids

    pc = pixel_centroids(tiles).withColumn("crs", F.lit("EPSG:4326"))
    utm = transform_xy(pc, dst=f"EPSG:{epsg}")
    ext = utm.agg(
        F.min("x_t").alias("xmin"), F.min("y_t").alias("ymin"),
        F.max("x_t").alias("xmax"), F.max("y_t").alias("ymax"),
    ).collect()[0]
    if ext.xmin is None:
        raise ValueError("reproject_utm: input has no valid pixels (empty tile selection?)")
    # half-cell padding, matching grid_to_crs extent derivation
    x0 = ext.xmin - cell_size_m / 2
    y0 = ext.ymax + cell_size_m / 2
    cols = int(np.ceil((ext.xmax + cell_size_m / 2 - x0) / cell_size_m))
    rows = int(np.ceil((y0 - (ext.ymin - cell_size_m / 2)) / cell_size_m))
    tg = dict(x_origin=x0, y_origin=y0, cell_width=cell_size_m, cell_height=-cell_size_m,
              rows=rows, cols=cols, crs=f"EPSG:{epsg}")
    g = grid.grid_struct(**tg)
    assigned = (
        utm.withColumn("trow", grid.point_row(g, F.col("y_t")))
        .withColumn("tcol", grid.point_col(g, F.col("x_t")))
        .filter(grid.in_bounds(g, F.col("trow"), F.col("tcol")))
    )
    out = assigned.groupBy("trow", "tcol").agg(
        F.min_by("value", F.struct("image_id", "prow", "pcol")).alias("value"),
        F.count("*").alias("n_sources"),
    )
    return out.withColumn("grid", g)


def build_resample_index(tiles: DataFrame, target: dict, table) -> dict:
    """KDTree.save analogue (kdtree.py:227-255): persist the
    (image_id, trow, tcol, prow, pcol) nearest-neighbour mapping as a
    TableIO snapshot. Build once, reuse for every raster on the same
    geometry pair — the reference's ``kd_tree=`` reuse
    (raster.py:1220-1226) becomes read + broadcast join."""
    cand = target_candidates(tiles, target).select("image_id", "trow", "tcol", "prow", "pcol")
    return table.write(cand, operation="resample-index",
                       job_id="kdtree", inputs=[str(target)])


def resample_with_index(spark, tiles: DataFrame, table) -> DataFrame:
    """KDTree.resample analogue (kdtree.py:257-325): apply a persisted
    NN index to (possibly different) pixel payloads on the same source
    geometry — an equi-join + O(1) pixel fetch per mapping row."""
    idx = table.read(spark)
    payload = tiles.select("image_id", "bytes", "w", "h", "fmt")
    j = idx.join(payload, "image_id")
    return _with_nearest_value(j).select("image_id", "trow", "tcol", "value")


def _coarse_key(fine_grid: dict, coarse_grid: dict):
    """Fine cell center → containing coarse cell indices: pure SQL
    (banker's-rounded inverse center affine, like every cell lookup)."""
    cg = grid.grid_struct(**coarse_grid)
    fx = fine_grid["x_origin"] + fine_grid["cell_width"] * (F.col("col").cast("double") + 0.5)
    fy = fine_grid["y_origin"] + fine_grid["cell_height"] * (F.col("row").cast("double") + 0.5)
    return grid.point_row(cg, fy).alias("crow"), grid.point_col(cg, fx).alias("ccol")


def bias_correct(coarse: DataFrame, fine: DataFrame,
                 coarse_grid: dict, fine_grid: dict) -> DataFrame:
    """bias_correct.py:7-23 on long-form rasters (row, col, value):

    upsampled  = avg(fine) per coarse cell            (upsampling='average')
    bias       = upsampled − coarse                    (per coarse cell)
    corrected  = fine − bias[coarse cell of fine cell] (downsampling='nearest')

    Everything is SQL: one aggregation + two joins, no Python."""
    crow, ccol = _coarse_key(fine_grid, coarse_grid)
    f = fine.select("row", "col", "value", crow, ccol)
    up = f.groupBy("crow", "ccol").agg(
        (F.sum("value") / F.count("value")).alias("up"))
    bias = up.join(
        coarse.select(F.col("row").alias("crow"), F.col("col").alias("ccol"),
                      F.col("value").alias("vc")),
        ["crow", "ccol"],
    ).select("crow", "ccol", (F.col("up") - F.col("vc")).alias("bias"))
    return (
        f.join(F.broadcast(bias), ["crow", "ccol"])
        .select("row", "col", (F.col("value") - F.col("bias")).alias("value"))
    )


def linear_downscale(coarse: DataFrame, fine: DataFrame,
                     coarse_grid: dict, fine_grid: dict,
                     apply_scale: bool = True, apply_bias: bool = True) -> DataFrame:
    """linear_downscale.py:8-53 on long-form rasters: multiplicative
    scale (zero-guarded: coarse==0→0, upsampled==0→0,
    linear_downscale.py:27-29) then the additive-bias pass, both via
    average-upsample / nearest-downsample."""
    crow, ccol = _coarse_key(fine_grid, coarse_grid)
    f = fine.select("row", "col", "value", crow, ccol)
    c = coarse.select(F.col("row").alias("crow"), F.col("col").alias("ccol"),
                      F.col("value").alias("vc"))
    if apply_scale:
        up = f.groupBy("crow", "ccol").agg((F.sum("value") / F.count("value")).alias("up"))
        scale = up.join(c, ["crow", "ccol"]).select(
            "crow", "ccol",
            F.when(F.col("vc") == 0, 0.0)
            .when(F.col("up") == 0, 0.0)
            .otherwise(F.col("vc") / F.col("up")).alias("scale"),
        )
        f = (
            f.join(F.broadcast(scale), ["crow", "ccol"])
            .select("row", "col", (F.col("value") * F.col("scale")).alias("value"), "crow", "ccol")
        )
    if apply_bias:
        up2 = f.groupBy("crow", "ccol").agg((F.sum("value") / F.count("value")).alias("up"))
        bias = up2.join(c, ["crow", "ccol"]).select(
            "crow", "ccol", (F.col("up") - F.col("vc")).alias("bias"))
        f = (
            f.join(F.broadcast(bias), ["crow", "ccol"])
            .select("row", "col", (F.col("value") - F.col("bias")).alias("value"), "crow", "ccol")
        )
    return f.select("row", "col", "value")
