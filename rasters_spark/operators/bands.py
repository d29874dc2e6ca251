"""MultiRaster band operators — the band dimension as a column.

The reference's MultiRaster is a (bands, rows, cols) stacked array
(multi_raster.py:21-76: stack at :100-105, band extract at :107-111).
Relational form (SURVEY §1.1): one row per band with ``band:int`` and
``stack_id`` columns — stacking is a column derivation, band extraction
is a filter, per-band math is a groupBy. No data movement for any of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rasters_spark.operators import stats


def with_bands(tiles: DataFrame, n_bands: int = 3) -> DataFrame:
    """Interpret consecutive tile indices as bands of a stack:
    band = i mod n, stack_id = i div n (deterministic from image_id)."""
    i = F.substring("image_id", 4, 12).cast("long")
    return tiles.withColumn("band", (i % n_bands).cast("int")).withColumn(
        "stack_id", (i / n_bands).cast("long")
    )


def extract_band(stacked: DataFrame, band: int) -> DataFrame:
    """MultiRaster.__getitem__ band extraction (multi_raster.py:107-111)."""
    return stacked.filter(F.col("band") == band)


def band_resize(stacked: DataFrame, out_w: int, out_h: int, order: int = 1) -> DataFrame:
    """MultiRaster.resize (multi_raster.py:290-295): per-band resize of
    the stack. Relationally the band loop is free — each band IS a row,
    so this is resize_spline with the band/stack tags re-attached
    (one Arrow pass, no shuffle)."""
    from rasters_spark.datapipe.multimodal import resize_spline

    out = resize_spline(stacked, out_w, out_h, order)
    return out.join(stacked.select("image_id", "band", "stack_id"), "image_id")


def band_percentilecut(stacked: DataFrame, lower_percentile: float = 2.0,
                       upper_percentile: float = 98.0) -> DataFrame:
    """MultiRaster.generate_percentilecut (multi_raster.py:283-288):
    per-band percentile stretch — the reference stretches each band by
    its OWN per-raster percentiles, which here is the per-tile
    percentilecut kernel with the band tag carried through."""
    from rasters_spark.operators import rastermath as rm

    out = rm.elementwise(stacked, rm.percentilecut(lower_percentile, upper_percentile))
    return out.join(stacked.select("image_id", "band", "stack_id"), "image_id")


def band_stats(stacked: DataFrame) -> DataFrame:
    """Per-band reduction across the stack dimension — per-tile Arrow
    partials, band-level SQL finals → (band, n_tiles, n_valid, vsum,
    vmin, vmax)."""
    per_tile = stats.tile_stats(stacked.select("image_id", "bytes", "w", "h", "fmt"))
    joined = per_tile.join(stacked.select("image_id", "band"), "image_id")
    return joined.groupBy("band").agg(
        F.count("*").alias("n_tiles"),
        F.sum("n_valid").alias("n_valid"),
        F.sum("vsum").alias("vsum"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )


def stack_by_rank(tiles: DataFrame, n_bands: int = 4) -> DataFrame:
    """Stack same-shaped tiles into n-band groups by rank order:
    band = rank mod n, stack_id = rank div n, ranked per (w, h) layout
    by image_id. The row_number window is fixture-only plumbing (the
    same caveat as focal.lattice_remap — real stacks carry their own
    band/stack ids); it is SQL-replicable verbatim in the oracle."""
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("w", "h").orderBy("image_id")) - 1
    return (tiles.withColumn("rn", rn)
            .withColumn("band", (F.col("rn") % n_bands).cast("int"))
            .withColumn("stack_id", (F.col("rn") / n_bands).cast("long"))
            .drop("rn"))


def pansharpen_brovey(stacked: DataFrame) -> DataFrame:
    """Brovey pansharpening (Gillespie et al. 1987; the GDAL
    gdal_pansharpen 'brovey' algorithm — EXTENSION beyond the
    reference): bands 0-2 are the multispectral triple, band 3 the
    co-registered pan; per pixel valid in ALL FOUR bands,
    ``sharp_b = (ms_b · pan) / (ms_0 + ms_1 + ms_2)``, NaN where the
    MS sum is 0 (exact test). In the real pipeline the MS upsample to
    the pan grid runs through the certified resize/to_grid operators
    first — this operator is the ratio math at the shared grid.

    → (stack_id, band, prow, pcol, sharp). The sum is exact dyadic
    (quarter-integer pixels), the product and the single division are
    correctly-rounded with the expression text shared verbatim with
    the SQL twin, so doubles hash bit-identically. Scale shape: ONE
    cogroup of 4 bounded rows per stack (never a data-sized
    collect_list), then a map-only Arrow kernel."""
    import numpy as np
    import pandas as pd

    from rasters_spark import codec

    src = stacked.select("stack_id", "band", "bytes", "w", "h", "fmt")
    schema = "stack_id long, band int, prow int, pcol int, sharp double"

    def fn(key, pdf):
        if len(pdf) != 4:
            return pd.DataFrame({"stack_id": pd.Series([], dtype=np.int64),
                                 "band": pd.Series([], dtype=np.int32),
                                 "prow": pd.Series([], dtype=np.int32),
                                 "pcol": pd.Series([], dtype=np.int32),
                                 "sharp": pd.Series([], dtype=float)})
        pdf = pdf.sort_values("band")
        arrs = [codec.decode_tile(r.bytes, r.w, r.h, r.fmt).astype(np.float64)
                for r in pdf.itertuples(index=False)]
        b0, b1, b2, p = arrs
        s = (b0 + b1) + b2
        ok = np.isfinite(b0) & np.isfinite(b1) & np.isfinite(b2) & np.isfinite(p)
        rows, cols = np.nonzero(ok)
        frames = []
        with np.errstate(invalid="ignore", divide="ignore"):
            for band, b in enumerate((b0, b1, b2)):
                sharp = np.where(s == 0.0, np.nan, (b * p) / s)
                frames.append(pd.DataFrame({
                    "stack_id": key[0],
                    "band": np.int32(band),
                    "prow": rows.astype(np.int32),
                    "pcol": cols.astype(np.int32),
                    "sharp": sharp[rows, cols]}))
        return pd.concat(frames, ignore_index=True)

    return src.groupBy("stack_id").applyInPandas(fn, schema=schema)


def gap_fill_stack(stacked: DataFrame, n_epochs: int = 3) -> DataFrame:
    """Per-pixel temporal FORWARD-FILL across an epoch stack (cloud-gap
    filling / compositing prep — the LOCF time-series operator;
    EXTENSION beyond the reference): ``band`` is the epoch index; a
    pixel invalid at epoch e takes its most recent valid value from an
    earlier epoch, staying absent until its first valid observation.
    → (stack_id, epoch, prow, pcol, filled) for filled pixels.

    No float math — outputs are exact copies of input pixels, so the
    twin is DuckDB's ``last_value(v IGNORE NULLS)`` ordered window
    verbatim. Scale shape: ONE cogroup of n_epochs bounded rows per
    stack (same shape as pansharpen_brovey), map-only kernel; the SQL
    window form the oracle uses would shuffle every PIXEL row — the
    cogroup ships tiles instead, ~100× fewer rows across the exchange."""
    import numpy as np
    import pandas as pd

    from rasters_spark import codec

    src = stacked.select("stack_id", "band", "bytes", "w", "h", "fmt")
    schema = "stack_id long, epoch int, prow int, pcol int, filled double"

    def fn(key, pdf):
        empty = pd.DataFrame({"stack_id": pd.Series([], dtype=np.int64),
                              "epoch": pd.Series([], dtype=np.int32),
                              "prow": pd.Series([], dtype=np.int32),
                              "pcol": pd.Series([], dtype=np.int32),
                              "filled": pd.Series([], dtype=float)})
        if len(pdf) != n_epochs:
            return empty
        pdf = pdf.sort_values("band")
        frames = []
        last = None
        for r in pdf.itertuples(index=False):
            cur = codec.decode_tile(r.bytes, r.w, r.h, r.fmt).astype(np.float64)
            last = cur if last is None else np.where(np.isfinite(cur), cur, last)
            rows, cols = np.nonzero(np.isfinite(last))
            if rows.size == 0:
                continue
            frames.append(pd.DataFrame({
                "stack_id": key[0],
                "epoch": np.int32(r.band),
                "prow": rows.astype(np.int32),
                "pcol": cols.astype(np.int32),
                "filled": last[rows, cols]}))
        return pd.concat(frames, ignore_index=True) if frames else empty

    return src.groupBy("stack_id").applyInPandas(fn, schema=schema)


def epoch_trend(stacked: DataFrame, n_epochs: int = 3) -> DataFrame:
    """Per-pixel linear trend across an equally-spaced epoch stack —
    the change-detection OLS slope (EXTENSION beyond the reference).
    For 3 epochs at t = 0,1,2 the least-squares slope collapses to
    ``(v2 − v0) / 2`` (EXACT dyadic on quarter-integer pixels) and the
    fitted mean is ``((v0 + v1) + v2) / 3`` (one correctly-rounded
    division, expression text shared with the SQL twin). Pixels must
    be valid in ALL epochs (strict window — the gap_fill operator is
    the imputation step if you want slopes over gappy stacks).
    → (stack_id, prow, pcol, slope, mean). Same bounded cogroup shape
    as pansharpen_brovey."""
    import numpy as np
    import pandas as pd

    from rasters_spark import codec

    if n_epochs != 3:
        raise ValueError("epoch_trend currently implements the 3-epoch "
                         "closed form (t = 0,1,2)")
    src = stacked.select("stack_id", "band", "bytes", "w", "h", "fmt")
    schema = "stack_id long, prow int, pcol int, slope double, mean double"

    def fn(key, pdf):
        empty = pd.DataFrame({"stack_id": pd.Series([], dtype=np.int64),
                              "prow": pd.Series([], dtype=np.int32),
                              "pcol": pd.Series([], dtype=np.int32),
                              "slope": pd.Series([], dtype=float),
                              "mean": pd.Series([], dtype=float)})
        if len(pdf) != 3:
            return empty
        pdf = pdf.sort_values("band")
        v0, v1, v2 = [codec.decode_tile(r.bytes, r.w, r.h, r.fmt).astype(np.float64)
                      for r in pdf.itertuples(index=False)]
        ok = np.isfinite(v0) & np.isfinite(v1) & np.isfinite(v2)
        rows, cols = np.nonzero(ok)
        if rows.size == 0:
            return empty
        slope = (v2 - v0) / 2.0
        mean = ((v0 + v1) + v2) / 3.0
        return pd.DataFrame({
            "stack_id": key[0],
            "prow": rows.astype(np.int32),
            "pcol": cols.astype(np.int32),
            "slope": slope[rows, cols],
            "mean": mean[rows, cols]})

    return src.groupBy("stack_id").applyInPandas(fn, schema=schema)


def to_gray(stacked: DataFrame) -> DataFrame:
    """Rec.601 luma band collapse (ITU-R BT.601: the standard RGB→gray
    weights; EXTENSION beyond the reference): bands 0/1/2 as R/G/B,
    gray = (0.299·r + 0.587·g) + 0.114·b per pixel valid in ALL three
    bands — the expression order is shared verbatim with the SQL twin
    (each product and the two adds correctly rounded on identical
    inputs → raw doubles hash bit-identically).
    → (stack_id, prow, pcol, gray). Same bounded 3-row cogroup as
    epoch_trend."""
    import numpy as np
    import pandas as pd

    from rasters_spark import codec

    src = stacked.select("stack_id", "band", "bytes", "w", "h", "fmt")
    schema = "stack_id long, prow int, pcol int, gray double"

    def fn(key, pdf):
        empty = pd.DataFrame({"stack_id": pd.Series([], dtype=np.int64),
                              "prow": pd.Series([], dtype=np.int32),
                              "pcol": pd.Series([], dtype=np.int32),
                              "gray": pd.Series([], dtype=float)})
        if len(pdf) != 3:
            return empty
        pdf = pdf.sort_values("band")
        r, g, b = [codec.decode_tile(t.bytes, t.w, t.h, t.fmt).astype(np.float64)
                   for t in pdf.itertuples(index=False)]
        ok = np.isfinite(r) & np.isfinite(g) & np.isfinite(b)
        rows, cols = np.nonzero(ok)
        if rows.size == 0:
            return empty
        gray = (0.299 * r + 0.587 * g) + 0.114 * b
        return pd.DataFrame({
            "stack_id": key[0],
            "prow": rows.astype(np.int32),
            "pcol": cols.astype(np.int32),
            "gray": gray[rows, cols]})

    return src.groupBy("stack_id").applyInPandas(fn, schema=schema)
