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
