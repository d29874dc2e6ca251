"""Deterministic dataset splitting and sampling for training pipelines.

The two operations every large-scale training-data build needs before
a single shard is written:

- **Spatially-blocked train/val split** — assigning raw rows to splits
  by ``rand()`` leaks spatial signal (a val tile's neighbours train on
  nearly identical pixels: neighbouring tiles of one scene are
  near-duplicates by construction). The standard remedy is *block*
  holdout (spatial cross-validation, Roberts et al. 2017, Ecography
  40:913): hash a COARSE spatial block id, not the row, so every tile
  of a block lands in the same split and the train/val boundary always
  falls on block edges.
- **Deterministic sampling** — ``df.sample()`` draws a new subset
  every run (seed plumbing through AQE retries is fragile at best) and
  cannot be reproduced by another engine. Hash-threshold sampling
  (keep iff md5(key)/2⁶⁰ < frac) is exactly reproducible anywhere md5
  exists, stable under retries/partitioning, and composable (a 1%
  sample is a subset of the 10% sample with the same salt).

Every operator is a scan-side projection or one keyed window — no
joins, no collects; at 10¹² rows each is a single map (or one
exchange for the per-cell cap), and the md5 arithmetic is the
`simhash_md5` cross-engine pattern (Spark ``conv(substr(md5,1,15))``
≡ DuckDB ``('0x'||substr(md5,1,15))::bigint`` — 60 bits, exact in
int64 and in the double division below).

Reference parity: the reference toolkit has no splitter (it is a
single-scene library); these follow its grid semantics — blocks are
aligned to the same lat/lon lattice as ``RasterGrid`` origins
(raster_grid.py:118-170 cell edges), so a block boundary is always a
tile boundary for lattice-aligned tiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 2^60 — the md5-prefix hash range; exact as a double
HASH_SPAN = float(1 << 60)


def _hash60(col) -> F.Column:
    """First 60 bits of md5 as a non-negative int64 — bit-identical in
    DuckDB as ``cast(('0x' || substr(md5(col), 1, 15)) as bigint)``."""
    return F.conv(F.substring(F.md5(F.encode(col, "utf-8")), 1, 15), 16, 10).cast("long")


def spatial_split(tiles: DataFrame, holdout_frac: float = 0.2,
                  salt: str = "v1", block_deg: float = 1.0,
                  x: str = "x_origin", y: str = "y_origin") -> DataFrame:
    """Blocked spatial train/val split: tiles whose origin falls in the
    same ``block_deg``-degree lat/lon block always share a split, and a
    block goes to ``val`` iff md5(block‖salt)/2⁶⁰ < holdout_frac.

    Properties that matter at 10¹² rows:
    - map-only (one projection, no exchange, no rand());
    - re-runs, retries, and other engines reproduce it bit-for-bit;
    - changing ``salt`` re-rolls the entire split; changing
      ``holdout_frac`` upward only MOVES blocks train→val (monotone:
      the 10% holdout contains the 5% holdout) — so a split can be
      widened without churning previously assigned blocks;
    - no spatial leakage: the val boundary is a block edge, and
      ``block_deg`` should exceed the tile footprint plus any focal /
      halo radius used in feature generation.
    """
    bx = F.floor(F.col(x) / block_deg).cast("long")
    by = F.floor(F.col(y) / block_deg).cast("long")
    block = F.concat_ws("_", bx.cast("string"), by.cast("string"), F.lit(salt))
    frac = _hash60(block) / F.lit(HASH_SPAN)
    return (tiles
            .withColumn("block_x", bx)
            .withColumn("block_y", by)
            .withColumn("split",
                        F.when(frac < F.lit(float(holdout_frac)), F.lit("val"))
                        .otherwise(F.lit("train"))))


def hash_sample(df: DataFrame, frac: float, key: str = "image_id",
                salt: str = "v1") -> DataFrame:
    """Deterministic ``frac``-sample: keep a row iff
    md5(key‖salt)/2⁶⁰ < frac. Map-only, reproducible, nested
    (samples with the same salt are subsets of larger ones)."""
    h = _hash60(F.concat_ws("|", F.col(key).cast("string"), F.lit(salt)))
    return df.where(h / F.lit(HASH_SPAN) < F.lit(float(frac)))


def cap_per_group(df: DataFrame, group_cols, n: int,
                  key: str = "image_id", salt: str = "v1") -> DataFrame:
    """Keep at most ``n`` rows per group, chosen deterministically: the
    n smallest md5(key‖salt) values, ties broken by the key itself
    (total order — the CLAUDE.md top-k rule). The balanced-sampling
    primitive: capping rows per spatial cell flattens the extreme
    spatial skew of web-scraped imagery (cities are 10⁴× denser than
    ocean) before training-shard writes. One hash-partitioned window
    per group key — the single exchange is on the GROUP key, and the
    hot-key ceiling is ``n`` retained rows per group, so output skew is
    capped by construction."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    h = _hash60(F.concat_ws("|", F.col(key).cast("string"), F.lit(salt)))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(key).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= n).drop("_rk"))
