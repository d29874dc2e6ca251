"""Neighbourhood / frame operators (SURVEY §2.5) — pure SQL.

- row/col neighbour distances on swath tables via lag windows
  (reference: scipy.ndimage.shift + norm, raster_geometry.py:647-664);
- swath cell-size statistic = min of the median row/col neighbour
  distances (raster_geolocation.py:246-247);
- boundary ring walk of a grid: top→right→bottom→left ordered edge
  pixels (raster_geometry.py:165-211) as a closed-form HOF array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def neighbour_distances(swath: DataFrame) -> DataFrame:
    """Per-pixel distance to the previous-row and previous-col neighbour
    → (swath_id, row, col, row_dist, col_dist). NULL on the first
    row/col (the reference's shifted arrays leave NaN edges)."""
    wr = Window.partitionBy("swath_id", "col").orderBy("row")
    wc = Window.partitionBy("swath_id", "row").orderBy("col")

    def dist(win):
        dx = F.col("x") - F.lag("x").over(win)
        dy = F.col("y") - F.lag("y").over(win)
        return F.sqrt(dx * dx + dy * dy)

    return swath.select(
        "swath_id", "row", "col",
        dist(wr).alias("row_dist"),
        dist(wc).alias("col_dist"),
    )


def swath_cell_size(swath: DataFrame) -> DataFrame:
    """min(median(row_dist), median(col_dist)) per swath — the
    reference's swath cell-size statistic. Uses exact percentile
    (`median`) so the DuckDB oracle can reproduce it bit-for-bit."""
    d = neighbour_distances(swath)
    return d.groupBy("swath_id").agg(
        F.least(
            F.expr("median(row_dist)"), F.expr("median(col_dist)")
        ).alias("cell_size")
    )


def boundary_ring(grid_col: Column) -> Column:
    """Ordered edge-pixel walk of a grid → array<struct<row:int,col:int>>:
    top row L→R, right col T→B (skip corner), bottom row R→L (skip
    corner), left col B→T (skip both corners). Closed-form SQL; length
    = 2(rows+cols)−4 for rows,cols ≥ 2."""
    rows = grid_col["rows"].cast("int")
    cols = grid_col["cols"].cast("int")

    def pt(r, c):
        return F.struct(r.cast("int").alias("row"), c.cast("int").alias("col"))

    top = F.transform(F.sequence(F.lit(0), cols - 1), lambda c: pt(F.lit(0), c))
    right = F.when(rows > 1,
                   F.transform(F.sequence(F.lit(1), rows - 1), lambda r: pt(r, cols - 1))
                   ).otherwise(F.array())
    bottom = F.when((rows > 1) & (cols > 1),
                    F.transform(F.sequence(cols - 2, F.lit(0), F.lit(-1)), lambda c: pt(rows - 1, c))
                    ).otherwise(F.array())
    left = F.when((rows > 2) & (cols > 1),
                  F.transform(F.sequence(rows - 2, F.lit(1), F.lit(-1)), lambda r: pt(r, F.lit(0)))
                  ).otherwise(F.array())
    return F.concat(top, right, bottom, left)
