"""XYZ (slippy-map) pyramid builder — the tiling-engine headline op.

Composites the engine's lon/lat tile table onto the global Web-Mercator
grid at a zoom level and emits standard z/x/y map tiles (256² PNG), the
gdal2tiles/Raster.to_geotiff-pyramid analogue re-expressed as DataFrame
stages:

1. ``pixel_centroids`` explodes source pixels (scan-side, no shuffle);
2. the shared-SQL-text Mercator forward (x = a·λ, y = a·ln tan(π/4+φ/2)
   — same characters fed to Spark and the DuckDB oracle, the CLAUDE.md
   transcendental-parity rule) assigns every pixel to a global mercator
   cell with FLOOR (the XYZ convention, not banker's) — no extent
   collect, the grid is the fixed global pyramid;
3. one hash aggregation per (xtile, ytile[, cell]) — map-side combine;
   the PNG sink groups per tile with applyInPandas and writes
   ``{out}/{z}/{x}/{y}.png`` executor-side (no driver funnel).

At 10^12 source tiles each stage is a scan + one keyed aggregation on
the xyz key — the natural partition key for the sink, and skew (ocean
tiles empty, city tiles hot) is the same salted/AQE story as cell_id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: WGS84 semi-major axis — the Web-Mercator sphere radius
A = 6378137.0

#: atan(sinh(pi)): tiles exist only inside this band
LAT_MAX = 85.05112877980659

TILE_PX = 256


def mercator_sql(lon_expr: str, lat_expr: str) -> tuple[str, str]:
    """Shared-text spherical Mercator forward (Snyder eq. 7-1/7-2 with
    R = a): identical characters for Spark and DuckDB."""
    x = f"({A} * radians({lon_expr}))"
    y = f"({A} * ln(tan(pi() / 4.0 + radians({lat_expr}) / 2.0)))"
    return x, y


def pixel_cell_sql(lon_expr: str, lat_expr: str, z: int) -> tuple[str, str]:
    """Global pyramid pixel-cell assignment at zoom ``z``: the world
    square [−πa, πa]² splits into 2^z·256 cells per axis; FLOOR with an
    edge clamp (the slippy-map convention)."""
    n = TILE_PX * (1 << z)
    ext = f"(2.0 * pi() * {A})"
    mx, my = mercator_sql(lon_expr, lat_expr)
    col = f"least(greatest(cast(floor(({mx} + pi() * {A}) / {ext} * {n}) as bigint), 0), {n - 1})"
    row = f"least(greatest(cast(floor((pi() * {A} - {my}) / {ext} * {n}) as bigint), 0), {n - 1})"
    return row, col


def xyz_pixel_assignment(tiles: DataFrame, z: int) -> DataFrame:
    """Source pixels → (image_id, xtile, ytile, prow256, pcol256, value)
    on the zoom-``z`` pyramid. Pixels outside the Mercator band drop."""
    from rasters_spark.functions.vector import pixel_centroids

    pc = pixel_centroids(tiles).filter(
        (F.col("y") > -LAT_MAX) & (F.col("y") < LAT_MAX))
    row_sql, col_sql = pixel_cell_sql("x", "y", z)
    g = pc.withColumn("grow", F.expr(row_sql)).withColumn("gcol", F.expr(col_sql))
    return g.select(
        "image_id", "value",
        (F.col("gcol") / TILE_PX).cast("long").alias("xtile"),
        (F.col("grow") / TILE_PX).cast("long").alias("ytile"),
        (F.col("grow") % TILE_PX).alias("prow256"),
        (F.col("gcol") % TILE_PX).alias("pcol256"),
    )


def xyz_pyramid_stats(tiles: DataFrame, z: int) -> DataFrame:
    """Per-xyz-tile composite statistics — the oracle-checkable core of
    the pyramid build: (xtile, ytile, n_pixels, vsum) with vsum exact
    over the quarter-integer fixture pixels."""
    px = xyz_pixel_assignment(tiles, z)
    return px.groupBy("xtile", "ytile").agg(
        F.count(F.lit(1)).alias("n_pixels"),
        F.sum("value").alias("vsum"),
    )


def save_xyz_tiles(tiles: DataFrame, z: int, out_dir: str,
                   vmin: float = 0.0, vmax: float = 1000.0) -> DataFrame:
    """Render the pyramid: one 256² grayscale PNG per non-empty xyz
    tile at ``{out_dir}/{z}/{x}/{y}.png``, written executor-side by an
    applyInPandas over the (xtile, ytile) groups. Mean-composites
    colliding pixels; cells with no source pixel are transparent-black
    (0). Returns (xtile, ytile, n_px, n_bytes) per written tile."""
    import pandas as pd
    from pathlib import Path

    from rasters_spark.functions.render import encode_png

    px = xyz_pixel_assignment(tiles, z)
    span = (vmax - vmin) or 1.0

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        xt, yt = int(pdf["xtile"].iloc[0]), int(pdf["ytile"].iloc[0])
        acc = np.zeros((TILE_PX, TILE_PX), np.float64)
        cnt = np.zeros((TILE_PX, TILE_PX), np.int64)
        r = pdf["prow256"].to_numpy(np.int64)
        c = pdf["pcol256"].to_numpy(np.int64)
        v = pdf["value"].to_numpy(np.float64)
        ok = np.isfinite(v)
        np.add.at(acc, (r[ok], c[ok]), v[ok])
        np.add.at(cnt, (r[ok], c[ok]), 1)
        with np.errstate(invalid="ignore"):
            mean = np.where(cnt > 0, acc / np.maximum(cnt, 1), 0.0)
        img = np.clip(np.rint((mean - vmin) / span * 255.0), 0, 255).astype(np.uint8)
        blob = encode_png(img)
        p = Path(out_dir) / str(z) / str(xt)
        p.mkdir(parents=True, exist_ok=True)
        (p / f"{yt}.png").write_bytes(blob)
        return pd.DataFrame({"xtile": [xt], "ytile": [yt],
                             "n_px": [int(ok.sum())], "n_bytes": [len(blob)]})

    return px.groupBy("xtile", "ytile").applyInPandas(
        render, schema="xtile long, ytile long, n_px long, n_bytes long")
