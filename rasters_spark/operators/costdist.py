"""Cost-distance surface — K-round Bellman-Ford relaxation over the
8-neighbor cost graph (the ESRI CostDistance / GDAL proximity-with-
weights operator family; EXTENSION beyond the reference).

Semantics: sources are cells whose cost value is below a threshold;
d(source) = 0; moving between adjacent cells a→b costs
``((cost_a + cost_b) / 2) · dist`` (the standard accumulated-cost
convention, dist 1 cardinal / √2 diagonal); d(c) after K rounds is the
cheapest ≤K-hop path cost (= the true cost distance wherever a
shortest path has ≤K hops — pytest asserts convergence on the
fixtures; production picks K from the expected path diameter or runs
until a convergence probe stabilizes, the flow_accumulation pattern).

Engine shape: ENTIRELY DataFrame ops — the lattice keys come from the
same SQL-replicable row_number ranking the focal family uses, the
per-round step is one equi-join on the skinny (gx, gy) key + a keyed
min + `least`, and unreached cells stay NULL (both Spark and DuckDB
`least`/`min` skip NULLs, so the twin replicates the rounds verbatim).
Float parity: every candidate distance is built by the identical
chain of adds in both engines (same expression text per round), so
mins compare identical doubles."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SQRT2 = math.sqrt(2.0)

#: the 8 neighbor offsets with step lengths
NBRS = [(dy, dx, 1.0 if dy * dx == 0 else SQRT2)
        for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]


def _lattice_cells(tiles: DataFrame, per_row: int = 40) -> DataFrame:
    """(image_id, prow, pcol, gx, gy, cost) for every valid pixel of the
    lattice-ranked tiles — pure DataFrame (pixels_of + the ranking
    window the oracle replicates)."""
    from rasters_spark.operators import rastermath as rm

    rn = F.row_number().over(
        Window.partitionBy("crs", "cell_width", "cell_height", "w", "h")
        .orderBy("image_id")) - 1
    ranked = tiles.withColumn("rn", rn).select(
        "image_id", "w", "h", (F.col("rn") % per_row).alias("tx"),
        F.floor(F.col("rn") / per_row).alias("ty"))
    px = rm.pixels_of(tiles)
    j = px.join(ranked, "image_id")
    return (j.filter(F.col("value").isNotNull() & ~F.isnan("value"))
            .select("image_id", "prow", "pcol",
                    (F.col("tx") * F.col("w") + F.col("pcol")).alias("gx"),
                    (F.col("ty") * F.col("h") + F.col("prow")).alias("gy"),
                    F.col("value").alias("cost")))


def cost_distance(tiles: DataFrame, source_below: float = 8.0,
                  rounds: int = 8, per_row: int = 40) -> DataFrame:
    """≤K-hop accumulated cost distance to the nearest source cell
    (cost < ``source_below``) → (image_id, prow, pcol, gx, gy, d)
    with d NULL where no source is reachable in K hops."""
    cells = _lattice_cells(tiles, per_row).cache()
    e_parts = []
    for dy, dx, dist in NBRS:
        e_parts.append(cells.select(
            (F.col("gx") + dx).alias("gx"), (F.col("gy") + dy).alias("gy"),
            F.col("gx").alias("ngx"), F.col("gy").alias("ngy"),
            F.col("cost").alias("ncost"), F.lit(dist).alias("dist")))
    edges_in = e_parts[0]
    for e in e_parts[1:]:
        edges_in = edges_in.unionByName(e)
    # incoming edges keyed by the DESTINATION cell, weight computed at
    # relaxation time from both endpoint costs (shared expression text)
    edges = (edges_in.join(cells.select("gx", "gy", "cost"), ["gx", "gy"])
             .select("gx", "gy", "ngx", "ngy",
                     (((F.col("ncost") + F.col("cost")) / 2.0)
                      * F.col("dist")).alias("w"))).localCheckpoint()
    d = cells.select(
        "gx", "gy",
        F.when(F.col("cost") < source_below, F.lit(0.0)).alias("d")
    ).localCheckpoint()
    for _ in range(rounds):
        nbr = (edges.join(d.select(F.col("gx").alias("ngx"),
                                   F.col("gy").alias("ngy"),
                                   F.col("d").alias("nd")), ["ngx", "ngy"])
               .filter(F.col("nd").isNotNull())
               .groupBy("gx", "gy")
               .agg(F.min(F.col("nd") + F.col("w")).alias("reach")))
        d = (d.join(nbr, ["gx", "gy"], "left")
             .select("gx", "gy", F.least("d", "reach").alias("d"))
             .localCheckpoint())
    return cells.join(d, ["gx", "gy"]).select(
        "image_id", "prow", "pcol", "gx", "gy", "d")
