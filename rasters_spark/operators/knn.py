"""kNN tile lookup via cell-ring expansion (north-rule operator).

Reference analogue: ``KDTree`` k-neighbour search (kdtree.py:52-202,
``neighbours`` param :76) and ``RasterGeolocation.index_point``
(raster_geolocation.py:130-143). The reference builds an in-memory
cKDTree; here candidate generation is a bounded ring expansion around
the query's cell — an equi-join — followed by a per-query top-k window.

Contract (mirrors the radius-of-influence semantics kdtree.py:168-179):
candidates are all tiles registered in any cell within Chebyshev ring
``R`` of the query point's cell. With cell size ``s`` this guarantees
every tile whose footprint comes within ``R·s`` of the point is
considered; tiles farther than the ring bound may be missed — exactly
the reference's "beyond radius → fill/miss" behavior, with
radius = R·s playing the role of 2.0 × max(cell_size) (kdtree.py:27).

Distance = Euclidean degrees between the query point and the tile
centroid. Ties broken deterministically by image_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rasters_spark import cells, fixtures, grid


def knn_tiles(
    points: DataFrame,
    tiles: DataFrame,
    k: int = 3,
    ring: int = 2,
    level: int = fixtures.CELL_LEVEL,
) -> DataFrame:
    """→ (point_id, image_id, rank, dist): k nearest tiles per point.

    Scale notes: the ring explode multiplies the (small) point side by
    (2R+1)², the tile side is its skinny cell index — the join stays an
    equi-join on cell_id with the same salting/AQE story as the
    flagship. Points with fewer than k candidates return what exists
    (reference: fill_value for misses, kdtree.py:300-310).
    """
    # Ring expansion rides the STREAMED tile index, not the broadcast:
    # point p (cell c) matches tile t iff some footprint cell of t is
    # within Chebyshev R of c ⟺ c lies in the union of R-rings around
    # t's footprint cells — the same candidate set either way (dups
    # collapse in collect_set below). Exploding the big side is a
    # parallel map over the scan; exploding the point side ×(2R+1)²
    # before F.broadcast made the serial driver collect 25× fatter.
    # (the tile CENTROID is flattened to two doubles BEFORE any explode —
    # nested grid-field extraction through stacked Generate nodes trips
    # Spark's INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND schema-pruning bug, and
    # two doubles are narrower than the grid struct anyway)
    g = F.col("grid")
    flat = tiles.select(
        "image_id",
        (g["x_origin"] + g["cell_width"] * g["cols"].cast("double") / 2.0).alias("_cx"),
        (g["y_origin"] + g["cell_height"] * g["rows"].cast("double") / 2.0).alias("_cy"),
        *(["cell_id"] if "cell_id" in tiles.columns else ["bbox"]),
    )
    if "cell_id" not in tiles.columns:
        # round-6: one explode of the DISTINCT ring union per tile
        # (padded bbox rectangle, cells.ring_cells_bbox) instead of
        # cells explode × per-cell ring explode — the same candidate
        # set with ~40% fewer generated rows and no duplicate
        # (point, tile) pairs (measured 1.57M → 0.9M ring rows,
        # 2.7M → 1.6M join candidates at sf0.1)
        index = flat.select(
            "image_id", "_cx", "_cy",
            F.explode(cells.ring_cells_bbox(F.col("bbox"), level, ring)).alias("cell_id"),
        )
    else:
        index = flat.select(
            "image_id", "_cx", "_cy",
            F.explode(cells.ring_cells(F.col("cell_id"), level, ring)).alias("cell_id"),
        )
    pts = points.select(
        "point_id", "x", "y",
        cells.cell_id(F.col("x"), F.col("y"), level).alias("cell_id"),
    )
    dx = F.col("_cx") - F.col("x")
    dy = F.col("_cy") - F.col("y")
    j = (
        index.join(F.broadcast(pts), "cell_id")
        # dx*dx, not pow(dx,2): plain multiplication is bit-identical across
        # engines (numpy / DuckDB oracle), libm pow is not guaranteed to be
        .withColumn("dist", F.sqrt(dx * dx + dy * dy))
    )
    # ONE hash aggregation does dedup + top-k: a tile seen via several
    # ring cells collapses in collect_set (identical (dist, image_id)
    # structs), array_sort gives the (dist asc, image_id asc) total
    # order, slice keeps k. One exchange with map-side partial combine —
    # vs the former dropDuplicates + window pair (two exchanges + a full
    # per-partition sort). Per-point candidate sets are ring-bounded
    # ((2R+1)² cells × tiles/cell), so the collected arrays stay small.
    top = j.groupBy("point_id").agg(
        F.slice(
            F.array_sort(F.collect_set(F.struct(
                F.col("dist").alias("dist"), F.col("image_id").alias("image_id")))),
            1, k,
        ).alias("top"))
    return top.select(
        "point_id", F.posexplode("top").alias("pos", "t")
    ).select(
        "point_id", F.col("t")["image_id"].alias("image_id"),
        (F.col("pos") + 1).alias("rank"), F.col("t")["dist"].alias("dist"),
    )
