"""The scaling-efficiency workload — launched via spark-submit --py-files.

Runs the flagship spatial-join + tiling pipeline against a fixed input
and prints one JSON line with per-stage walls and tiles/sec. The
master comes from spark-submit (--master local[N]); the same script on
a real cluster takes --master yarn/k8s unchanged.

Workload = the six pipeline stages that dominate production use:
cell registration (tiling), point-in-tile join + nearest sampling,
IDW sampling, kNN tile lookup, full decode + per-tile stats, fused
raster algebra. A warmup pass
spins up the Python worker pool so the timed numbers measure compute,
not process forks.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from rasters_spark import fixtures
    from rasters_spark.session import get_spark
    from rasters_spark.operators import point_join, sample, stats
    from rasters_spark.operators import rastermath as rm
    from rasters_spark.tiles import load_points, load_tiles, tiles_with_cells
    from bench import force

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
    idw_points = int(os.environ.get("SPARK_GRAFT_SCALING_IDW_POINTS", "100000"))
    fixtures.ensure_fixtures(sf_dir)
    spark = get_spark("scaling_job", master="inherit")
    sc = spark.sparkContext

    tiles = load_tiles(spark, sf_dir)
    n_tiles = tiles.count()

    # warmup: one FULL flagship pass (not a limit() slice — measured at
    # local[32], limit-bounded warmups leave most of the worker pool
    # cold and the first 1-2 timed runs 2-3× over steady state, which
    # biased the wide-master side of the efficiency pair low) plus one
    # Arrow-stats pass; pages the parquet inputs too
    force(stats.tile_stats(tiles))
    force(sample.sample_nearest_grouped(
        point_join.point_in_tile_join(load_points(spark, sf_dir), tiles, payload_cols=()),
        tiles).select("point_id", "image_id", "value"))

    timings: dict[str, float] = {}

    def timed(name, thunk):
        per = []
        for _ in range(repeats):
            t0 = time.time()
            thunk()
            per.append(round(time.time() - t0, 3))
        print(f"REPEATS {name} {per}", file=sys.stderr)
        timings[name] = round(min(per), 3)  # min = least-noise estimate

    pts = load_points(spark, sf_dir)
    timed("tile_cell_assignment",
          lambda: force(tiles_with_cells(tiles).select("image_id", "cell_id")))
    # HUGE point side (this workload: 10^6 points) → the grouped-fetch
    # strategy: the default matched-pair broadcast anti-scales here (its
    # driver-serial broadcast build measured 2→8 eff 0.47 at 1M points;
    # grouped restores 0.84 and is faster at every width). Both paths
    # are oracle-certified equal (point_sample_join[_grouped] contract
    # entries); the broadcast form stays optimal for small point sets.
    timed("point_sample_join",
          lambda: force(sample.sample_nearest_grouped(
              point_join.point_in_tile_join(pts, tiles, payload_cols=()),
              tiles).select("point_id", "image_id", "value")))
    # IDW is the compute-heavy sampling path (float rasters dispatch to it
    # in the reference): full per-tile weighted aggregation per matched pair
    idw_pts = pts.filter(F.col("point_id") < idw_points)
    timed("point_sample_idw",
          lambda: force(sample.sample_idw(
              point_join.point_in_tile_join(idw_pts, tiles)
              .select("point_id", "image_id", "x", "y"),
              tiles=tiles).select("point_id", "image_id", "value")))
    # kNN via cell-ring expansion — the north-rule lookup operator (r3
    # replan: ring-explode on the streamed tile index, one-row-per-point
    # broadcast, fused single-agg top-k)
    from rasters_spark.operators import knn

    knn_pts = pts.filter(F.col("point_id") < idw_points)
    timed("knn_tiles", lambda: force(knn.knn_tiles(knn_pts, tiles, k=3, ring=2)))
    timed("tile_stats", lambda: force(stats.tile_stats(tiles)))
    timed("raster_algebra",
          lambda: force(stats.tile_stats(rm.elementwise(tiles, rm.compose(
              rm.mul(2.0), rm.add(10.0), rm.clip(0.0, 1500.0),
              rm.where(rm.gt(700.0), rm.mul(1.5), rm.mul(0.5)),
              rm.percentilecut(2.0, 98.0), rm.minmaxstretch(), rm.fill(0.0))))))

    total = round(sum(timings.values()), 3)
    print("SCALING_RESULT " + json.dumps({
        "master": sc.master,
        "n_tiles": n_tiles,
        "queries": timings,
        "total_sec": total,
        "tiles_per_sec": round(n_tiles * 6 / total, 1),  # 6 pipeline stages over the table
        "repeats": repeats,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
