"""Round-6 optimization harness — per-query isolation + plan capture.

NOT the driver bench (bench.py is frozen): this file exists so that
optimization evidence (noop-sink timings, explain("formatted") captures)
can be produced without touching the measured harness
(spark_optimization_guide.md §1.1/§1.4/§7.2).

Usage:
    python bench_extra.py [query ...]          # time + capture plans
    SPARK_GRAFT_PLANS=plans/r06 SPARK_GRAFT_PLAN_TAG=before python bench_extra.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_queries(spark, sf_dir):
    from pyspark.sql import functions as F

    from rasters_spark.operators import point_join, sample, stats
    from rasters_spark.tiles import load_points, load_tiles, tiles_with_cells
    import __spark_entry__ as e

    idw_pts = load_points(spark, sf_dir).filter(F.col("point_id") < 10000)
    return {
        "tile_cell_assignment": lambda: tiles_with_cells(load_tiles(spark, sf_dir)).select("image_id", "cell_id"),
        "point_sample_join": lambda: e.q_point_sample_join(spark, sf_dir),
        "tile_stats": lambda: stats.tile_stats(load_tiles(spark, sf_dir)),
        "tile_windows_for_polygons": lambda: e.q_tile_windows_for_polygons(spark, sf_dir),
        "knn_tiles": lambda: e.q_knn_tiles(spark, sf_dir),
        "merge_mean": lambda: e.q_merge_mean(spark, sf_dir),
        "to_grid_bilinear": lambda: e.q_to_grid_bilinear(spark, sf_dir),
        "to_grid_med": lambda: e.q_to_grid_med(spark, sf_dir),
        "phash_near_dups": lambda: e.q_phash_near_dups(spark, sf_dir),
        "point_sample_join_grouped": lambda: sample.sample_nearest_grouped(
            point_join.point_in_tile_join(
                load_points(spark, sf_dir), load_tiles(spark, sf_dir), payload_cols=()),
            load_tiles(spark, sf_dir)).select("point_id", "image_id", "value"),
        "point_sample_idw": lambda: sample.sample_idw(
            point_join.point_in_tile_join(idw_pts, load_tiles(spark, sf_dir))
            .select("point_id", "image_id", "x", "y"),
            tiles=load_tiles(spark, sf_dir))
        .select("point_id", "image_id", "value"),
    }


def main():
    from rasters_spark import fixtures, get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    plans_dir = os.environ.get("SPARK_GRAFT_PLANS", "")
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "before")
    fixtures.ensure_fixtures(sf_dir)
    spark = get_spark("bench_extra")
    qs = build_queries(spark, sf_dir)
    names = sys.argv[1:] or list(qs)
    out = {}
    for name in names:
        df = qs[name]()
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(name)
        samples = []
        for i in range(repeats + 1):
            t0 = time.time()
            qs[name]().write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"cold": samples[0], "warm_min": min(samples[1:]), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {k: v["warm_min"] for k, v in out.items()},
                      "total_warm": round(sum(v["warm_min"] for v in out.values()), 3)}))


if __name__ == "__main__":
    main()
