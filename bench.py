"""Benchmark harness — one JSON line for the driver.

Headline: the flagship spatial-join + tiling pipeline at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1 → 20k tiles / 50k
points fixtures) on local[$SPARK_GRAFT_CPUS]. The primary BASELINE.json
metric (tiles/sec) is emitted as ``tiles_per_sec``.

Scaling-efficiency evidence (north rule: ≥0.8 between N and 4N) is
produced by ``tools/bench_scaling.py`` (two fresh JVMs at local[8] /
local[32]) and recorded in BENCH.md — not here, to keep the per-round
driver run cheap.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> int:
    """Fully materialize a DataFrame without driver collect."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def host_canary() -> float:
    """Absolute host-speed canary: seconds for a FIXED single-threaded
    numpy workload (deterministic, ~1-2 s on an idle core). The
    tools/host_probe.py scaling probe catches RELATIVE multi-core
    contention but is blind to absolute slowdowns of the whole VM;
    stamping the same fixed workload into every round's JSON lets
    cross-round wall-time comparisons be discounted when the canary
    differs (BENCH.md 'Measurement variance': same-workload walls have
    swung ±77% across same-day windows with the scaling probe at 1.0)."""
    import time as _t

    import numpy as _np
    # ufunc-only: numpy ufuncs run single-threaded (BLAS matmul would
    # measure thread-pool config, not host speed)
    a = _np.random.default_rng(0).random(4_000_000)
    for _ in range(3):                      # untimed: page-fault warmup
        a = _np.tanh(a * 1.0001 + 0.1)
    best = None
    for _ in range(3):                      # min-of-3 timed passes
        t0 = _t.time()
        b = a
        for _ in range(25):
            b = _np.tanh(b * 1.0001 + 0.1)
        dt = _t.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def run(sf_dir: str, master: str | None = None, app: str = "bench") -> dict:
    from pyspark.sql import functions as F

    from rasters_spark import fixtures, get_spark
    from rasters_spark.operators import point_join, sample, stats
    from rasters_spark.tiles import load_points, load_polygons, load_tiles, tiles_with_cells
    import __spark_entry__ as e

    fixtures.ensure_fixtures(sf_dir)
    canary_pre = host_canary()
    spark = get_spark(app, master=master)
    timings: dict[str, float] = {}
    timings_cold: dict[str, float] = {}

    # DUAL protocol (VERDICT r03 #8 — cross-round comparability without
    # the BENCH.md caveat): every stage runs 1 + repeats times.
    #   pass 0  = COLD — first-ever execution, exactly the r1/r2 single
    #             -shot protocol (the first stage's pass 0 also pays the
    #             one-time Python-worker pool startup, as r1/r2 did);
    #   passes 1..repeats = WARM — min is the steady-state cost, the
    #             honest 100-TB number (workers warm for all but the
    #             first task wave of a long cluster job).
    # min-of-N because this sandbox is a shared-host VM and single runs
    # see ±20-30% host-contention noise (BENCH.md).
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))

    def timed(name, thunk):
        warm = None
        for i in range(repeats + 1):
            t0 = time.time()
            thunk()
            dt = time.time() - t0
            if i == 0:
                timings_cold[name] = round(dt, 3)
            else:
                warm = dt if warm is None else min(warm, dt)
        timings[name] = round(warm, 3)

    tiles = load_tiles(spark, sf_dir)
    n_tiles = tiles.count()

    # q1: cell registration (tiling) — explode footprints into cell index
    timed("tile_cell_assignment", lambda: force(tiles_with_cells(load_tiles(spark, sf_dir)).select("image_id", "cell_id")))
    # q2: flagship spatial join + nearest sampling
    timed("point_sample_join", lambda: force(e.q_point_sample_join(spark, sf_dir)))
    # q3: decode + per-tile stats (Arrow throughput)
    timed("tile_stats", lambda: force(stats.tile_stats(load_tiles(spark, sf_dir))))
    # q4: window join vs polygon table
    timed("tile_windows_for_polygons", lambda: force(e.q_tile_windows_for_polygons(spark, sf_dir)))
    # q5: kNN via cell-ring expansion
    timed("knn_tiles", lambda: force(e.q_knn_tiles(spark, sf_dir)))
    # q6: mean-composite resample onto the 0.25° grid
    timed("merge_mean", lambda: force(e.q_merge_mean(spark, sf_dir)))
    # q7: bilinear warp — JVM-sliced taps + SQL blend (must stay within
    # ~2× of the nearest-path composites, VERDICT r01 #2)
    timed("to_grid_bilinear", lambda: force(e.q_to_grid_bilinear(spark, sf_dir)))
    # q8: aggregation-kernel warp (per-tile segment stats, no shuffle)
    timed("to_grid_med", lambda: force(e.q_to_grid_med(spark, sf_dir)))
    # q9: banded image near-dup over the full tile set
    timed("phash_near_dups", lambda: force(e.q_phash_near_dups(spark, sf_dir)))
    # q10: IDW sampling — per-tile cogrouped decode (blob crosses the
    # shuffle once per tile, r03 replan); 10k-point slice keeps the
    # stage comparable across rounds
    # q2b: the production huge-point-side strategy (round-4 replan) —
    # tracked beside the broadcast form so regressions in either
    # strategy show up in the per-round JSON
    timed("point_sample_join_grouped", lambda: force(
        sample.sample_nearest_grouped(
            point_join.point_in_tile_join(
                load_points(spark, sf_dir), load_tiles(spark, sf_dir), payload_cols=()),
            load_tiles(spark, sf_dir)).select("point_id", "image_id", "value")))
    idw_pts = load_points(spark, sf_dir).filter(F.col("point_id") < 10000)
    timed("point_sample_idw", lambda: force(
        sample.sample_idw(
            point_join.point_in_tile_join(idw_pts, load_tiles(spark, sf_dir))
            .select("point_id", "image_id", "x", "y"),
            tiles=load_tiles(spark, sf_dir))
        .select("point_id", "image_id", "value")))

    total = round(sum(timings.values()), 3)
    total_cold = round(sum(timings_cold.values()), 3)
    sf = fixtures.scale_of(sf_dir)
    return {
        "metric": "spatial_join_tiling_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold": timings_cold,
        "wall_warm": total,
        "wall_cold": total_cold,
        "sf": sf,
        "n_tiles": n_tiles,
        "tiles_per_sec": round(n_tiles / timings["point_sample_join"], 1) if timings.get("point_sample_join") else None,
        "tiles_per_sec_cold": round(n_tiles / timings_cold["point_sample_join"], 1) if timings_cold.get("point_sample_join") else None,
        "master": spark.sparkContext.master,
        "warmup_runs": 0,
        "repeats": repeats,
        "agg": "min_warm_plus_first_cold",
        "canary_pre_sec": canary_pre,
        "canary_post_sec": host_canary(),
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    print(json.dumps(run(sf_dir)))
