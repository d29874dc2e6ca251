"""Hot-tile A/B for the GROUPED flagship aggregate (VERDICT r04 #1).

The round-4 skew bench proved the shuffled equi-join needs salting; the
grouped strategy (sample_nearest_grouped) had the mirror-image problem —
one hot tile's matched points all concentrate into ONE collect_list
row and ONE kernel task. This harness measures that path directly:

  A. unsalted grouped  (max_shards=1)   — the r04 shape: the hot tile
     is a single aggregate row/task, the straggler IS the wall clock.
  B. sharded grouped   (adaptive salt)  — ceil(n/shard_target) shard
     rows per hot tile, spread across tasks; results bit-identical
     (pinned in tests/test_point_join.py).

Input: the sf0.01 fixture tiles; a synthetic point set with HOT_FRAC of
all points inside ONE tile's footprint and the rest spread uniformly
over the remaining footprints (every point matches, so kernel work —
not join selectivity — is what's being balanced). local[8], broadcast
of the pair set disabled-by-construction (the grouped path never
broadcasts pairs). Prints one JSON line for the BENCH.md ledger; run on
an IDLE machine (tmux) — the embedded host probe records the window.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_POINTS = int(os.environ.get("SKEW_POINTS", "2000000"))
# HOT_FRAC=0 measures the UNIFORM case: what the adaptive salt costs
# when no tile is hot (every _ns=1 — only the counts branch remains)
HOT_FRAC = float(os.environ.get("SKEW_HOT_FRAC", "0.3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def build_points(spark, tiles):
    """HOT_FRAC of points uniform inside the first tile's footprint,
    the rest spread over the other footprints (tile picked by hash) —
    pure SQL from spark.range + a broadcast footprint join."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rasters_spark.fixtures import HOT_X, HOT_Y

    # exclude the fixture's SHARED footprint (20% of tiles co-located at
    # HOT_X/HOT_Y — that's the r03 join-skew scenario): here the hot
    # load must concentrate on ONE tile so the A/B isolates the grouped
    # aggregate's single-row/single-task concentration
    foot = tiles.filter(
        ~((F.col("grid.x_origin") == HOT_X) & (F.col("grid.y_origin") == HOT_Y))
    ).select(
        "image_id", F.col("grid.x_origin").alias("fx"),
        F.col("grid.y_origin").alias("fy"),
        (F.col("grid.cell_width") * F.col("w")).alias("fw"),
        (F.col("grid.cell_height") * F.col("h")).alias("fh"),
    ).withColumn("tid", F.row_number().over(Window.orderBy("image_id")) - 1)
    n_tiles = foot.count()
    r = spark.range(N_POINTS).withColumnRenamed("id", "point_id")
    u1 = (F.pmod(F.xxhash64(F.col("point_id") * 2 + 1), F.lit(10**9))).cast("double") / 1e9
    u2 = (F.pmod(F.xxhash64(F.col("point_id") * 2 + 2), F.lit(10**9))).cast("double") / 1e9
    hot = (F.col("point_id") % 1000) < int(HOT_FRAC * 1000)
    tid = F.when(hot, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(F.col("point_id") + 7), F.lit(n_tiles - 1)) + 1)
    pts = r.select("point_id", u1.alias("u1"), u2.alias("u2"), tid.alias("tid"))
    j = pts.join(F.broadcast(foot), "tid")
    return j.select(
        "point_id",
        (F.col("fx") + F.col("u1") * 0.998 * F.col("fw")).alias("x"),
        (F.col("fy") + F.col("u2") * 0.998 * F.col("fh")).alias("y"))


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from rasters_spark import fixtures, get_spark
    from rasters_spark.operators import point_join, sample
    from rasters_spark.tiles import load_tiles
    from tools import host_probe

    probe_pre = host_probe.probe()
    fixtures.ensure_fixtures(SF_DIR)
    spark = get_spark("bench-skew-grouped", master="local[8]",
                  shuffle_partitions=int(os.environ.get("SKEW_SHUFFLE_PARTITIONS", "8")))
    tiles = load_tiles(spark, SF_DIR).localCheckpoint(eager=True)
    pts = build_points(spark, tiles).localCheckpoint(eager=True)
    idx = point_join.point_in_tile_join(pts, tiles, payload_cols=())
    if os.environ.get("SKEW_CHECKPOINT", "1") == "1":
        # A/B times the grouped AGGREGATE+KERNEL only; disable for the
        # OOM-boundary runs (the checkpoint materialization itself OOMs
        # before the variant under test does at ≥5M pairs on 4g)
        idx = idx.localCheckpoint(eager=True)
    n_pairs = idx.count()

    def run(**kw):
        out = sample.sample_nearest_grouped(idx, tiles, **kw) \
            .select("point_id", "image_id", "value")
        t0 = time.time()
        force(out)
        return round(time.time() - t0, 3)

    out = {
        "n_tiles": tiles.count(), "n_points": N_POINTS, "n_pairs": n_pairs,
        "hot_frac": HOT_FRAC, "master": "local[8]",
        "host_probe_pre": probe_pre,
    }
    variant = os.environ.get("SKEW_VARIANT", "both")
    if variant == "both":
        run(max_shards=1)  # warm pool/codegen, untimed
        # INTERLEAVED A/B/A/B so a host-contention window hits both
        # variants equally (a sequential AABB once mis-attributed a 2×
        # difference to the variant when it was the window)
        us, sh = [], []
        for _ in range(3):
            us.append(run(max_shards=1))
            sh.append(run())  # ships defaults
        out["unsalted_grouped_s"] = min(us)
        out["sharded_grouped_s"] = min(sh)
        out["sharded_speedup"] = round(min(us) / min(sh), 2)
    else:
        # single-variant mode for the OOM-boundary demonstration: an
        # executor OOM kills the local JVM, so each variant gets its
        # own process (an unsalted hot row that exceeds the heap must
        # not take the sharded measurement down with it)
        kw = {"max_shards": 1} if variant == "unsalted" else {}
        run(**kw)
        out[f"{variant}_grouped_s"] = min(run(**kw), run(**kw))
    out["host_probe_post"] = host_probe.probe()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
