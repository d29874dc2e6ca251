"""End-to-end production pipeline — the north-star shape, runnable via
``spark-submit --py-files rasters_spark.zip tools/run_pipeline.py``.

Runs the flagship spatial-join + tiling job CHUNKED BY COARSE CELL
PARENT, committing each chunk as a TableIO snapshot with per-partition
metrics and lineage — so a killed job resumes from the last committed
chunk (Iceberg-checkpoint semantics, north rule). Skewed chunks are
absorbed by AQE + the salted join inside each chunk.

Usage:
  python tools/run_pipeline.py [out_dir] [sf_dir]
  SPARK_GRAFT_KILL_AFTER=<n>   # crash after n chunks (resume testing)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARENT_LEVEL = 3  # 22.5° chunks → a few dozen chunks over the fixture extent


def main() -> None:
    from pyspark.sql import functions as F

    from rasters_spark import cells, fixtures
    from rasters_spark.operators import point_join, sample
    from rasters_spark.session import get_spark
    from rasters_spark.tableio import TableIO, partition_metrics
    from rasters_spark.tiles import load_points, load_tiles

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pipeline_out"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    kill_after = int(os.environ.get("SPARK_GRAFT_KILL_AFTER", "0"))

    fixtures.ensure_fixtures(sf_dir)
    # under spark-submit set SPARK_GRAFT_SUBMIT=1 so --master wins
    spark = get_spark("pipeline", master="inherit" if os.environ.get("SPARK_GRAFT_SUBMIT") else None)
    table = TableIO(out_dir)

    tiles = load_tiles(spark, sf_dir)
    pts = load_points(spark, sf_dir).withColumn(
        "chunk", cells.parent(cells.cell_id(F.col("x"), F.col("y"), fixtures.CELL_LEVEL),
                              fixtures.CELL_LEVEL, PARENT_LEVEL))
    chunk_ids = sorted(r.chunk for r in pts.select("chunk").distinct().collect())
    job_id = f"flagship-{os.path.basename(sf_dir)}"
    done = table.completed_chunks(job_id)
    print(f"PIPELINE chunks={len(chunk_ids)} done={len(done)}")

    n_run = 0
    for cid in chunk_ids:
        name = f"chunk-{cid}"
        if name in done:
            continue
        if kill_after and n_run >= kill_after:
            print(f"PIPELINE simulated crash after {n_run} chunks")
            sys.exit(137)
        t0 = time.time()
        chunk_pts = pts.filter(F.col("chunk") == cid).drop("chunk")
        result = sample.sample_nearest(
            point_join.point_in_tile_join(chunk_pts, tiles)
        ).select("point_id", "image_id", "prow", "pcol", "value", "caption")
        entry = table.write(result, operation="flagship-join", job_id=job_id,
                            chunk_id=name, inputs=[sf_dir])
        metrics = partition_metrics(chunk_pts)
        print("PIPELINE " + json.dumps({
            "chunk": name, "rows": entry["row_count"],
            "wall_sec": round(time.time() - t0, 2),
            "snapshot": entry["snapshot_id"],
            "point_partitions": metrics[:4],
        }))
        n_run += 1

    total = table.read(spark).count() if table.current_snapshot() else 0
    print("PIPELINE_DONE " + json.dumps({
        "job_id": job_id, "chunks_run_now": n_run,
        "chunks_total": len(chunk_ids), "output_rows": total,
        "snapshots": table.current_snapshot(),
    }))


if __name__ == "__main__":
    main()
