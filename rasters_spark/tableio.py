"""TableIO — snapshot-ledgered table storage with lineage + metrics.

The north rule asks for Iceberg-snapshot resumability with per-partition
lineage and metrics. This sandbox's pyspark distribution carries no
Iceberg runtime jars (SURVEY §7.0), so TableIO is a thin seam:

- on a real cluster: point the same call sites at
  ``spark.read/write.format("iceberg")`` (snapshots, manifests and
  time-travel come from the catalog);
- here: parquet data files + an append-only JSON ledger
  (``_ledger.json``) that emulates the snapshot log honestly —
  every commit records snapshot id, parent, operation, input lineage,
  and per-file row/byte stats read back from the parquet footers
  (real metrics, not estimates).

Resumability contract: a job is a sequence of idempotent CHUNKS keyed
by ``chunk_id``; each chunk commit is one ledger snapshot. On restart,
``completed_chunks`` tells the driver what to skip — the relational
equivalent of resuming from the last Iceberg checkpoint snapshot.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession


class SnapshotExpiredError(LookupError):
    """Time travel below the expiration horizon: the snapshot's data
    files were deleted by ``expire_snapshots`` (Iceberg's
    ``expireSnapshots`` contract — history is bounded, reads of
    retained snapshots are unaffected)."""


class TableIO:
    def __init__(self, base_path: str):
        self.base = Path(base_path)
        self.base.mkdir(parents=True, exist_ok=True)
        self.ledger_path = self.base / "_ledger.json"

    # --- ledger -----------------------------------------------------------------

    def _read_ledger(self) -> list[dict]:
        if self.ledger_path.exists():
            return json.loads(self.ledger_path.read_text())
        return []

    def _append_ledger(self, entry: dict) -> None:
        ledger = self._read_ledger()
        entry["snapshot_id"] = len(ledger) + 1
        entry["parent_snapshot"] = len(ledger) or None
        ledger.append(entry)
        tmp = self.ledger_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(ledger, indent=1))
        os.replace(tmp, self.ledger_path)  # atomic commit, crash-safe

    def snapshots(self) -> list[dict]:
        return self._read_ledger()

    def current_snapshot(self) -> int:
        return len(self._read_ledger())

    # --- write ------------------------------------------------------------------

    def write(
        self,
        df: DataFrame,
        operation: str = "append",
        job_id: str = "",
        chunk_id: str | None = None,
        inputs: list[str] | None = None,
    ) -> dict:
        """Commit df as one snapshot. Data lands in ``data/snap-<uuid>/``
        BEFORE the ledger append — a crash between the two leaves an
        orphan directory, never a ledger entry pointing at nothing."""
        t0 = time.time()
        snap_dir = self.base / "data" / f"snap-{uuid.uuid4().hex[:12]}"
        df.write.mode("overwrite").parquet(str(snap_dir))
        files = self._file_stats(snap_dir)
        entry = {
            "operation": operation,
            "job_id": job_id,
            "chunk_id": chunk_id,
            "inputs": inputs or [],
            "files": files,
            "row_count": sum(f["rows"] for f in files),
            "wall_sec": round(time.time() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._append_ledger(entry)
        return entry

    def _file_stats(self, snap_dir: Path) -> list[dict]:
        """Per-file row/byte stats read back from the parquet footers —
        the ledger's (real) manifest metrics."""
        files = []
        for f in sorted(snap_dir.glob("*.parquet")):
            md = pq.read_metadata(f)
            files.append({
                "path": str(f.relative_to(self.base)),
                "rows": md.num_rows,
                "bytes": f.stat().st_size,
                "row_groups": md.num_row_groups,
            })
        return files

    # --- read / time travel -------------------------------------------------------

    @staticmethod
    def _live_files(ledger: list[dict]) -> list[dict]:
        """The live file set after replaying a ledger prefix: every
        operation contributes its files (append semantics) except
        ``replace`` — a compaction commit that carries the FULL new
        live list (rewritten + carried-over refs), exactly like an
        Iceberg rewrite_data_files snapshot — and ``expire``, which is
        metadata-only."""
        live: list[dict] = []
        for e in ledger:
            if e["operation"] == "replace":
                live = list(e["files"])
            elif e["operation"] != "expire":
                live.extend(e["files"])
        return live

    def expiration_horizon(self) -> int:
        """Earliest snapshot id still travelable (1 if never expired)."""
        return max((e.get("expired_through", 1) for e in self._read_ledger()
                    if e["operation"] == "expire"), default=1)

    def read(self, spark: SparkSession, as_of_snapshot: int | None = None) -> DataFrame:
        """The table's live files as of a snapshot (time travel).
        Travel below the expiration horizon raises SnapshotExpiredError
        (the files are gone); reads at/after the horizon — including
        the current table — are unaffected by expiration."""
        ledger = self._read_ledger()
        if as_of_snapshot is not None:
            horizon = self.expiration_horizon()
            if as_of_snapshot < horizon:
                raise SnapshotExpiredError(
                    f"snapshot {as_of_snapshot} of {self.base} expired "
                    f"(horizon: {horizon})")
            ledger = ledger[:as_of_snapshot]
        paths = [str(self.base / f["path"]) for f in self._live_files(ledger)]
        if not paths:
            raise FileNotFoundError(f"table {self.base} has no snapshots")
        return spark.read.parquet(*paths)

    # --- maintenance: compaction + snapshot expiration ----------------------------

    def compact(self, spark: SparkSession, small_file_bytes: int = 32 << 20,
                target_file_bytes: int = 128 << 20) -> dict | None:
        """Bin-pack small live files into ~target-size files and commit
        ONE ``replace`` snapshot (Iceberg ``rewrite_data_files``, the
        small-files maintenance a streaming/chunked-append table needs
        at 100 TB: thousands of KB-scale commit files become
        read-amplification and driver/manifest pressure; a scan of N
        tiny files costs N task launches + N footer reads).

        Only files < ``small_file_bytes`` are rewritten; larger ones
        are carried over BY REFERENCE into the new live list (no data
        copy). Row-level content is untouched — pinned by the
        ``table_compaction`` contract oracle and time travel to
        pre-compaction snapshots still resolves the original files.
        Returns the ledger entry, or None when there is nothing to do
        (0 or 1 small file — a rewrite would churn bytes for no file-
        count reduction)."""
        import math

        ledger = self._read_ledger()
        live = self._live_files(ledger)
        small = [f for f in live if f["bytes"] < small_file_bytes]
        keep = [f for f in live if f["bytes"] >= small_file_bytes]
        if len(small) <= 1:
            return None
        t0 = time.time()
        nparts = max(1, math.ceil(sum(f["bytes"] for f in small) / target_file_bytes))
        df = spark.read.parquet(*[str(self.base / f["path"]) for f in small])
        snap_dir = self.base / "data" / f"snap-{uuid.uuid4().hex[:12]}"
        # coalesce, not repartition: bin-packing needs no shuffle — the
        # scan's existing splits merge map-side into nparts output files
        df.coalesce(nparts).write.mode("overwrite").parquet(str(snap_dir))
        entry = {
            "operation": "replace",
            "job_id": "compact",
            "chunk_id": None,
            "inputs": [f["path"] for f in small],
            "files": keep + self._file_stats(snap_dir),
            "row_count": sum(f["rows"] for f in keep) + parquet_row_count(str(snap_dir)),
            "rewritten_files": len(small),
            "wall_sec": round(time.time() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._append_ledger(entry)
        return entry

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Expire history older than the last ``keep_last`` snapshots
        (Iceberg ``expireSnapshots``): physically delete data files no
        retained snapshot's live set references, bounding storage for
        an append/compact-forever table. The ledger keeps every entry
        (lineage is history, not data); reads of retained snapshots are
        byte-identical; time travel below the new horizon raises
        SnapshotExpiredError. Idempotent — a second call with the same
        ``keep_last`` deletes nothing."""
        ledger = self._read_ledger()
        horizon = max(1, len(ledger) + 1 - keep_last)
        referenced = {f["path"]
                      for s in range(horizon, len(ledger) + 1)
                      for f in self._live_files(ledger[:s])}
        deleted = []
        for p in sorted((self.base / "data").glob("snap-*/*.parquet")):
            rel = str(p.relative_to(self.base))
            if rel not in referenced:
                p.unlink()
                deleted.append(rel)
        for d in sorted((self.base / "data").glob("snap-*")):
            if d.is_dir() and not any(d.iterdir()):
                d.rmdir()
        entry = {
            "operation": "expire",
            "job_id": "expire",
            "chunk_id": None,
            "inputs": [],
            "files": [],
            "row_count": 0,
            "expired_through": horizon,
            "deleted_files": deleted,
            "wall_sec": 0.0,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._append_ledger(entry)
        return entry

    # --- resumability ---------------------------------------------------------------

    def completed_chunks(self, job_id: str) -> set[str]:
        return {e["chunk_id"] for e in self._read_ledger()
                if e.get("job_id") == job_id and e.get("chunk_id")}

    def run_resumable(self, job_id: str, chunks: dict[str, callable]) -> list[str]:
        """Run every not-yet-committed chunk; returns the chunk ids
        executed THIS run (skipped ones are already in the ledger).
        Each chunk callable returns the DataFrame to commit."""
        done = self.completed_chunks(job_id)
        ran = []
        for cid, thunk in chunks.items():
            if cid in done:
                continue
            self.write(thunk(), operation="append", job_id=job_id, chunk_id=cid)
            ran.append(cid)
        return ran


def parquet_row_count(path: str) -> int:
    """Exact row count of a parquet file/directory from the FOOTERS
    only — a driver-side metadata read, never a Spark job. This is the
    corpus-size hint source for the plan-time-parameter derivations
    (similarity.ivf_cosine_topk / embedding_near_dup_pairs): VERDICT
    r03/r04 — no Spark job may trigger during plan construction, so
    callers pass ``corpus_size=parquet_row_count(dir)`` instead of
    letting the operator fall back to ``df.count()``. The same footer
    stats tableio snapshots already record per commit."""
    p = Path(path)
    files = sorted(p.glob("*.parquet")) if p.is_dir() else [p]
    return sum(pq.read_metadata(f).num_rows for f in files)


def write_bucketed(spark: SparkSession, df: DataFrame, table_name: str,
                   bucket_col: str | list[str] = "cell_id", n_buckets: int = 64) -> None:
    """Persist a table BUCKETED (+sorted) on its join key — the
    co-located-join lever for large⋈large spatial joins at 100 TB:
    two tables bucketed on ``cell_id`` with the same bucket count join
    with ZERO Exchange (the scan is already hash-distributed on the
    key; asserted on the physical plan in
    tests/test_tableio_streaming.py). The Iceberg analogue is a
    ``bucket(N, cell_id)`` partition transform; here it's Spark's
    native bucketBy into the session catalog."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"drop table if exists {table_name}")
    # a crashed previous run can leave an orphaned managed location that
    # blocks re-creation — clear it. Build the path per Spark's managed
    # layout (warehouse/<db>.db/<tbl> for qualified names, ADVICE r02)
    # and only ever rmtree a path strictly inside the warehouse dir.
    wh = os.path.abspath(
        urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path)
    parts = table_name.lower().split(".")
    rel = parts[-1] if len(parts) == 1 else os.path.join(f"{parts[-2]}.db", parts[-1])
    orphan = os.path.abspath(os.path.join(wh, rel))
    if orphan.startswith(wh + os.sep):
        shutil.rmtree(orphan, ignore_errors=True)
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    (df.write.mode("overwrite").format("parquet")
       .bucketBy(n_buckets, *cols).sortBy(*cols)
       .saveAsTable(table_name))


def partition_metrics(df: DataFrame) -> list[dict]:
    """Per-Spark-partition row counts of a live DataFrame (lineage
    metric for skew inspection — hot cells show up as fat partitions)."""
    from pyspark.sql import functions as F

    rows = df.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    return [{"partition": r.pid, "rows": r["count"]} for r in sorted(rows, key=lambda r: r.pid)]


def write_zordered(df: DataFrame, path: str, level: int | None = None,
                   n_files: int = 8) -> None:
    """Rewrite a tile table CLUSTERED by Morton id (cells.z_cell_id of
    the tile center) — the spatial-layout lever complementing
    write_bucketed's join lever: after a range-repartition + in-file
    sort on the interleaved id, any bbox query touches O(1) contiguous
    id ranges, so parquet row-group min/max stats (and an Iceberg
    manifest's partition bounds) prune the scan instead of reading the
    world. The Iceberg analogue is `sort_order(z)` table maintenance /
    Delta Z-ORDER compaction.

    Tests pin the measurable property: mean per-row-group z-id SPAN
    shrinks by orders of magnitude vs insertion order
    (tests/test_tableio_streaming.py)."""
    from rasters_spark import cells, fixtures
    from pyspark.sql import functions as F

    lv = fixtures.CELL_LEVEL if level is None else level
    cx = F.col("x_origin") + F.col("cell_width") * F.col("w").cast("double") / 2.0
    cy = F.col("y_origin") + F.col("cell_height") * F.col("h").cast("double") / 2.0
    z = df.withColumn("z_id", cells.z_cell_id(cx, cy, lv))
    (z.repartitionByRange(n_files, "z_id")
      .sortWithinPartitions("z_id")
      .write.mode("overwrite").parquet(path))
