"""Deterministic training-shard packing (webdataset-style).

The last step of a training-data build: assign every document to a
fixed-size shard so shard files can be written independently. The
naive Spark spelling — ``sum(size) over (order by ...)`` with no
``partitionBy`` — collapses the whole table into ONE window task (the
classic global-window anti-pattern); at 10¹² rows it is the job. The
scale-correct shape is the classic two-phase distributed prefix sum:

1. bucket rows by FIXED equal-width ranges of a uniform md5 key
   (``pid = hkey // ceil(2⁶⁰/P)`` — no ``repartitionByRange``, whose
   sampled boundaries are not reproducible across jobs, and md5
   uniformity makes fixed ranges balanced by construction);
2. pass A: one skinny aggregate — per-bucket byte totals (P rows) —
   collected and exclusive-prefix-summed on the driver;
3. pass B: one ``applyInPandas`` over the SAME deterministic buckets:
   sort the bucket by (hkey, key), intra-bucket exclusive cumsum, add
   the bucket's driver offset, and ``shard_id = prefix // target``
   (pure int64 arithmetic — exactly reproducible relationally as
   ``sum(size) over (order by hkey, key rows between unbounded
   preceding and 1 preceding) // target``).

Every doc with exclusive prefix in [k·target, (k+1)·target) joins
shard k, so a shard's payload is bounded by target ± max_doc_size —
the standard parallel approximation of greedy sequential packing, and
(unlike greedy) embarrassingly parallel and engine-reproducible.
Memory boundary: a bucket holds ~N/P rows in one pandas group; size P
accordingly (the md5 key is uniform, so the hot-bucket ceiling is the
mean + O(√(N/P)) — there is no data-dependent hot key by
construction, which is why the CLAUDE.md hot-key sharding rule does
not bite here).

The md5-prefix arithmetic is the shared `split.py` / `simhash_md5`
cross-engine pattern. No counterpart exists in the reference (it is a
single-scene library); this is a training-pipeline extension.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rasters_spark.datapipe.split import HASH_SPAN, _hash60

_SPAN_INT = 1 << 60


def pack_shards(df: DataFrame, target_bytes: int, size_col: str = "n_chars",
                key: str = "doc_id", salt: str = "v1",
                num_buckets: int = 64) -> DataFrame:
    """Assign each row a ``shard_id`` such that consecutive rows (in
    the deterministic md5(key‖salt) order) fill ~``target_bytes``
    shards. Returns (key, size_col, shard_id) — map-only except ONE
    skinny P-row aggregate and ONE bucket-keyed exchange."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    bucket_span = (_SPAN_INT + num_buckets - 1) // num_buckets
    hkey = _hash60(F.concat_ws("|", F.col(key).cast("string"), F.lit(salt)))
    base = df.select(
        F.col(key).alias("_key"),
        F.col(size_col).cast("long").alias("_size"),
        hkey.alias("_hkey")).withColumn(
        # exact int64 division (round-6 hardening, VERDICT r05 #2): the
        # former double division (_hkey / span).cast("long") fed a
        # ~2^60 numerator through a 53-bit mantissa, so bucket ids near
        # span boundaries depended on FP rounding — the one inexact
        # step in a module advertising pure int64 arithmetic
        "_pid", F.expr(f"_hkey div {bucket_span}"))

    # pass A: per-bucket totals — P skinny rows to the driver
    totals = {r["_pid"]: r["_tot"] for r in
              base.groupBy("_pid").agg(F.sum("_size").alias("_tot")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += int(totals[pid])

    tgt = int(target_bytes)

    # pass B: per-bucket sort + exclusive cumsum + driver offset
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_hkey", "_key"], kind="mergesort")
        off = offsets.get(int(pdf["_pid"].iloc[0]), 0)
        prefix = off + pdf["_size"].cumsum() - pdf["_size"]
        return pd.DataFrame({
            "_key": pdf["_key"],
            "_size": pdf["_size"],
            "shard_id": (prefix // tgt).astype("int64"),
        })

    out_schema = f"_key {dict(df.select(key).dtypes)[key]}, _size long, shard_id long"
    out = base.groupBy("_pid").applyInPandas(pack, schema=out_schema)
    return out.select(F.col("_key").alias(key), F.col("_size").alias(size_col),
                      "shard_id")
