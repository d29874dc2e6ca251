"""Event sessionization — gap-based session assignment over an event
log (the classic web-analytics window pattern; EXTENSION beyond the
reference, which has no event-log operators — this rounds out the
engine's event-table surface beside the hour-window and streaming
entries).

All JVM-side window functions (lag → gap flag → running sum), no UDF:
the running-sum-of-flags construction gives a per-user session ordinal
whose group key is then canonicalized to the session's MIN event_id —
visit-order independent, so a relational twin computes the identical
keys. Durations are integer microseconds (unix_micros ≡ DuckDB
epoch_us), exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Split each user's event stream into sessions at inactivity gaps
    > ``gap_minutes`` → one row per session:
    ``(user_id, session_id, n_events, n_error, first_us, last_us,
    duration_us)`` where session_id = the session's min event_id (an
    engine-stable canonical key) and the ordering tie-break is total
    (ts, then event_id — CLAUDE.md total-order rule).

    Scale shape: ONE hash partition by user_id feeds both the window
    pass and the session aggregate (Catalyst reuses the exchange); a
    power user's rows stay bounded by their own event count — the
    standard sessionization shape every event warehouse runs."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fixture timestamps are TIMESTAMP_NTZ; the session pins
    # spark.sql.session.timeZone=UTC (session.py), so the cast to
    # TIMESTAMP is the identity epoch mapping and unix_micros matches
    # DuckDB's epoch_us on the naive value exactly
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60_000_000), 1).otherwise(0)
    # two projection steps: a window function can't nest inside another
    # window's argument in one select
    flagged = events.select("user_id", "event_id", "event_type", "ts",
                            is_new.alias("is_new"), us.alias("us"))
    tagged = flagged.select("user_id", "event_id", "event_type", "us",
                            F.sum("is_new").over(w).alias("sess"))
    return (tagged.groupBy("user_id", "sess")
            .agg(F.min("event_id").alias("session_id"),
                 F.count("*").alias("n_events"),
                 F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
                 F.min("us").alias("first_us"),
                 F.max("us").alias("last_us"))
            .select("user_id", "session_id", "n_events", "n_error",
                    "first_us", "last_us",
                    (F.col("last_us") - F.col("first_us")).alias("duration_us")))


def cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention matrix (the product-analytics staple): users
    are cohorted by their FIRST active day; each later active day
    increments (cohort_day, day_offset) → (cohort_day, day_offset,
    n_users) with n_users = distinct users of that cohort active
    exactly day_offset days after their first day.

    Pure integer day arithmetic on epoch days (floor(epoch/86400) over
    the UTC-pinned session ≡ DuckDB's), two keyed aggregates and one
    broadcastable join on user_id — fully combiner-friendly."""
    day = F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                  / F.lit(86_400_000_000)).alias("day")
    active = events.select("user_id", day).distinct()
    first = active.groupBy("user_id").agg(F.min("day").alias("day0"))
    j = active.join(first, "user_id")
    return (j.groupBy(F.col("day0").alias("cohort_day"),
                      (F.col("day") - F.col("day0")).alias("day_offset"))
            .agg(F.count_distinct("user_id").alias("n_users")))


def funnel(events: DataFrame, steps=("view", "click", "purchase")) -> DataFrame:
    """Ordered conversion funnel: a user reaches step k when they have
    a ``steps[k]`` event AT OR AFTER their earliest completion of step
    k−1 (the strict-ordering funnel every product-analytics engine
    computes) → one row per step (step, event_type, n_users).

    Plan: one keyed min-aggregate per step, each joined to the
    previous step's (user_id, t) frontier — k broadcastable joins on
    user_id for a k-step funnel, all integer-microsecond comparisons
    (exact on both engines). The step loop builds the PLAN, not
    driver-side data."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = events.select("user_id", "event_type", us.alias("us"))
    out = None
    prev = None
    for i, st in enumerate(steps):
        ek = e.filter(F.col("event_type") == st)
        if prev is None:
            cur = ek.groupBy("user_id").agg(F.min("us").alias("t"))
        else:
            cur = (ek.join(prev, "user_id")
                   .filter(F.col("us") >= F.col("t"))
                   .groupBy("user_id").agg(F.min("us").alias("t_next"))
                   .withColumnRenamed("t_next", "t"))
        row = cur.agg(F.count("*").alias("n_users")).select(
            F.lit(i + 1).alias("step"), F.lit(st).alias("event_type"), "n_users")
        out = row if out is None else out.unionByName(row)
        prev = cur.select("user_id", "t")
    return out
