"""Event-stream operators over the events table (ts, user_id,
event_type, value): gap-based sessionization and tumbling-window
aggregation — the batch forms of the streaming module's stateful /
windowed operators, expressed as pure Catalyst window functions so each
has an exact ANSI-SQL oracle.

The reference has no time/window semantics at all (SURVEY §2.7: "window
functions — none"); these are engine-level additions in the same class
as the training-data ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30

# events.ts is TIMESTAMP_NTZ (no zone); epoch micros via timestampdiff
# from the NTZ epoch is timezone-proof (unix_micros would require an
# instant type and drag the session zone into the value — DuckDB's
# epoch_us on a naive timestamp is zone-free, so this must be too)
_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {})"


def sessionize(df: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds `gap_min` minutes. Two window passes over
    the same (user_id, ts) partitioning — Catalyst plans ONE shuffle,
    both windows reuse the exchange — then a groupBy on (user_id,
    session_id) that partial-aggregates map-side. Timestamps surface as
    epoch micros (engine-portable, hash-stable).

    Skew contract (explicit, by design): ordered sessionization is
    inherently a per-user sequential fold, so ONE user's events are
    sorted and folded in ONE task — a pathological mega-user (10^8
    events) is a single-task sort, and no salting can fix that without
    breaking session continuity at salt boundaries. The practical
    bound: a task must hold the mega-user's (event_id, user_id, value,
    us) rows, ~40 B/event — 10^7 events/user (~400 MB) is the
    recommended ceiling per batch; beyond that, pre-split the input by
    time range and stitch boundary sessions, or use the streaming
    sessionizer (streaming.sessionize_stream), whose state folds
    incrementally per trigger. tests/test_eventops_property.py pins
    this contract with a mega-user corpus."""
    from pyspark.sql.window import Window

    base = df.select(
        "event_id", "user_id", "value",
        F.expr(_EPOCH_US.format("ts")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap_us = F.lit(gap_min * 60 * 1_000_000)
    prev_us = F.lag("us").over(w)
    is_new = F.when(
        prev_us.isNull() | ((F.col("us") - prev_us) > gap_us), 1
    ).otherwise(0)
    sess = base.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            "session_id", "n_events", "start_us", "end_us", "total_value",
        )
    )


def window_stats(df: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event_type (the batch form of the
    streaming monitor's windowed aggregation). One shuffle on
    (window_start, event_type); map-side partial aggregation."""
    win = F.window("ts", window)
    return (
        df.groupBy(
            win.alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.expr(_EPOCH_US.format("w.start")).alias("window_start_us"),
            "event_type", "n_events", "n_users", "total_value",
        )
    )
