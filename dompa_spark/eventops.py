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


def retention_cohorts(df: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by the DATE of their first
    event; for each (cohort_day, day_offset), the count of cohort
    members active that day and the retention ratio — the engagement
    table every product-analytics stack ships. Output: (cohort_day,
    day_offset, n_active, cohort_size, retention).

    Scale shape: three partial-aggregating passes, every shuffle slim —
    first-event dates per user (groupBy user, one row out per user);
    distinct (user, day) activity (partial-agg distinct, one row per
    user-day); the activity⟕firsts join is per-user slim; the final
    (cohort_day, offset) aggregate counts pre-distinct rows so
    count(*) IS count-distinct-users. Cohort sizes derive from the
    firsts table (tiny — one row per DISTINCT date) and broadcast.
    All date math on NTZ-derived DATEs — zone-free in both engines
    (the _EPOCH_US discipline)."""
    firsts = df.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = (
        df.select("user_id", F.to_date("ts").alias("day")).distinct()
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    joined = activity.join(firsts, "user_id").withColumn(
        "day_offset", F.datediff("day", "cohort_day").cast("long")
    )
    return (
        joined.groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("long").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            "day_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size"), 4
            ).alias("retention"),
        )
    )


FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def funnel_steps(df: DataFrame, steps: tuple = FUNNEL_STEPS) -> DataFrame:
    """Ordered conversion funnel over event types: a user completes
    step k when some step-k event occurs AT OR AFTER their step-(k-1)
    completion time, completion time = the EARLIEST such qualifying
    event (the standard sequential funnel; note min-ts-per-step with a
    monotonicity check afterwards is NOT equivalent — a later
    qualifying event can satisfy the order when the earliest doesn't).
    Output: one row per step — (step_idx, step, n_users, conversion),
    conversion = n_users / previous step's users (step 0 vs itself =
    1.0 when nonzero).

    Scale shape: k sequential passes, each a map-side type filter over
    events (one event_type's rows survive the scan) joined to the
    previous step's slim per-user completion table on user_id, then a
    partial-agg min — every shuffle carries one row per (user, step
    candidate), never the event stream; k is a small constant. The
    alternative single-pass form is a per-user sorted state machine
    (the sessionize single-task-per-user contract); the join form
    keeps every stage partial-aggregating instead."""
    us = F.expr(_EPOCH_US.format("ts"))
    t_prev = (
        df.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min(us).alias("t"))
    )
    tables = [t_prev]
    for s_name in steps[1:]:
        ev = df.filter(F.col("event_type") == s_name).select(
            "user_id", us.alias("ts_us")
        )
        t_prev = (
            ev.join(t_prev, "user_id")
            .filter(F.col("ts_us") >= F.col("t"))
            .groupBy("user_id")
            .agg(F.min("ts_us").alias("t"))
        )
        tables.append(t_prev)
    rows = None
    prev_count = None
    for k, (s_name, tbl) in enumerate(zip(steps, tables)):
        cnt = tbl.agg(F.count("*").cast("long").alias("n"))
        n = F.col("n")
        if prev_count is None:
            conv = F.when(n > 0, F.lit(1.0)).otherwise(F.lit(0.0))
        else:
            conv = F.when(
                F.col("n_prev") > 0, n / F.col("n_prev")
            ).otherwise(F.lit(0.0))
            cnt = cnt.join(
                F.broadcast(
                    prev_count.select(F.col("n").alias("n_prev"))
                )
            )
        one = cnt.select(
            F.lit(k).cast("long").alias("step_idx"),
            F.lit(s_name).alias("step"),
            n.alias("n_users"),
            F.round(conv, 4).alias("conversion"),
        )
        rows = one if rows is None else rows.unionByName(one)
        prev_count = tbl.agg(F.count("*").cast("long").alias("n"))
    return rows


def props_stats(df: DataFrame, key: str = "k") -> DataFrame:
    """Semi-structured column handling: extract an integer property
    from the JSON `props` column and aggregate per event_type —
    (event_type, n_events, n_with_key, k_min, k_max, k_sum). The JSON
    path runs JVM-side (get_json_object — no Python, no shuffle until
    the slim per-type aggregate); the DuckDB oracle replays with
    json_extract_string. Integer min/max/sum keep the aggregate
    order-independent (no float averages)."""
    k = F.get_json_object("props", f"$.{key}").cast("long")
    return (
        df.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.count("k").cast("long").alias("n_with_key"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
            F.sum("k").cast("long").alias("k_sum"),
        )
    )


PATHS_TOPK = 3


def user_paths(df: DataFrame, k: int = PATHS_TOPK) -> DataFrame:
    """Next-event transition matrix — the Markov view of user behavior
    (funnel_steps checks ONE prescribed order; this surfaces what users
    actually do next, feeding funnel design and anomaly watch). Per
    user, events order by (ts, event_id) — event_id is unique, so the
    order and therefore every count is deterministic — and each
    consecutive pair contributes one (from_event, to_event) transition;
    session boundaries are deliberately ignored (compose with
    sessionize's session_id as an extra partition key when cross-
    session transitions should not count). Output per observed
    from_event: its top-k next events with exact counts, the from-side
    total, and an integer-ppm share; rank ties break (count desc,
    to_event asc).

    Scale shape: ONE (user_id) shuffle for the lead() window — the
    sessionize per-user single-task skew contract applies verbatim —
    then a partial-aggregatable groupBy whose key space is bounded by
    |event_type|^2, not events; the totals join and the rank window run
    on THAT tiny table."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = df.select(
        F.col("event_type").alias("from_event"),
        F.lead("event_type").over(w).alias("to_event"),
    ).where(F.col("to_event").isNotNull())
    counts = pairs.groupBy("from_event", "to_event").agg(
        F.count("*").cast("long").alias("n_transitions")
    )
    totals = counts.groupBy("from_event").agg(
        F.sum("n_transitions").cast("long").alias("from_total")
    )
    wr = Window.partitionBy("from_event").orderBy(
        F.desc("n_transitions"), F.asc("to_event")
    )
    return (
        counts.join(totals, "from_event")
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= int(k))
        .select(
            "from_event", "to_event", "n_transitions", "from_total",
            F.expr(
                "(n_transitions * 1000000) div from_total"
            ).alias("share_ppm"),
            "rank",
        )
    )
