"""Property test: eventops.sessionize (Spark window functions) against a
pure-Python per-user fold, over randomized multi-user event streams —
gap boundaries (exactly 30 min is NOT a break; 30 min + 1 us is),
timestamp ties across users, single-event sessions, empty gaps."""

from hypothesis import given, settings
from hypothesis import strategies as st

from dompa_spark import eventops

GAP_US = 30 * 60 * 1_000_000

# (user_id, gap-to-previous-event-in-stream in minutes, value)
event_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.sampled_from([0, 1, 29, 30, 31, 60, 120]),
        st.integers(min_value=0, max_value=100),
    ),
    min_size=1,
    max_size=40,
)


def python_sessions(rows):
    """Reference fold: rows = [(event_id, us, user_id, value)]."""
    by_user: dict = {}
    for eid, us, uid, val in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        by_user.setdefault(uid, []).append((us, val))
    out = []
    for uid, evs in by_user.items():
        sid, start, last, n, total = 0, None, None, 0, 0.0
        for us, val in evs:
            if last is not None and us - last > GAP_US:
                out.append((uid, sid + 1, n, start, last, round(total, 4)))
                sid += 1
                start, n, total = None, 0, 0.0
            if start is None:
                start = us
            n += 1
            total += val
            last = us
        if n:
            out.append((uid, sid + 1, n, start, last, round(total, 4)))
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(event_strategy)
def test_sessionize_matches_python_fold(spark, events):
    import datetime

    rows = []
    t = 0
    for i, (uid, gap_min, val) in enumerate(events):
        t += gap_min * 60 * 1_000_000
        rows.append((i, t, uid, float(val)))
    df = spark.createDataFrame(
        [
            (
                eid,
                datetime.datetime(1970, 1, 1)
                + datetime.timedelta(microseconds=us),
                uid,
                "click",
                val,
                "{}",
            )
            for eid, us, uid, val in rows
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    got = sorted(
        (r.user_id, r.session_id, r.n_events, r.start_us, r.end_us,
         round(r.total_value, 4))
        for r in eventops.sessionize(df).collect()
    )
    assert got == python_sessions(rows)


def test_sessionize_mega_user_single_task_contract(spark):
    """Skew contract (eventops.sessionize docstring): one user owning
    most of the corpus is an inherent single-task sort for ordered
    sessionization — the operator must stay CORRECT under that skew
    (exact session boundaries, counts, sums), and the documented
    mitigation is time-range pre-split or the streaming sessionizer.
    50k events for one user (~80% of rows) + 20 small users."""
    from pyspark.sql import functions as F

    n_mega, n_small_users = 50_000, 20
    mega = spark.range(n_mega).select(
        F.col("id").alias("event_id"),
        # 10-min steps, a >30-min gap every 1000 events -> 50 sessions
        F.timestamp_micros(
            (F.col("id") * 600 + (F.col("id") / 1000).cast("long") * 3600)
            * 1_000_000
        ).cast("timestamp_ntz").alias("ts"),
        F.lit(0).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    small = spark.range(n_small_users * 600).select(
        (F.col("id") + 1_000_000).alias("event_id"),
        F.timestamp_micros(
            (F.col("id") / n_small_users).cast("long") * 600 * 1_000_000
        ).cast("timestamp_ntz").alias("ts"),
        (F.col("id") % n_small_users + 1).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    out = eventops.sessionize(mega.unionByName(small)).collect()
    mega_sessions = sorted(
        (r.session_id, r.n_events) for r in out if r.user_id == 0
    )
    # 50 sessions of exactly 1000 events each — boundaries exact
    assert mega_sessions == [(i + 1, 1000) for i in range(50)]
    assert sum(n for _, n in mega_sessions) == n_mega
    small_out = [r for r in out if r.user_id != 0]
    assert {r.user_id for r in small_out} == set(range(1, 21))
    assert all(r.n_events == 600 for r in small_out)  # 10-min steps: 1 session
