"""Events-analytics family: retention cohorts, sequential funnel,
JSON props stats."""

import datetime

from pyspark.sql import functions as F

from dompa_spark import eventops

_TS = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, d, h, 0, 0), u, t, 1.0, p)
            for i, (d, h, u, t, p) in enumerate(rows)
        ],
        _TS,
    )


def test_retention_cohort_table(spark):
    """Two cohorts; day-0 retention is 1.0 by construction; later
    offsets count exactly the returning users."""
    rows = [
        # cohort Jan 1: users 1, 2; user 1 returns day 1 and 3
        (1, 9, 1, "view", "{}"), (1, 10, 2, "view", "{}"),
        (2, 9, 1, "click", "{}"), (4, 9, 1, "view", "{}"),
        # cohort Jan 2: user 3, never returns
        (2, 11, 3, "view", "{}"),
    ]
    out = {
        (r["cohort_day"], r["day_offset"]): r
        for r in eventops.retention_cohorts(_ev(spark, rows)).collect()
    }
    assert out[("2024-01-01", 0)]["n_active"] == 2
    assert out[("2024-01-01", 0)]["retention"] == 1.0
    assert out[("2024-01-01", 1)]["n_active"] == 1
    assert out[("2024-01-01", 1)]["retention"] == 0.5
    assert out[("2024-01-01", 3)]["n_active"] == 1
    assert out[("2024-01-02", 0)]["cohort_size"] == 1
    assert ("2024-01-02", 1) not in out


def test_funnel_loose_order_not_min_monotone(spark):
    """The case that separates the sequential funnel from the
    min-ts-monotone shortcut: view BEFORE signup plus view AFTER
    signup must still convert (the later view satisfies the order)."""
    rows = [
        (1, 5, 1, "view", "{}"),     # early view (before signup)
        (1, 10, 1, "signup", "{}"),
        (1, 20, 1, "view", "{}"),    # qualifying view
        (2, 1, 1, "click", "{}"),    # click AFTER the qualifying view
        (2, 2, 1, "purchase", "{}"),
        # user 2: signup only
        (1, 9, 2, "signup", "{}"),
    ]
    out = {
        r["step"]: r
        for r in eventops.funnel_steps(_ev(spark, rows)).collect()
    }
    assert out["signup"]["n_users"] == 2
    assert out["view"]["n_users"] == 1   # user 1 via the LATER view
    assert out["click"]["n_users"] == 1
    assert out["purchase"]["n_users"] == 1
    assert out["view"]["conversion"] == 0.5
    assert out["purchase"]["conversion"] == 1.0


def test_funnel_order_violation_blocks(spark):
    """A user whose only step-k events precede step k-1 completion
    does NOT convert."""
    rows = [
        (1, 10, 1, "view", "{}"),    # view before signup only
        (1, 20, 1, "signup", "{}"),
    ]
    out = {
        r["step"]: r["n_users"]
        for r in eventops.funnel_steps(_ev(spark, rows)).collect()
    }
    assert out == {"signup": 1, "view": 0, "click": 0, "purchase": 0}


def test_props_stats_extraction(spark):
    rows = [
        (1, 9, 1, "view", '{"k": 5}'),
        (1, 10, 1, "view", '{"k": 7}'),
        (1, 11, 2, "view", '{"other": 1}'),
        (1, 12, 2, "click", None),
    ]
    out = {
        r["event_type"]: r
        for r in eventops.props_stats(_ev(spark, rows)).collect()
    }
    v = out["view"]
    assert (v["n_events"], v["n_with_key"]) == (3, 2)
    assert (v["k_min"], v["k_max"], v["k_sum"]) == (5, 7, 12)
    c = out["click"]
    assert (c["n_events"], c["n_with_key"]) == (1, 0)
