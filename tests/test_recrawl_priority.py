"""recrawl_priority: change-rate scheduling contracts — interval
halving, removed-URL exit, revival through re-add, and exact ppm."""

import pytest

from dompa_spark import textops


def _pri(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, cycle long, status string"
    )
    out = textops.recrawl_priority(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_interval_halves_with_change_count(spark):
    rows = []
    # doc 0: never changes; doc 1: one change; doc 3: three changes
    for d, pattern in [
        (0, ["added", "unchanged", "unchanged", "unchanged"]),
        (1, ["added", "changed", "unchanged", "unchanged"]),
        (3, ["added", "changed", "changed", "changed"]),
    ]:
        rows += [(d, c, s) for c, s in enumerate(pattern)]
    p = _pri(spark, rows)
    base = textops.RECRAWL_BASE_DAYS
    assert p[0]["interval_days"] == base
    assert p[1]["interval_days"] == base // 2
    assert p[3]["interval_days"] == base // 4
    assert p[3]["change_ppm"] == 750_000
    assert p[0]["n_changes"] == 0


def test_interval_floor_is_one_day(spark):
    rows = [(1, c, "changed" if c else "added") for c in range(200)]
    p = _pri(spark, rows)
    assert p[1]["interval_days"] == 1


def test_removed_last_leaves_schedule(spark):
    p = _pri(
        spark,
        [(1, 0, "added"), (1, 1, "changed"), (1, 2, "removed")],
    )
    assert p[1]["last_status"] == "removed"
    assert p[1]["interval_days"] is None


def test_readd_after_removal_revives(spark):
    p = _pri(
        spark,
        [
            (1, 0, "added"), (1, 1, "removed"), (1, 2, "added"),
            (1, 3, "unchanged"),
        ],
    )
    assert p[1]["last_status"] == "unchanged"
    assert p[1]["interval_days"] == textops.RECRAWL_BASE_DAYS
