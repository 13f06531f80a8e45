"""eventops.user_paths: next-event transition matrix contracts."""

import pytest

def test_user_paths_hand_stream(spark):
    """Transition counts over a crafted two-user stream: per-user
    ordering, cross-user isolation, top-k + tie-break, exact share."""
    from datetime import datetime

    from dompa_spark import eventops

    def ev(eid, user, minute, etype):
        return (eid, datetime(2024, 1, 1, 0, minute), user, etype, 0.0)

    rows = [
        # user 1: view -> click -> view -> buy
        ev(0, 1, 0, "view"), ev(1, 1, 1, "click"),
        ev(2, 1, 2, "view"), ev(3, 1, 3, "buy"),
        # user 2: view -> click, then nothing
        ev(4, 2, 0, "view"), ev(5, 2, 1, "click"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double",
    )
    out = {(r["from_event"], r["to_event"]): r
           for r in eventops.user_paths(df).collect()}
    # view->click twice (both users), click->view once, view->buy once
    assert out[("view", "click")]["n_transitions"] == 2
    assert out[("view", "buy")]["n_transitions"] == 1
    assert out[("click", "view")]["n_transitions"] == 1
    # view fan-out: total 3, shares exact
    assert out[("view", "click")]["from_total"] == 3
    assert out[("view", "click")]["share_ppm"] == 666_666
    assert out[("view", "buy")]["share_ppm"] == 333_333
    # rank: count desc then to_event asc
    assert out[("view", "click")]["rank"] == 1
    assert out[("view", "buy")]["rank"] == 2
    # user 2's last event contributes no transition
    assert ("click", "buy") not in out


def test_user_paths_tie_break_and_k(spark):
    from datetime import datetime

    from dompa_spark import eventops

    rows = []
    eid = 0
    # from 'a': one transition each to c, b, d (all tied) -> rank by
    # to_event asc; k=2 keeps b, c
    for i, nxt in enumerate(["c", "b", "d"]):
        rows.append((eid, datetime(2024, 1, 1, 0, 0), 10 + i, "a", 0.0))
        eid += 1
        rows.append((eid, datetime(2024, 1, 1, 0, 1), 10 + i, nxt, 0.0))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double",
    )
    out = eventops.user_paths(df, k=2).collect()
    kept = sorted((r["rank"], r["to_event"]) for r in out)
    assert kept == [(1, "b"), (2, "c")]
