"""robots_sitemaps: Sitemap: directives are group-independent, keep
document order with gaps, canonicalize through the shared frontier
expressions, and never leak into the rule parser."""

import pytest

from dompa_spark import textops


def _sm(spark, body, host="ex.org"):
    df = spark.createDataFrame(
        [(host, body)], "host string, robots_txt string"
    )
    return textops.robots_sitemaps(df).collect()


def test_positions_gaps_and_canon(spark):
    out = _sm(
        spark,
        "User-agent: *\nDisallow: /p\n"
        "Sitemap: https://ex.org/a.xml\n"
        "SITEMAP: HTTPS://EX.ORG:443/b.xml?utm_source=z\n"
        "Sitemap:\n"
        "sitemap: https://cdn.net/c.xml  # trailing comment\n",
    )
    by_idx = {r["sm_idx"]: r for r in out}
    assert sorted(by_idx) == [0, 1, 3]
    assert by_idx[0]["url_canon"] == "https://ex.org/a.xml"
    assert by_idx[0]["cross_host"] is False
    # field case-insensitive; scheme/host lowercased, :443 stripped,
    # utm-only query dropped
    assert by_idx[1]["url_canon"] == "https://ex.org/b.xml"
    assert by_idx[1]["sm_host"] == "ex.org"
    assert by_idx[3]["url_canon"] == "https://cdn.net/c.xml"
    assert by_idx[3]["cross_host"] is True


def test_sitemap_lines_never_become_rules(spark):
    body = (
        "Sitemap: https://ex.org/top.xml\n"
        "User-agent: bot\nDisallow: /x\n"
        "Sitemap: https://ex.org/mid.xml\n"
    )
    df = spark.createDataFrame(
        [("ex.org", body)], "host string, robots_txt string"
    )
    rules = textops.robots_parse(df).collect()
    assert [(r["agent"], r["rule"], r["path"]) for r in rules] == [
        ("bot", "disallow", "/x")
    ]
    sms = textops.robots_sitemaps(df).collect()
    assert sorted(r["url"] for r in sms) == [
        "https://ex.org/mid.xml",
        "https://ex.org/top.xml",
    ]


def test_no_sitemap_lines_no_rows(spark):
    assert _sm(spark, "User-agent: *\nDisallow: /\n") == []


# --- Crawl-delay ---------------------------------------------------------------


def _delays(spark, txt, agent="mybot"):
    from dompa_spark import textops

    df = spark.createDataFrame(
        [("H.Example", txt)], "host string, robots_txt string"
    )
    return {
        r["host"]: (r["crawl_delay_s"], r["fetches_per_hour"])
        for r in textops.robots_crawl_delay(df, agent=agent).collect()
    }


def test_crawl_delay_star_group_applies(spark):
    got = _delays(spark, "User-agent: *\nDisallow: /x\nCrawl-delay: 10\n")
    assert got == {"h.example": (10.0, 360)}


def test_crawl_delay_specific_group_overrides_star(spark):
    got = _delays(
        spark,
        "User-agent: *\nCrawl-delay: 10\n\n"
        "User-agent: MyBot\nCrawl-delay: 2.5\n",
    )
    assert got == {"h.example": (2.5, 1440)}


def test_crawl_delay_specific_group_without_delay_suppresses_star(spark):
    # the crawler picked its group; that group has no delay — the '*'
    # delay must NOT leak through as a fallback
    got = _delays(
        spark,
        "User-agent: *\nCrawl-delay: 10\n\n"
        "User-agent: MyBot\nDisallow: /m\n",
    )
    assert got == {}


def test_crawl_delay_junk_and_negative_values_ignored(spark):
    got = _delays(
        spark,
        "User-agent: MyBot\nCrawl-delay: fast\nCrawl-delay: -1\n",
    )
    assert got == {}


def test_crawl_delay_max_wins_and_zero_is_unlimited(spark):
    got = _delays(
        spark, "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 7\n"
    )
    assert got == {"h.example": (7.0, 514)}
    got = _delays(spark, "User-agent: *\nCrawl-delay: 0\n")
    assert got == {"h.example": (0.0, None)}


def test_crawl_delay_field_case_insensitive_and_pre_group_ignored(spark):
    got = _delays(
        spark,
        "Crawl-delay: 99\n"  # before any group: ignored
        "User-agent: *\nCRAWL-DELAY: 4\n",
    )
    assert got == {"h.example": (4.0, 900)}


def test_crawl_delay_does_not_change_default_robots_parse(spark):
    from dompa_spark import textops

    df = spark.createDataFrame(
        [("h.example", "User-agent: *\nCrawl-delay: 5\nDisallow: /x\n")],
        "host string, robots_txt string",
    )
    rows = textops.robots_parse(df).collect()
    # default surface: allow/disallow only — the delay line is invisible
    assert [(r["rule"], r["path"]) for r in rows] == [("disallow", "/x")]


# --- politeness budgets ----------------------------------------------------------


def test_domain_cap_budgets_variable_caps_and_passthrough(spark):
    from pyspark.sql import functions as F

    from dompa_spark import textops

    rows = [(i, f"h{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    budgets = spark.createDataFrame(
        [("h0", 3), ("h1", 0), ("h2", 7)], "source string, cap_n long"
    )
    kept = textops.domain_cap_budgets(df, budgets).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r)
    # h0: lowest 3 doc_ids, exact ranks
    h0 = sorted(by_src["h0"], key=lambda r: r["doc_id"])
    assert [(r["doc_id"], r["rank_in_source"]) for r in h0] == [
        (0, 1), (4, 2), (8, 3)
    ]
    # h1: cap 0 defers the whole source
    assert "h1" not in by_src
    # h2: cap 7 < 10 rows -> lowest 7
    assert sorted(r["doc_id"] for r in by_src["h2"]) == [
        2, 6, 10, 14, 18, 22, 26
    ]
    # h3: no budget row -> uncapped passthrough, NULL rank
    assert sorted(r["doc_id"] for r in by_src["h3"]) == list(range(3, 40, 4))
    assert all(r["rank_in_source"] is None for r in by_src["h3"])


def test_domain_cap_budgets_matches_constant_cap_operator(spark):
    """With every source at the same cap, the variable-cap operator
    must reproduce domain_cap exactly (same salted two-phase rank)."""
    from dompa_spark import textops

    rows = [(i, f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    budgets = spark.createDataFrame(
        [(f"s{j}", 5) for j in range(3)], "source string, cap_n long"
    )
    var = {
        (r["doc_id"], r["rank_in_source"])
        for r in textops.domain_cap_budgets(df, budgets).collect()
    }
    const = {
        (r["doc_id"], r["rank_in_source"])
        for r in textops.domain_cap(df, cap=5).collect()
    }
    assert var == const


def test_frontier_job_politeness_window(spark, tmp_path):
    """--politeness-window end-to-end: '*'-delay hosts defer (cap 0),
    specific fast hosts keep floor(window/delay) fetches, no-delay
    hosts are untouched."""
    import json

    from dompa_spark import textops
    from dompa_spark.jobs import frontier

    urls = spark.createDataFrame(
        [(i, f"https://h{i % 3}.example/p{i}") for i in range(30)],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [
            # h0: mybot delay 2 -> cap floor(3600*0.001/2) = 1
            ("h0.example", "User-agent: MyBot\nCrawl-delay: 2\n"),
            # h1: '*' delay 10 -> cap 0 (deferred this window)
            ("h1.example", "User-agent: *\nCrawl-delay: 10\n"),
            # h2: no delay -> uncapped
            ("h2.example", "User-agent: *\nDisallow: /private\n"),
        ],
        "host string, robots_txt string",
    )
    up, rp, op = (str(tmp_path / n) for n in ("urls", "robots", "out"))
    urls.write.parquet(up)
    robots.write.parquet(rp)
    rc = frontier.main(
        [
            "--urls", up,
            "--output", op,
            "--robots", rp,
            "--agent", "mybot",
            "--politeness-window", "0.001",
        ]
    )
    assert rc == 0
    out = spark.read.parquet(op).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r["doc_id"])
    assert by_host.get("h0.example") == [0]          # cap 1, lowest id
    assert "h1.example" not in by_host               # deferred
    assert sorted(by_host["h2.example"]) == list(range(2, 30, 3))
