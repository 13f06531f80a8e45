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
