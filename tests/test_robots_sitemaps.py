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
