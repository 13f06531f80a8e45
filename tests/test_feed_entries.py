"""feed_entries_df: RSS/Atom ingestion through the real parser.

Pins the void-<link> adjacent-sibling recovery (the HTML void table
wins even inside RSS markup), the strict parent chains, decoy
exclusion, document-order positions with gaps, and the shared
canonicalization.
"""

import pytest
from pyspark.sql import functions as F

from dompa_spark import pipeline, textops


def _entries(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, html string")
    spans = df.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.col("html").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    return textops.feed_entries_df(
        pipeline.parse_nodes_df(spans)
    ).collect()


def test_rss_void_link_sibling_recovery(spark):
    out = _entries(
        spark,
        [
            (
                "1",
                '<rss version="2.0"><channel><title>C</title>'
                "<item><title>T1</title><link>https://a.org/x</link>"
                "<pubDate>2026-01-02</pubDate></item>"
                "</channel></rss>",
            )
        ],
    )
    assert len(out) == 1
    r = out[0]
    assert r["feed_type"] == "rss"
    assert r["title"] == "T1"
    assert r["link"] == "https://a.org/x"
    assert r["published"] == "2026-01-02"
    assert r["url_canon"] == "https://a.org/x"
    assert r["host"] == "a.org"


def test_atom_href_and_null_title(spark):
    out = _entries(
        spark,
        [
            (
                "1",
                "<feed><title>F</title>"
                '<entry><link href="https://b.org/y"/>'
                "<updated>2026-02-03</updated></entry></feed>",
            )
        ],
    )
    assert len(out) == 1
    r = out[0]
    assert r["feed_type"] == "atom"
    assert r["title"] is None
    assert r["link"] == "https://b.org/y"
    assert r["published"] == "2026-02-03"


def test_linkless_entries_drop_but_hold_positions(spark):
    out = _entries(
        spark,
        [
            (
                "1",
                "<rss><channel>"
                "<item><title>A</title><link>https://a.org/1</link></item>"
                "<item><title>no link</title></item>"
                "<item><link>https://a.org/3</link></item>"
                "</channel></rss>",
            )
        ],
    )
    assert sorted(r["entry_pos"] for r in out) == [0, 2]
    by_pos = {r["entry_pos"]: r for r in out}
    assert by_pos[2]["title"] is None
    assert by_pos[2]["published"] is None


def test_orphan_item_and_feed_title_never_emit(spark):
    out = _entries(
        spark,
        [
            (
                "1",
                # orphan item outside any channel + channel w/o items
                "<item><title>orphan</title><link>https://bad.org/x"
                "</link></item><rss><channel><title>C</title>"
                "</channel></rss>",
            ),
            ("2", "<div><p>not a feed at all</p></div>"),
        ],
    )
    assert out == []


def test_mixed_feeds_same_doc_positions_rss_first(spark):
    # iids ++ eids: RSS items occupy the leading positions
    out = _entries(
        spark,
        [
            (
                "1",
                "<rss><channel><item><link>https://a.org/r</link></item>"
                "</channel></rss>"
                '<feed><entry><link href="https://a.org/e"/></entry></feed>',
            )
        ],
    )
    by_type = {r["feed_type"]: r for r in out}
    assert by_type["rss"]["entry_pos"] == 0
    assert by_type["atom"]["entry_pos"] == 1


def test_sitemap_index_chain_and_orphan(spark):
    """sitemap -> sitemapindex chain required; orphan <sitemap> never
    emits; loc-less entries drop but hold position."""
    from pyspark.sql import functions as F

    rows = [
        (
            "1",
            "<sitemapindex>"
            "<sitemap><loc>https://a.org/m1.xml</loc>"
            "<lastmod>2026-01-05</lastmod></sitemap>"
            "<sitemap><priority>0.1</priority></sitemap>"
            "<sitemap><loc>https://A.ORG:443/m2.xml</loc></sitemap>"
            "</sitemapindex>"
            "<sitemap><loc>https://bad.org/x.xml</loc></sitemap>",
        )
    ]
    df = spark.createDataFrame(rows, "doc_id string, html string")
    spans = df.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.col("html").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    from dompa_spark import pipeline, textops

    out = {r["sm_pos"]: r
           for r in textops.sitemap_index_df(
               pipeline.parse_nodes_df(spans)).collect()}
    assert sorted(out) == [0, 2]
    assert out[0]["loc"] == "https://a.org/m1.xml"
    assert out[0]["lastmod"] == "2026-01-05"
    assert out[2]["url_canon"] == "https://a.org/m2.xml"
    assert out[2]["lastmod"] is None
    assert all(r["host"] == "a.org" for r in out.values())
