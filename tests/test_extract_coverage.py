"""pipeline.extract_coverage: DOM-vs-kept text accounting against
hand-built pages."""

import pytest
from pyspark.sql import functions as F

from dompa_spark import pipeline


def _cov(spark, rows):
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
    out = pipeline.extract_coverage(spans)
    return {int(r["doc_id"]): r.asDict() for r in out.collect()}


def test_counts_and_ppm(spark):
    body = "x" * 50
    cov = _cov(
        spark,
        [
            (
                "1",
                "<html><body><nav><a href='/'>home</a></nav>"
                f"<article><p>{body}</p></article></body></html>",
            )
        ],
    )
    r = cov[1]
    # DOM text: 'home' (4) + payload (50); kept: the article p only
    assert r["dom_text_chars"] == 54
    assert r["kept_chars"] == 50
    assert r["n_kept_spans"] == 1
    assert r["kept_ppm"] == 50 * 1_000_000 // 54


def test_all_chrome_page_reads_zero(spark):
    cov = _cov(
        spark,
        [("1", "<html><body><nav><a href='/'>home</a></nav>"
               "<script>var x=1;</script></body></html>")],
    )
    r = cov[1]
    assert r["kept_chars"] == 0
    assert r["n_kept_spans"] == 0
    assert r["kept_ppm"] == 0
    assert r["dom_text_chars"] > 0


def test_textless_doc_guarded(spark):
    cov = _cov(spark, [("1", "<div><hr></div>")])
    r = cov[1]
    assert r["dom_text_chars"] == 0
    assert r["kept_ppm"] == 0
