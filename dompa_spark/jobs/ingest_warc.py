#!/usr/bin/env python3
"""spark-submit entry point for WARC ingestion: raw crawl archives in,
the interleaved span-table corpus out — the boundary that lets the
pipeline start from what a crawler actually writes.

    spark-submit --py-files dompa_spark.zip dompa_spark/jobs/ingest_warc.py \
        --input /path/warcs --output /path/docs \
        [--input-format binary|parquet] [--extract /path/extracted] \
        [--light-parts N] [--heavy-parts N] [--chunk-parts N]

Input: either raw `*.warc` files (``binary``, read via Spark's
binaryFile source — one file per row, the shard being the natural task
unit on object storage) or a parquet table of (warc_id, content)
shards (``parquet``). Records parse with the Content-Length-walking
Arrow kernel (dompa_spark.warc.parse_warc).

What becomes a document:

- ``response`` records with 2xx status and a text/html payload become
  html-span docs: doc_id = the record's WARC-Target-URI (auditable —
  the doc id IS the fetch), spans = [one html span], payload decoded
  charset-aware (dompa_spark.charset tier order: BOM > the
  Content-Type header's charset= parameter > meta prescan > strict
  UTF-8 > cp1252), verdict kept as a top-level ``charset`` audit
  column.
- ``resource`` records with an image/audio/video mime become
  media-span docs (media_ref = the URI); the parser is payload-
  agnostic, so real decode composes downstream via dompa_spark.media.
- Everything else (warcinfo, redirects, non-2xx, foreign mimes) is
  counted and dropped — the stats line is the audit.

Re-fetch dedup: the SAME canonical URI captured in several shards
keeps its first capture by (warc_id, rec_idx) — a deterministic
min_by, partial-aggregatable, no windows (a viral URL combines
map-side).

``--extract`` then runs the standard resumable extraction
(pipeline.run_extract) on the ingested table, so one submit goes
archive -> spans. Prints one JSON stats line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="dompa_spark WARC ingestion")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--input-format", default="binary",
                   choices=["binary", "parquet"])
    p.add_argument("--extract", default=None,
                   help="also run the extraction job into this path")
    p.add_argument("--light-parts", type=int, default=None)
    p.add_argument("--heavy-parts", type=int, default=None)
    p.add_argument("--chunk-parts", type=int, default=0)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dompa_spark import charset, pipeline, warc

    builder = SparkSession.builder.appName("dompa-spark-ingest-warc")
    if args.master:
        builder = builder.master(args.master)
    spark = pipeline.session_confs(builder).getOrCreate()

    if args.input_format == "binary":
        shards = (
            spark.read.format("binaryFile")
            # *.warc, *.warc.gz, and *.warc.zst all match; parse_warc
            # inflates member-per-record gzip / frame-per-record zstd
            # transparently off the magic
            .option("pathGlobFilter", "*.warc*")
            .load(args.input)
            .select(
                F.xxhash64("path").alias("warc_id"),
                F.col("content"),
            )
        )
    else:
        shards = spark.read.parquet(args.input).select(
            "warc_id", "content"
        )

    recs_all = warc.parse_warc(shards)
    recs = recs_all.filter(F.col("url").isNotNull())
    is_html = (
        (F.col("warc_type") == "response")
        & F.col("http_status").between(200, 299)
        & F.col("mime").startswith("text/html")
    )
    media_kind = (
        F.when(F.col("mime").startswith("image/"), "image")
        .when(F.col("mime").startswith("audio/"), "audio")
        .when(F.col("mime").startswith("video/"), "video")
    )
    is_media = (F.col("warc_type") == "resource") & media_kind.isNotNull()
    # charset-aware HTML decode (charset.py tier order): the HTTP
    # Content-Type's charset= parameter is the declared hint, the meta
    # prescan covers self-describing pages, and BOM / strict-UTF-8 /
    # cp1252 handle the rest — a bare binary->string cast would mangle
    # every legacy-encoded page. Input masked to html rows so media
    # payloads never enter the decode batch.
    declared = F.regexp_extract(
        F.col("mime"), r"(?i);\s*charset=\"?\s*([A-Za-z0-9_\-]+)", 1
    )
    dec = charset.transcode_expr(
        F.when(is_html, F.col("payload")), declared, prescan=True
    )
    kept = recs.filter(is_html | is_media).select(
        F.col("url").alias("doc_id"),
        F.when(is_html, F.lit("html")).otherwise(media_kind).alias("kind"),
        dec["text"].alias("text"),
        dec["charset"].alias("charset"),
        F.when(is_media, F.col("url")).alias("media_ref"),
        F.struct("warc_id", "rec_idx").alias("cap"),
    )
    # first capture per URI: min_by on (warc_id, rec_idx) — a partial
    # aggregation, so a URL captured in thousands of shards combines
    # map-side instead of sorting in one task
    docs = kept.groupBy("doc_id").agg(
        F.min_by(
            F.struct("kind", "text", "charset", "media_ref"), F.col("cap")
        ).alias("r"),
        F.count("*").cast("long").alias("n_captures"),
    )
    out = docs.select(
        "doc_id",
        F.array(
            F.struct(
                F.col("r.kind").alias("kind"),
                F.col("r.text").alias("text"),
                F.col("r.media_ref").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
        "n_captures",  # audit columns; extract's scan column-prunes them
        F.col("r.charset").alias("charset"),
    )
    out.write.mode("overwrite").parquet(args.output)

    # stats: ONE pass over the archives (records/kept/shards in a single
    # agg) + aggregates over the just-written slim table — the parse
    # kernel runs twice total (write + audit), never per-stat
    rs = recs_all.agg(
        F.count("*").alias("records"),
        F.sum(
            (F.col("url").isNotNull() & (is_html | is_media)).cast("long")
        ).alias("kept"),
        F.countDistinct("warc_id").alias("shards"),
    ).first()
    written = spark.read.parquet(args.output)
    ws = written.agg(
        F.count("*").alias("docs"),
        F.sum(
            (F.col("spans")[0]["kind"] == "html").cast("long")
        ).alias("html_docs"),
        F.sum("n_captures").alias("captures"),
    ).first()
    stats = {
        "shards": rs.shards,
        "records": rs.records,
        "kept_records": rs.kept,
        "docs": ws.docs,
        "html_docs": ws.html_docs,
        "media_docs": ws.docs - ws.html_docs,
        "dup_captures": ws.captures - ws.docs,
        "filtered_records": rs.records - rs.kept,
    }
    if args.extract:
        kwargs = {}
        if args.light_parts is not None:
            kwargs["light_parts"] = args.light_parts
        if args.heavy_parts is not None:
            kwargs["heavy_parts"] = args.heavy_parts
        stats["extract"] = pipeline.run_extract(
            spark,
            args.output,
            args.extract,
            chunk_parts=args.chunk_parts,
            **kwargs,
        )
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
