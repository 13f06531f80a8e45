#!/usr/bin/env python3
"""spark-submit entry point for publishing a WARC archive's derived
artifacts — the index + text + metadata products a crawl publishes
next to its shards so downstream consumers never re-walk the archive:

    spark-submit --py-files dompa_spark.zip \
        dompa_spark/jobs/publish_archive.py \
        --input /path/warcs --output /path/derived \
        [--input-format binary|parquet] [--formats cdx,wet,wat] \
        [--index-parts N] \
        [--lookup SURT_PREFIX]   # query mode: read the persisted index

Publish mode writes, per requested format:

- ``cdx``  -> ``<output>/cdx``  — the capture index (cdx.cdx_index:
  one row per record with byte offset/length, SURT key, digest),
  written **range-partitioned AND sorted by (surt, ts)**. That layout
  is the entire point: parquet keeps per-file/per-row-group min-max
  stats, so a later SURT-prefix lookup prunes every file whose key
  range cannot match BEFORE reading it — the wayback query pattern at
  petabyte scale is "touch 1 of 10,000 index files", never "scan the
  index". The archive shards themselves are read once, here.
- ``wet``  -> ``<output>/wet``  — text-only conversion shards
  (cdx.warc_to_wet: charset-aware decode + the real extraction
  kernel, spec-framed WARC).
- ``wat``  -> ``<output>/wat``  — metadata shards (cdx.warc_to_wat:
  canonical WAT-subset JSON per record).

``--lookup`` mode reads ONLY the persisted cdx parquet and runs the
SURT-prefix capture query against it (cdx.cdx_lookup) — no WARC bytes
are touched, and the prefix predicate reaches the parquet scan as a
pushed StringStartsWith filter (pinned by tests/test_cdx.py's plan
assertion). This is the deployment split the index exists for: one
expensive publish per crawl, unlimited cheap lookups after.

``--compact APPEND_DIR`` mode folds streaming.cdx_index_stream's
unsorted appends into the sorted index: union ``<output>/cdx`` (if
present) with the append directory, rewrite range-partitioned +
sorted, and report the row count. The LSM pattern the text index
uses: the stream appends cheaply, compaction restores the pruning
layout, lookups in between still work (just without file pruning on
the unsorted tail). Index rows are append-only facts keyed by
(warc_id, rec_idx) — shards are immutable once written — so the
union IS the merge; nothing rewrites archive bytes.

``--rewrite-revisits OUT_DIR`` (publish mode) first compacts the
archive itself: cdx.rewrite_revisits rewrites every later capture of
an identical payload as a spec-shaped `revisit` record pointing at
the keeper, the compacted shards land at OUT_DIR as (warc_id,
content) parquet, and the derived artifacts (cdx/wet/wat) are
published over the COMPACTED shards — the Common Crawl shipping
shape, where revisit records save the duplicate payload bytes in the
archive and every derived product agrees with what actually shipped.

Prints one JSON stats line either way. Scale shape: everything rides
the shard-per-task kernels; the only wide operations are the WET/WAT
re-shard groupBys and the index's range partitioning (a sample-based
exchange — exactly the one-time sort cost that buys every future
lookup its pruning).
"""

from __future__ import annotations

import argparse
import json
import sys

FORMATS = ("cdx", "wet", "wat")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="dompa_spark WARC derived-artifact publisher"
    )
    p.add_argument("--input", default=None,
                   help="WARC shards (publish mode)")
    p.add_argument("--output", required=True)
    p.add_argument("--input-format", default="binary",
                   choices=["binary", "parquet"])
    p.add_argument("--formats", default="cdx,wet,wat",
                   help="comma list of cdx,wet,wat (publish mode)")
    p.add_argument("--index-parts", type=int, default=None,
                   help="range partitions for the cdx index (default: "
                        "session shuffle parallelism)")
    p.add_argument("--lookup", default=None,
                   help="SURT prefix: query the persisted index at "
                        "<output>/cdx instead of publishing")
    p.add_argument("--compact", default=None, metavar="APPEND_DIR",
                   help="fold a streaming-append index directory into "
                        "the sorted index at <output>/cdx instead of "
                        "publishing")
    p.add_argument("--lookup-out", default=None,
                   help="write --lookup results here (default: print "
                        "count only)")
    p.add_argument("--rewrite-revisits", default=None,
                   metavar="OUT_DIR",
                   help="publish mode: compact the archive first — "
                        "rewrite duplicate captures as revisit "
                        "records, write the compacted shards here, "
                        "and publish the derived artifacts over them")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    fmts = [f.strip() for f in args.formats.split(",") if f.strip()]
    bad = [f for f in fmts if f not in FORMATS]
    if bad:
        p.error(f"unknown formats: {bad} (choose from {FORMATS})")
    if args.lookup is not None and args.compact is not None:
        p.error("--lookup and --compact are separate modes")
    if args.rewrite_revisits is not None and (
        args.lookup is not None or args.compact is not None
    ):
        p.error("--rewrite-revisits is a publish-mode option")
    if args.lookup is None and args.compact is None and not args.input:
        p.error("--input is required in publish mode")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dompa_spark import cdx, pipeline, warc

    builder = SparkSession.builder.appName("dompa-spark-publish-archive")
    if args.master:
        builder = builder.master(args.master)
    owns_session = SparkSession.getActiveSession() is None
    spark = pipeline.session_confs(builder).getOrCreate()
    stats: dict = {"job": "publish_archive"}

    try:
        if args.compact is not None:
            import os

            parts = args.index_parts or int(
                spark.conf.get("spark.sql.shuffle.partitions")
            )
            srcs = [args.compact]
            # the sorted base may not exist yet (first compaction of a
            # stream-only index)
            if os.path.exists(f"{args.output}/cdx"):
                srcs.append(f"{args.output}/cdx")
            merged = spark.read.parquet(*srcs)
            # full-row dedup makes compaction IDEMPOTENT: re-running
            # with the same append dir (or appends overlapping the
            # base after a stream replay) re-folds byte-identical
            # rows, which would otherwise double-count the index —
            # the recrawl_schedule covered-pair lesson. Full row, not
            # a key: genuinely distinct captures of the same URL
            # differ in (ts, offset, digest) and are all kept, which
            # is the point of a capture index.
            merged = merged.dropDuplicates()
            tmp = f"{args.output}/cdx_compacting"
            (
                merged.repartitionByRange(parts, "surt", "ts")
                .sortWithinPartitions("surt", "ts")
                .write.mode("overwrite")
                .parquet(tmp)
            )
            # two-step rewrite: the merge cannot overwrite a path it
            # is reading, so it lands in cdx_compacting first; the
            # copy into the live path carries Spark's usual overwrite
            # visibility (a reader mid-swap should retry, same as any
            # overwritten table without a catalog)
            final = spark.read.parquet(tmp)
            n = final.count()
            final.write.mode("overwrite").parquet(f"{args.output}/cdx")
            stats.update({"mode": "compact", "cdx_records": n})
            print(json.dumps(stats, sort_keys=True))
            return 0

        if args.lookup is not None:
            idx = spark.read.parquet(f"{args.output}/cdx")
            hits = cdx.cdx_lookup(idx, args.lookup)
            if args.lookup_out:
                hits.write.mode("overwrite").parquet(args.lookup_out)
                hits = spark.read.parquet(args.lookup_out)
            stats.update(
                {
                    "mode": "lookup",
                    "prefix": args.lookup,
                    "hits": hits.count(),
                }
            )
            print(json.dumps(stats, sort_keys=True))
            return 0

        if args.input_format == "binary":
            shards = (
                spark.read.format("binaryFile")
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

        if args.rewrite_revisits is not None:
            # compact the archive itself, then publish over the
            # compacted shards so every derived artifact agrees with
            # what actually ships. The revisit count rides the cdx
            # publish's existing by-type aggregate below ONLY when
            # that format is requested — never an extra index pass
            # just for a stats number (the frontier-job lesson).
            cdx.rewrite_revisits(shards).write.mode(
                "overwrite"
            ).parquet(args.rewrite_revisits)
            shards = spark.read.parquet(args.rewrite_revisits)
            stats["compacted_shards"] = args.rewrite_revisits

        if "cdx" in fmts:
            parts = args.index_parts or int(
                spark.conf.get("spark.sql.shuffle.partitions")
            )
            idx = cdx.cdx_index(shards)
            # range partition + in-file sort on the lookup key: parquet
            # min-max stats then prune whole files/row groups for any
            # surt-prefix predicate — the publish-once/seek-forever
            # layout
            (
                idx.repartitionByRange(parts, "surt", "ts")
                .sortWithinPartitions("surt", "ts")
                .write.mode("overwrite")
                .parquet(f"{args.output}/cdx")
            )
            back = spark.read.parquet(f"{args.output}/cdx")
            counts = {
                r["warc_type"]: r["n"]
                for r in back.groupBy("warc_type")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            stats["cdx_records"] = sum(counts.values())
            stats["cdx_by_type"] = counts
            if args.rewrite_revisits is not None:
                stats["revisit_records"] = counts.get("revisit", 0)
        if "wet" in fmts:
            cdx.warc_to_wet(shards).write.mode("overwrite").parquet(
                f"{args.output}/wet"
            )
            stats["wet_shards"] = (
                spark.read.parquet(f"{args.output}/wet").count()
            )
        if "wat" in fmts:
            cdx.warc_to_wat(shards).write.mode("overwrite").parquet(
                f"{args.output}/wat"
            )
            stats["wat_shards"] = (
                spark.read.parquet(f"{args.output}/wat").count()
            )
        stats["mode"] = "publish"
        stats["formats"] = fmts
        print(json.dumps(stats, sort_keys=True))
        return 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
