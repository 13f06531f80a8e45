#!/usr/bin/env python3
"""spark-submit entry point for crawl-over-crawl incremental dedup.

    spark-submit --py-files dompa_spark.zip \
        dompa_spark/jobs/incremental_dedup.py \
        --new /path/new_crawl --output /path/flags \
        ( --old /path/prior_corpus | --old-sigs /path/sigs ) \
        [--save-sigs /path/sigs_next] [--jaccard-min F] [--novel-only]

The monthly re-crawl loop: flag every NEW-crawl doc that near-dups any
doc of the accumulated prior corpus (textops.dedup_incremental —
cross-snapshot candidates only; deduping the new crawl against itself
is a separate minhash_lsh_pairs run on the survivors). Inputs are
parquet tables with (doc_id, text) columns; doc_id must be unique
across both snapshots (xxhash64 surrogates, as pretrain_corpus
assigns).

The signature economics live here: --old-sigs consumes a persisted
`minhash_sigs` table instead of re-hashing the accumulated corpus (at
10^12 docs the old side is ~100x the new crawl — hash it once, ever),
and --save-sigs writes the UNION of old + new signatures for the next
cycle, so each month pays only one new-crawl hashing pass. Signatures
are a pure deterministic function of the text, so a stored table and a
recompute are interchangeable (pinned by the operator's sig-reuse
test). Prints one JSON stats line.

--exact-prefilter adds the cheap stage FIRST: docs whose exact content
fingerprint is already in the accumulated corpus (Bloom membership +
verified fingerprint join — textops.bloom_dedup) are dropped BEFORE
any minhash hashing, so a re-crawl that is mostly byte-identical pages
never pays the shingle pass for them. --old-bloom-index reads the
prior cycle's persisted artifacts (bitmap/ + fps/ + params.json
geometry guard, the build_ann_index layout); --save-bloom-index writes
the next cycle's — the bitmap accumulates by bitwise OR
(textops.bloom_merge), constant work in the corpus size.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="dompa_spark incremental (crawl-over-crawl) dedup"
    )
    p.add_argument("--new", required=True, dest="new_path")
    p.add_argument("--output", required=True)
    p.add_argument("--old", default=None, dest="old_path",
                   help="prior-corpus documents parquet (hashed in-job)")
    p.add_argument("--old-sigs", default=None,
                   help="persisted minhash_sigs parquet of the prior "
                        "corpus (skips re-hashing it)")
    p.add_argument("--save-sigs", default=None,
                   help="write old+new signature union here for the "
                        "next cycle")
    p.add_argument("--jaccard-min", type=float, default=None)
    p.add_argument("--novel-only", action="store_true",
                   help="write only non-duplicate doc_ids (the slim "
                        "keep list the next pipeline stage consumes)")
    p.add_argument("--exact-prefilter", action="store_true",
                   help="drop exact dups of the prior corpus (Bloom + "
                        "verified fingerprint join) before near-dup "
                        "hashing; needs --old or --old-bloom-index")
    p.add_argument("--old-bloom-index", default=None,
                   help="prior cycle's bloom artifacts dir "
                        "(bitmap/ + fps/ + params.json)")
    p.add_argument("--save-bloom-index", default=None,
                   help="write the OR-merged bloom artifacts here for "
                        "the next cycle")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    if (args.old_path is None) == (args.old_sigs is None):
        p.error("exactly one of --old / --old-sigs is required")
    if args.exact_prefilter and not (args.old_path or args.old_bloom_index):
        p.error("--exact-prefilter needs --old or --old-bloom-index")

    from pyspark.sql import SparkSession

    from dompa_spark import pipeline, textops

    builder = SparkSession.builder.appName("dompa-spark-incremental-dedup")
    if args.master:
        builder = builder.master(args.master)
    owns_session = SparkSession.getActiveSession() is None
    spark = pipeline.session_confs(builder).getOrCreate()

    new_docs = spark.read.parquet(args.new_path)

    # --- exact-dedup Bloom stage (before any shingle hashing) --------
    new_docs_all = new_docs  # pre-filter view, for --save-bloom-index
    exact_dropped = None
    old_bitmap = old_fps = None
    bloom_geom = {"m_bits": textops.BLOOM_M_BITS, "k": textops.BLOOM_K}
    if args.old_bloom_index:
        bloom_geom = json.loads(
            "".join(
                r.value
                for r in spark.read.text(
                    f"{args.old_bloom_index}/params.json"
                ).collect()
            )
        )
        old_bitmap = spark.read.parquet(f"{args.old_bloom_index}/bitmap")
        old_fps = spark.read.parquet(f"{args.old_bloom_index}/fps")
    if args.exact_prefilter:
        if old_bitmap is None:
            old_corpus = spark.read.parquet(args.old_path)
            old_bitmap = textops.bloom_bitmap(old_corpus, **bloom_geom)
            old_fps = textops.bloom_fps(old_corpus)
        bflags = textops.bloom_dedup(
            new_docs, old_bitmap=old_bitmap, old_fps=old_fps, **bloom_geom
        ).cache()
        exact_dropped = bflags.filter("exact_dup").count()
        new_docs = new_docs.join(
            bflags.filter("exact_dup").select("doc_id"),
            "doc_id",
            "left_anti",
        )
    kwargs = {}
    if args.jaccard_min is not None:
        kwargs["jaccard_min"] = args.jaccard_min
    # hash the new crawl ONCE; the operator caches both sig tables, so
    # the flags run and the --save-sigs union below share one pass
    new_sigs = textops.minhash_sigs(new_docs)
    if args.old_sigs:
        old_sigs = spark.read.parquet(args.old_sigs)
    else:
        old_sigs = textops.minhash_sigs(spark.read.parquet(args.old_path))
    flags = textops.dedup_incremental(
        new_sigs=new_sigs, old_sigs=old_sigs, **kwargs
    )
    out = flags.filter("NOT is_dup_of_prior").select("doc_id") \
        if args.novel_only else flags
    out.write.mode("overwrite").parquet(args.output)

    stats_df = spark.read.parquet(args.output)
    if args.novel_only:
        novel = stats_df.count()
        stats = {"new_docs_hashed": None, "novel": novel}
    else:
        novel = stats_df.filter("NOT is_dup_of_prior").count()
        stats = {"new_docs_hashed": stats_df.count(), "novel": novel}

    if args.save_sigs:
        # next cycle's accumulated signature table: prior sigs + the
        # new crawl's (one hashing pass per doc, ever — both sides are
        # the SAME cached DataFrames the flags run just materialized).
        # unionByName on the (doc_id, sh, sig) shape minhash_sigs emits.
        new_sigs.unionByName(old_sigs).write.mode("overwrite").parquet(
            args.save_sigs
        )

    if args.save_bloom_index:
        # next cycle's exact-dedup artifacts. The bitmap accumulates by
        # bitwise OR (bit_or is associative, so merge == rebuild); docs
        # the prefilter dropped add no new fingerprints, so hashing the
        # full new crawl here is the same artifact either way.
        nb = textops.bloom_bitmap(new_docs_all, **bloom_geom)
        nf = textops.bloom_fps(new_docs_all)
        if old_bitmap is not None:
            nb = textops.bloom_merge(old_bitmap, nb)
            nf = old_fps.unionByName(nf).distinct()
        nb.coalesce(1).write.mode("overwrite").parquet(
            f"{args.save_bloom_index}/bitmap"
        )
        nf.write.mode("overwrite").parquet(f"{args.save_bloom_index}/fps")
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(
            f"{args.save_bloom_index}/params.json"
        )
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        hout = fs.create(hpath, True)
        hout.write(bytearray(json.dumps(bloom_geom).encode()))
        hout.close()

    if exact_dropped is not None:
        stats["exact_dups_dropped"] = exact_dropped

    print(json.dumps(stats))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
