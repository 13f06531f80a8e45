#!/usr/bin/env python3
"""spark-submit entry point for the corpus telemetry report: every
sizing/health gauge a pipeline operator reads before tuning the next
run, computed in ONE submit over the documents table and persisted as
small parquet tables + one JSON summary line.

    spark-submit --py-files dompa_spark.zip \
        dompa_spark/jobs/corpus_report.py \
        --input /path/documents --output /path/report \
        [--heavy-rate 8] [--sketch-k 32]

Report layout ({output}/...):
    length_quantiles/  (p_bp, target_rank, bin, est_max_chars)
    char_entropy/      (n_docs, rejected, h_mean) per-corpus aggregate
    mixture/           (lang, n_docs, n_tokens, token_share,
                        target_share, weight)
    distinct_sketch/   (source, n_tokens, est_distinct)
    heavy_hitters/     (term, sampled_n, est_count)
    script_mixture/    (main_script, n_docs, n_scripted, n_rejected)
    summary.json       the one-line rollup (also printed to stdout;
                       incl. script_rejected)

Scale shape: the report is telemetry, so every table is tiny — the
corpus-sized work is two token passes (the heavy-hitters sample +
the distinct-sketch minima, both partial-aggregating) and three
map-side scans (quantile bins, entropy, mixture counts) that AQE
runs off the same cached slim projection (doc_id, text, n_chars,
lang, source — the curate_corpus single-scan discipline, scoped so
long-lived sessions don't leak cache blocks).

Every number is the library operators' own — this job adds NO new
math, so each table is covered by the operators' DuckDB oracles.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="dompa_spark corpus report")
    p.add_argument("--input", required=True,
                   help="documents parquet (doc_id, text, lang, "
                        "source, n_chars)")
    p.add_argument("--output", required=True)
    p.add_argument("--heavy-rate", type=int, default=8)
    p.add_argument("--heavy-min-est", type=int, default=64)
    p.add_argument("--sketch-k", type=int, default=32)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dompa_spark import pipeline, textops

    builder = SparkSession.builder.appName("dompa-spark-corpus-report")
    if args.master:
        builder = builder.master(args.master)
    owns_session = SparkSession.getActiveSession() is None
    spark = pipeline.session_confs(builder).getOrCreate()

    docs = spark.read.parquet(args.input)
    slim = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text", "lang", "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    ).cache()
    try:
        out = args.output

        lq = textops.length_quantiles(slim)
        lq.coalesce(1).write.mode("overwrite").parquet(
            f"{out}/length_quantiles"
        )

        ce = (
            textops.char_entropy_scores(slim)
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.count(F.when(~F.col("char_ok"), 1))
                .cast("long")
                .alias("rejected"),
                F.round(F.avg("h_bits"), 4).alias("h_mean"),
            )
        )
        ce.coalesce(1).write.mode("overwrite").parquet(
            f"{out}/char_entropy"
        )

        mix = textops.corpus_mixture(slim)
        mix.coalesce(1).write.mode("overwrite").parquet(f"{out}/mixture")

        ds = textops.distinct_sketch(slim, k=args.sketch_k)
        ds.coalesce(1).write.mode("overwrite").parquet(
            f"{out}/distinct_sketch"
        )

        hh = textops.heavy_hitters(
            slim, rate=args.heavy_rate, min_est=args.heavy_min_est
        )
        hh.coalesce(1).write.mode("overwrite").parquet(
            f"{out}/heavy_hitters"
        )

        sm = textops.script_mixture(slim)
        sm.coalesce(1).write.mode("overwrite").parquet(
            f"{out}/script_mixture"
        )

        ce_row = spark.read.parquet(f"{out}/char_entropy").first()
        q_rows = {
            int(r["p_bp"]): int(r["est_max_chars"])
            for r in spark.read.parquet(
                f"{out}/length_quantiles"
            ).collect()
        }
        summary = {
            "docs": int(ce_row.n_docs),
            "entropy_rejected": int(ce_row.rejected),
            "h_mean": float(ce_row.h_mean),
            "p50_chars": q_rows.get(5000),
            "p99_chars": q_rows.get(9900),
            "langs": spark.read.parquet(f"{out}/mixture").count(),
            "sources": spark.read.parquet(
                f"{out}/distinct_sketch"
            ).count(),
            "heavy_terms": spark.read.parquet(
                f"{out}/heavy_hitters"
            ).count(),
            "script_rejected": int(
                spark.read.parquet(f"{out}/script_mixture")
                .agg(F.sum("n_rejected"))
                .first()[0]
                or 0
            ),
        }
    finally:
        slim.unpersist()
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{args.output}/summary.json")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fout = fs.create(hpath, True)
    fout.write(bytearray(json.dumps(summary).encode()))
    fout.close()
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
