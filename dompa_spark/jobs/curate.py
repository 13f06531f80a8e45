#!/usr/bin/env python3
"""spark-submit entry point for the corpus-curation job.

    spark-submit --py-files dompa_spark.zip dompa_spark/jobs/curate.py \
        --input  /path/to/documents \
        --output /path/to/decisions \
        [--quality-min F] [--with-repetition] [--with-lm] [--kept-only]

Input: a parquet table with (doc_id, text, lang, source) columns (the
documents shape). Output: one decision row per document — the
single-scan curate_corpus verdicts (quality/sample/cap/dedup + kept),
optionally ANDed with the Gopher-style repetition gate and/or the
CCNet-style LM-surprisal gate — or, with --kept-only, just the kept
doc_ids (the slim join list a downstream mixing job consumes). Prints
one JSON stats line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="dompa_spark curation job")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--quality-min", type=float, default=None)
    p.add_argument("--with-repetition", action="store_true",
                   help="AND the repetition gate into `kept`")
    p.add_argument("--with-lm", action="store_true",
                   help="AND the LM-surprisal gate into `kept`")
    p.add_argument("--kept-only", action="store_true",
                   help="write only kept doc_ids instead of all verdicts")
    p.add_argument("--master", default=None,
                   help="override master (default: whatever spark-submit set)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dompa_spark import pipeline, textops

    builder = SparkSession.builder.appName("dompa-spark-curate")
    if args.master:
        builder = builder.master(args.master)
    # only stop a session this job itself created — under spark-submit
    # there is none yet; under an embedding test/process the caller
    # owns the session lifecycle
    owns_session = SparkSession.getActiveSession() is None
    spark = pipeline.session_confs(builder).getOrCreate()

    docs = spark.read.parquet(args.input)
    kwargs = {}
    if args.quality_min is not None:
        kwargs["quality_min"] = args.quality_min
    # scoped: the curation cache unpersists once the write inside the
    # block materializes it — repeated main() calls in one long-lived
    # session stay cache-bounded (ADVICE r03)
    with textops.curate_corpus_scoped(docs, **kwargs) as out:
        if args.with_repetition:
            rep = textops.repetition_scores(docs).select(
                "doc_id", "repetition_ok"
            )
            out = (
                out.join(rep, "doc_id", "left")
                .withColumn(
                    "repetition_ok",
                    F.coalesce("repetition_ok", F.lit(False)),
                )
                .withColumn("kept", F.col("kept") & F.col("repetition_ok"))
            )
        if args.with_lm:
            # lm_ok already reports one row per doc (null text included),
            # so the left join only goes NULL for docs absent from the
            # input itself — coalesce(False) keeps the gate conservative
            lm = textops.lm_surprisal_scores(docs).select(
                "doc_id", "lm_ok"
            )
            out = (
                out.join(lm, "doc_id", "left")
                .withColumn("lm_ok", F.coalesce("lm_ok", F.lit(False)))
                .withColumn("kept", F.col("kept") & F.col("lm_ok"))
            )
        if args.kept_only:
            out = out.filter("kept").select("doc_id")
        out.write.mode("overwrite").parquet(args.output)

    written = spark.read.parquet(args.output)
    n_docs = written.count()
    n_kept = (
        n_docs if args.kept_only
        else written.filter("kept").count()
    )
    print(json.dumps({"docs": n_docs, "kept": n_kept}))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
