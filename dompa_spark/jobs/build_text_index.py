#!/usr/bin/env python3
"""spark-submit entry point for the BM25 text-index lifecycle: tokenize
and aggregate ONCE, persist the three index tables, then serve any
number of search jobs from the persisted index without re-reading the
corpus — the 10^12-doc deployment shape (index construction is a
scheduled batch job; searches are cheap and frequent).

    # build: postings + dictionary + docstats from the documents table
    spark-submit --py-files dompa_spark.zip \
        dompa_spark/jobs/build_text_index.py --mode build \
        --input /path/documents --index /path/index \
        [--postings-parts 32]

    # search: BM25 top-k for explicit queries from the persisted index
    spark-submit --py-files dompa_spark.zip \
        dompa_spark/jobs/build_text_index.py --mode search \
        --index /path/index --query "big data,stream join" \
        --output /path/topk [--topk 5]

Index layout (parquet tables ARE the interface — any engine can read
them; the build_ann_index layout philosophy):
    {index}/postings/    (term, doc_id, tf)  repartitioned + sorted on
                         term, so a search's term IN-list predicate
                         prunes parquet row groups at the scan — the
                         search job reads the queried posting lists,
                         not the index
    {index}/dictionary/  (term, df_w, cf)
    {index}/docstats/    (doc_id, dl)
    {index}/params.json  collection stats (n_docs, n_tokens) + scoring
                         constants (k1, b) — search mode refuses
                         mismatched k1/b flags instead of silently
                         scoring with different constants than the
                         BENCH'd build

Build stats (one JSON line): docs, terms, posting rows, tokens.
Search stats: queries, result rows.

Determinism: the index is pure integer aggregates of the corpus, so
'rerun the build' IS the resume story; scores are textops._bm25_rank's
fixed-point sums — a search against the persisted index reproduces the
fused bm25_topk/bm25_search answers bit-identically.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="dompa_spark BM25 index")
    p.add_argument("--mode", default="build", choices=["build", "search"])
    p.add_argument("--input", default=None,
                   help="documents parquet (doc_id, text) [build]")
    p.add_argument("--index", required=True)
    p.add_argument("--query", default=None,
                   help="comma-separated queries of space-separated "
                        "terms [search]")
    p.add_argument("--output", default=None, help="top-k parquet [search]")
    p.add_argument("--postings-parts", type=int, default=None,
                   help="shuffle partitions for the postings table "
                        "[build; default: session shuffle partitions]")
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--k1", type=float, default=None)
    p.add_argument("--b", type=float, default=None)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dompa_spark import pipeline, textops

    builder = SparkSession.builder.appName("dompa-spark-text-index")
    if args.master:
        builder = builder.master(args.master)
    owns_session = SparkSession.getActiveSession() is None
    spark = pipeline.session_confs(builder).getOrCreate()

    post_path = f"{args.index}/postings"
    dict_path = f"{args.index}/dictionary"
    dstat_path = f"{args.index}/docstats"
    params_path = f"{args.index}/params.json"

    if args.mode == "build":
        if not args.input:
            p.error("build mode requires --input")
        docs = spark.read.parquet(args.input)
        postings, dictionary, docstats = textops.bm25_index(docs)
        parts = args.postings_parts or int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        # term-clustered layout: every term's postings land in one
        # partition, sorted — min/max row-group stats make a search's
        # term IN-list prune to the queried lists at the scan
        (
            postings.repartition(parts, F.col("term"))
            .sortWithinPartitions("term", "doc_id")
            .write.mode("overwrite")
            .parquet(post_path)
        )
        dictionary.write.mode("overwrite").parquet(dict_path)
        docstats.write.mode("overwrite").parquet(dstat_path)
        st = (
            spark.read.parquet(dstat_path)
            .agg(
                F.count(F.when(F.col("dl") >= 1, 1)).alias("n_docs"),
                F.sum("dl").alias("n_tokens"),
            )
            .first()
        )
        params = {
            "n_docs": int(st.n_docs),
            "n_tokens": int(st.n_tokens),
            "k1": args.k1 if args.k1 is not None else textops.BM25_K1,
            "b": args.b if args.b is not None else textops.BM25_B,
        }
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(params_path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        out = fs.create(hpath, True)
        out.write(bytearray(json.dumps(params).encode()))
        out.close()
        stats = {
            "mode": "build",
            "docs": params["n_docs"],
            "tokens": params["n_tokens"],
            "terms": spark.read.parquet(dict_path).count(),
            "posting_rows": spark.read.parquet(post_path).count(),
        }
    else:
        if not (args.query and args.output):
            p.error("search mode requires --query and --output")
        params = json.loads(
            "".join(r.value for r in spark.read.text(params_path).collect())
        )
        for flag, key in [(args.k1, "k1"), (args.b, "b")]:
            if flag is not None and flag != params[key]:
                raise SystemExit(
                    f"index params mismatch: --{key}={flag} but index "
                    f"was built with {key}={params[key]}"
                )
        qrows = [
            (qid, term)
            for qid, qtext in enumerate(args.query.split(","))
            for term in qtext.split()
        ]
        qterms = spark.createDataFrame(
            qrows, "query_id long, term string"
        )
        # the query-term list is a bounded CLI literal, so it reaches
        # the postings scan as a pushed-down IN filter (row-group
        # pruning on the term-sorted layout); the broadcast join then
        # attaches query_id/df_w
        term_list = sorted({t for _, t in qrows})
        postings = spark.read.parquet(post_path).filter(
            F.col("term").isin(term_list)
        )
        dictionary = spark.read.parquet(dict_path).filter(
            F.col("term").isin(term_list)
        )
        stats_df = spark.createDataFrame(
            [(params["n_docs"], params["n_tokens"])],
            "n_docs long, n_tokens long",
        )
        top = textops.bm25_search(
            qterms,
            postings,
            dictionary,
            spark.read.parquet(dstat_path),
            stats=stats_df,
            k1=params["k1"],
            b=params["b"],
            topk=args.topk,
        )
        top.write.mode("overwrite").parquet(args.output)
        got = spark.read.parquet(args.output)
        stats = {
            "mode": "search",
            "queries": got.select("query_id").distinct().count(),
            "rows": got.count(),
        }
    print(json.dumps(stats))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
