#!/usr/bin/env python3
"""spark-submit entry point for the IVF-PQ index lifecycle: train ONCE,
persist the three index artifacts, then serve any number of query jobs
from the persisted tables without retraining — the 10^9-vector
deployment shape (index construction is a scheduled batch job; query
jobs are cheap and frequent).

    # build: train coarse centroids + residual PQ codebooks, encode
    spark-submit --py-files dompa_spark.zip \
        dompa_spark/jobs/build_ann_index.py --mode build \
        --input /path/embeddings --index /path/index --dim 64 \
        [--m 4] [--codes 16] [--train-iters 2] [--n-centroids 16]

    # query: ADC top-k from the persisted index
    spark-submit --py-files dompa_spark.zip \
        dompa_spark/jobs/build_ann_index.py --mode query \
        --index /path/index --queries /path/queries \
        --output /path/topk [--topk 5] [--n-probe 2]

Index layout (parquet tables ARE the interface — any engine can read
them):
    {index}/centroids/   (cid, cv)             coarse quantizer
    {index}/codebooks/   (sub, cid, cv)        residual PQ codebooks
    {index}/codes/       (vec_id, sub, code, cid)  compressed corpus
    {index}/params.json geometry guard (dim/m/k/n_centroids) — query
                         mode refuses an index built with different
                         geometry instead of returning wrong distances

Build stats (one JSON line): vectors, lists, list_max/list_mean (the
coarse-quantizer balance gauge — ivf_list_sizes' contract), code rows.
Query stats: queries, result rows.

Determinism: both trainings are the library's exact fixed-point Lloyd
(textops.ivfpq_build), so rebuilding the index from the same input
reproduces it bit-identically — the resume story is 'rerun the build',
no partial-training checkpoints needed.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="dompa_spark IVF-PQ index")
    p.add_argument("--mode", default="build", choices=["build", "query"])
    p.add_argument("--input", default=None,
                   help="embeddings parquet (vec_id, embedding) [build]")
    p.add_argument("--index", required=True)
    p.add_argument("--queries", default=None,
                   help="query vectors parquet (vec_id, embedding) "
                        "[query]")
    p.add_argument("--output", default=None, help="top-k parquet [query]")
    p.add_argument("--dim", type=int, default=None)
    p.add_argument("--m", type=int, default=None)
    p.add_argument("--codes", type=int, default=None)
    p.add_argument("--train-iters", type=int, default=None)
    p.add_argument("--n-centroids", type=int, default=None)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--n-probe", type=int, default=None)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dompa_spark import pipeline, textops

    builder = SparkSession.builder.appName("dompa-spark-ann-index")
    if args.master:
        builder = builder.master(args.master)
    owns_session = SparkSession.getActiveSession() is None
    spark = pipeline.session_confs(builder).getOrCreate()

    cents_path = f"{args.index}/centroids"
    cb_path = f"{args.index}/codebooks"
    codes_path = f"{args.index}/codes"
    params_path = f"{args.index}/params.json"

    if args.mode == "build":
        if not args.input or args.dim is None:
            p.error("build mode requires --input and --dim")
        params = {
            "dim": args.dim,
            "m": args.m or textops.PQ_M,
            "k": args.codes or textops.PQ_CODES,
            "train_iters": (args.train_iters
                            if args.train_iters is not None
                            else textops.PQ_TRAIN_ITERS),
            "n_centroids": args.n_centroids or textops.IVF_CENTROIDS,
        }
        emb = textops._pq_emb(spark.read.parquet(args.input))
        cents, rcb, codes = textops.ivfpq_build(
            emb, params["dim"], params["m"], params["k"],
            params["train_iters"], params["n_centroids"],
        )
        cents.coalesce(1).write.mode("overwrite").parquet(cents_path)
        rcb.coalesce(1).write.mode("overwrite").parquet(cb_path)
        codes.write.mode("overwrite").parquet(codes_path)
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(params_path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        out = fs.create(hpath, True)
        out.write(bytearray(json.dumps(params).encode()))
        out.close()
        sizes = (
            spark.read.parquet(codes_path)
            .filter(F.col("sub") == 0)
            .groupBy("cid").count()
            .agg(
                F.count("*").alias("lists"),
                F.max("count").alias("mx"),
                F.avg("count").alias("mean"),
                F.sum("count").alias("vectors"),
            )
            .first()
        )
        stats = {
            "mode": "build",
            "vectors": sizes.vectors,
            "lists": sizes.lists,
            "list_max": sizes.mx,
            "list_mean": round(sizes.mean, 2),
            "code_rows": spark.read.parquet(codes_path).count(),
        }
    else:
        if not (args.queries and args.output):
            p.error("query mode requires --queries and --output")
        params = json.loads(
            "".join(r.value for r in spark.read.text(params_path).collect())
        )
        for flag, key in [(args.dim, "dim"), (args.m, "m"),
                          (args.codes, "k"),
                          (args.n_centroids, "n_centroids")]:
            if flag is not None and flag != params[key]:
                raise SystemExit(
                    f"index geometry mismatch: --{key}={flag} but index "
                    f"was built with {key}={params[key]}"
                )
        qemb = textops._pq_emb(spark.read.parquet(args.queries))
        top = textops.ivfpq_search(
            qemb,
            spark.read.parquet(cents_path),
            spark.read.parquet(cb_path),
            spark.read.parquet(codes_path),
            params["dim"], params["m"],
            args.n_probe or textops.IVF_PROBE,
            args.topk,
        )
        top.write.mode("overwrite").parquet(args.output)
        got = spark.read.parquet(args.output)
        stats = {
            "mode": "query",
            "queries": got.select("query_id").distinct().count(),
            "rows": got.count(),
        }
    print(json.dumps(stats))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
