#!/usr/bin/env python3
"""spark-submit entry point for the extraction job.

    spark-submit --py-files dompa_spark.zip dompa_spark/jobs/extract.py \
        --input  /path/to/interleaved_docs \
        --output /path/to/out \
        [--format parquet|iceberg] [--light-parts N] [--heavy-parts N]
        [--heavy-chars N] [--chunk-parts N] [--no-resume]

The job is resumable: rerunning with the same output path skips
completed chunks (see dompa_spark.pipeline.run_extract).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="dompa_spark extraction job")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument("--light-parts", type=int, default=None)
    p.add_argument("--heavy-parts", type=int, default=None)
    p.add_argument("--heavy-chars", type=int, default=None)
    p.add_argument("--chunk-parts", type=int, default=0)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--master", default=None,
                   help="override master (default: whatever spark-submit set)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from dompa_spark import pipeline

    builder = SparkSession.builder.appName("dompa-spark-extract")
    if args.master:
        builder = builder.master(args.master)
    spark = pipeline.session_confs(builder).getOrCreate()

    kwargs = {}
    if args.light_parts is not None:
        kwargs["light_parts"] = args.light_parts
    if args.heavy_parts is not None:
        kwargs["heavy_parts"] = args.heavy_parts
    if args.heavy_chars is not None:
        kwargs["heavy_chars"] = args.heavy_chars
    stats = pipeline.run_extract(
        spark,
        args.input,
        args.output,
        fmt=args.format,
        chunk_parts=args.chunk_parts,
        resume=not args.no_resume,
        **kwargs,
    )
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
