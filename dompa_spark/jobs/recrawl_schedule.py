#!/usr/bin/env python3
"""spark-submit entry point for recrawl scheduling — the loop that
closes the incremental-crawl family:

    spark-submit --py-files dompa_spark.zip \
        dompa_spark/jobs/recrawl_schedule.py \
        --old /path/snapshot_prev --new /path/snapshot_curr \
        --obs /path/obs_log --output /path/schedule \
        [--cycle N] [--base-days 64]

Each crawl cycle: diff the new snapshot against the previous one
(textops.corpus_diff — per doc added/changed/unchanged/removed),
APPEND the verdicts to a hive-partitioned observation log
(obs/cycle=N — append-only, one directory per cycle, the
incremental_dedup save-sigs philosophy: each snapshot pair is
diffed once, ever), then compute fetch intervals over the FULL
accumulated history (textops.recrawl_priority: change-rate-
proportional halving, removed URLs leave the schedule until a later
'added' revives them).

Cycle numbers are the resume contract: --cycle defaults to
max(existing)+1, and a cycle that already exists in the log is
REFUSED (the run_extract changed-geometry pattern) — re-running the
same pair must not double-count observations.

Scale shape: corpus_diff moves two slim (doc_id, fp) projections
(exchange-free when the snapshots are doc_id-bucketed); the log
append writes only the new cycle's slim rows; recrawl_priority is one
partial-aggregatable groupBy over the log. Nothing here rescans
document text beyond the two fingerprint map passes.
"""

from __future__ import annotations

import argparse
import json
import sys


def _exists(spark, path: str) -> bool:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="dompa_spark recrawl scheduling"
    )
    p.add_argument("--old", required=True,
                   help="previous snapshot parquet (doc_id, text)")
    p.add_argument("--new", required=True,
                   help="current snapshot parquet (doc_id, text)")
    p.add_argument("--obs", required=True,
                   help="observation log root (hive-partitioned "
                        "cycle=N subdirs, append-only)")
    p.add_argument("--output", required=True,
                   help="schedule parquet (one row per doc ever seen)")
    p.add_argument("--cycle", type=int, default=None,
                   help="cycle number for this diff (default: "
                        "max(existing)+1, or 0 for a fresh log)")
    p.add_argument("--base-days", type=int, default=None)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dompa_spark import pipeline, textops

    builder = SparkSession.builder.appName("dompa-spark-recrawl")
    if args.master:
        builder = builder.master(args.master)
    owns_session = SparkSession.getActiveSession() is None
    spark = pipeline.session_confs(builder).getOrCreate()

    have_log = _exists(spark, args.obs)
    if have_log:
        existing = spark.read.parquet(args.obs)
        cycles = sorted(
            r["cycle"]
            for r in existing.select("cycle").distinct().collect()
        )
    else:
        cycles = []
    cycle = args.cycle if args.cycle is not None else (
        (max(cycles) + 1) if cycles else 0
    )
    if cycle in cycles:
        raise ValueError(
            f"geometry: cycle {cycle} already exists in {args.obs} — "
            "observations are append-only; pick a new --cycle"
        )

    old = spark.read.parquet(args.old)
    new = spark.read.parquet(args.new)
    diff = textops.corpus_diff(old, new)
    obs_new = diff.select("doc_id", "status")
    obs_new.write.mode("errorifexists").parquet(
        f"{args.obs}/cycle={cycle}"
    )

    all_obs = spark.read.parquet(args.obs)
    kw = {}
    if args.base_days is not None:
        kw["base_days"] = args.base_days
    sched = textops.recrawl_priority(all_obs, **kw)
    sched.write.mode("overwrite").parquet(args.output)

    sched_read = spark.read.parquet(args.output)
    by_status = {
        r["status"]: r["n"]
        for r in diff.groupBy("status")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    stats = {
        "cycle": cycle,
        "docs_diffed": sum(by_status.values()),
        "added": by_status.get("added", 0),
        "changed": by_status.get("changed", 0),
        "unchanged": by_status.get("unchanged", 0),
        "removed": by_status.get("removed", 0),
        "scheduled": sched_read.filter(
            "interval_days IS NOT NULL"
        ).count(),
        "dead": sched_read.filter("interval_days IS NULL").count(),
    }
    print(json.dumps(stats))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
