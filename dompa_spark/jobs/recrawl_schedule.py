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

Cycle numbers are the resume contract: a cycle counts as existing
only when its directory carries the _SUCCESS marker (the
pretrain_corpus stage convention). --cycle defaults to
max(completed)+1, a COMPLETED cycle is refused (re-running the same
pair must not double-count observations), and a crashed partial
cycle directory is simply overwritten by re-running the same cycle —
which is exactly what the default picks after a crash, so the
recovery path and the happy path are the same command. The log read
also goes through the completed-cycle list only, so a partial
write can never leak rows into a schedule.

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


def _completed_cycles(spark, obs_root: str) -> list[int]:
    """Cycle numbers whose partition directory carries _SUCCESS —
    partial (crashed) writes are invisible to both the duplicate-cycle
    refusal and the schedule read."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(obs_root)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("cycle=")):
            continue
        ok = jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
        if fs.exists(ok):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


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

    cycles = _completed_cycles(spark, args.obs)
    cycle = args.cycle if args.cycle is not None else (
        (max(cycles) + 1) if cycles else 0
    )
    if cycle in cycles:
        raise ValueError(
            f"geometry: cycle {cycle} is already COMPLETED in "
            f"{args.obs} — observations are diffed once, ever; a "
            "crashed partial cycle would not carry _SUCCESS and can "
            "be re-run with the same number"
        )

    old = spark.read.parquet(args.old)
    new = spark.read.parquet(args.new)
    diff = textops.corpus_diff(old, new)
    obs_new = diff.select("doc_id", "status")
    # overwrite: re-running a crashed partial cycle is the recovery
    # path (only _SUCCESS-marked cycles count as done)
    cycle_path = f"{args.obs}/cycle={cycle}"
    obs_new.write.mode("overwrite").parquet(cycle_path)

    # read the log through the completed-cycle list (+ this run's
    # fresh write) so a partial directory can never leak rows
    good_paths = [f"{args.obs}/cycle={c}" for c in cycles] + [
        cycle_path
    ]
    all_obs = spark.read.option("basePath", args.obs).parquet(
        *good_paths
    )
    kw = {}
    if args.base_days is not None:
        kw["base_days"] = args.base_days
    sched = textops.recrawl_priority(all_obs, **kw)
    sched.write.mode("overwrite").parquet(args.output)

    sched_read = spark.read.parquet(args.output)
    # status counts from the just-WRITTEN cycle partition — rerunning
    # the diff plan (two fingerprint scans + a full-outer join) for a
    # stats line would double the job's dominant cost
    by_status = {
        r["status"]: r["n"]
        for r in spark.read.parquet(cycle_path)
        .groupBy("status")
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
