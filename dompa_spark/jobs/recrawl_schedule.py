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
only when its directory carries BOTH the _SUCCESS marker (the
parquet commit) and a _PAIR.json marker naming the (old, new)
snapshot pair it was diffed from (fingerprint of the input paths +
their file inventories, written strictly after the parquet commit).
--cycle defaults to max(completed)+1, and re-running after a crash
is the happy-path command: a cycle directory without _SUCCESS is
invisible and simply overwritten, while a rerun whose snapshot pair
matches an already-completed cycle takes the schedule-only recovery
path — the diff is skipped, the schedule is recomputed from the log,
and nothing is double-counted ("diffed once, ever" holds across
every crash window, including a crash between the schedule write and
the process exit). Two refusals guard the invariant: a completed
cycle number with a genuinely different pair, and a fresh cycle
number with an already-covered pair (either would double-count
observations). A third refusal guards the DATA: a cycle dir with
_SUCCESS but no _PAIR.json (a pre-marker-era log, or a crash in the
narrow window between the parquet commit and the marker write) is an
orphan of unknown provenance — the job stops and demands either an
explicit --cycle N re-diff of that slot or --adopt-orphans, never
silently renumbering over committed history or dropping it from the
schedule. The log read also goes through the completed-cycle list
only, so a partial write can never leak rows into a schedule.

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


PAIR_MARKER = "_PAIR.json"


def _fs(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p, p.getFileSystem(spark._jsc.hadoopConfiguration())


def _pair_fingerprint(spark, old: str, new: str) -> str:
    """Deterministic id for an (old, new) snapshot pair: md5 over each
    side's path plus its RECURSIVE data-file inventory
    (relative-path:length:mtime, sorted). Recursion matters:
    partitioned snapshots keep their data files in subdirectories, and
    a top-level listing would reduce the fingerprint to the two paths
    alone — overwriting a path with fresh data would then be
    misdetected as the already-diffed pair and silently skipped. The
    inventory makes the fingerprint track the snapshot CONTENT a path
    points at, so fresh data yields a new pair (append is then
    correct), while re-running the same command after a crash — which
    rewrites nothing under either snapshot — yields the same one."""
    import hashlib

    sides = []
    for label, path in (("old", old), ("new", new)):
        jvm, p, fs = _fs(spark, path)
        inv = []
        if fs.exists(p):
            qroot = str(fs.makeQualified(p))
            it = fs.listFiles(p, True)  # recursive
            while it.hasNext():
                st = it.next()
                rel = str(st.getPath())[len(qroot):].lstrip("/")
                # skip marker/hidden files and anything under a
                # hidden directory (_temporary staging etc.)
                if any(seg.startswith(("_", "."))
                       for seg in rel.split("/")):
                    continue
                # mtime guards against a rewrite that happens to
                # reproduce identical file names AND lengths (fixed-
                # schema parquet of the same row count can): same-name
                # same-length fresh data still yields a new pair
                inv.append(
                    f"{rel}:{st.getLen()}:{st.getModificationTime()}"
                )
        sides.append(
            f"{label}={fs.makeQualified(p)}|{','.join(sorted(inv))}"
        )
    return hashlib.md5("||".join(sides).encode()).hexdigest()


def _write_pair_marker(spark, cycle_path: str, payload: dict) -> None:
    """Write _PAIR.json into the cycle dir strictly AFTER the parquet
    commit — it is the cycle's completion signal (underscore prefix:
    Spark's parquet reader ignores it, like _SUCCESS)."""
    jvm, _, fs = _fs(spark, cycle_path)
    p = jvm.org.apache.hadoop.fs.Path(cycle_path, PAIR_MARKER)
    out = fs.create(p, True)
    out.write(bytearray(json.dumps(payload).encode()))
    out.close()


def _read_pair_marker(spark, cycle_path: str) -> dict | None:
    jvm, _, fs = _fs(spark, cycle_path)
    p = jvm.org.apache.hadoop.fs.Path(cycle_path, PAIR_MARKER)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        txt = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()  # IOUtils.toString does not close its argument
    return json.loads(txt)


def _completed_cycles(
    spark, obs_root: str
) -> tuple[list[int], list[int]]:
    """(complete, orphan) cycle numbers. Complete = the partition
    directory carries BOTH _SUCCESS and _PAIR.json; the marker is
    written after the parquet commit, so a crash before _SUCCESS
    leaves the cycle invisible and rerun-the-same-command overwrites
    it. Orphan = _SUCCESS without _PAIR.json: committed parquet of
    UNKNOWN provenance — either a pre-marker-era log or a crash in the
    narrow window between the parquet commit and the marker write.
    Orphans are surfaced, never guessed at: main() refuses to run past
    them without an explicit operator decision (silently overwriting
    one destroys history; silently skipping one drops its observations
    from every schedule)."""
    jvm, root, fs = _fs(spark, obs_root)
    if not fs.exists(root):
        return [], []
    complete, orphan = [], []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("cycle=")):
            continue
        ok = jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
        pair = jvm.org.apache.hadoop.fs.Path(st.getPath(), PAIR_MARKER)
        if fs.exists(ok):
            (complete if fs.exists(pair) else orphan).append(
                int(name.split("=", 1)[1])
            )
    return sorted(complete), sorted(orphan)


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
    p.add_argument("--adopt-orphans", action="store_true",
                   help="stamp cycle dirs that have _SUCCESS but no "
                        "_PAIR.json (pre-marker-era logs, or a crash "
                        "between the parquet commit and the marker "
                        "write) with an unknown-pair marker, adopting "
                        "their observations into the schedule")
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

    cycles, orphans = _completed_cycles(spark, args.obs)
    if orphans and args.adopt_orphans:
        # operator vouches for the orphan data: adopt it as completed-
        # with-unknown-pair (pair_fp None never matches a real
        # fingerprint, so adopted cycles can't satisfy the covered-pair
        # recovery path — they only count in numbering + the schedule)
        for c in orphans:
            _write_pair_marker(spark, f"{args.obs}/cycle={c}", {
                "pair_fp": None, "adopted": True, "cycle": c,
            })
        cycles = sorted(cycles + orphans)
        orphans = []
    if orphans and args.cycle not in orphans:
        # refuse rather than guess: the default cycle pick would
        # renumber over an orphan (destroying committed history) and
        # the schedule read would silently drop its observations
        raise ValueError(
            f"geometry: cycle dir(s) {orphans} in {args.obs} have "
            "_SUCCESS but no _PAIR.json (pre-marker log, or a crash "
            "between the parquet commit and the marker write). Either "
            "re-diff the crashed cycle explicitly with --cycle N and "
            "its snapshot pair, or pass --adopt-orphans to keep the "
            "data as-is with an unknown-pair marker"
        )
    pair_fp = _pair_fingerprint(spark, args.old, args.new)
    covered = next(
        (
            c for c in cycles
            if (_read_pair_marker(spark, f"{args.obs}/cycle={c}")
                or {}).get("pair_fp") == pair_fp
        ),
        None,
    )
    cycle = args.cycle if args.cycle is not None else (
        covered if covered is not None
        else ((max(cycles) + 1) if cycles else 0)
    )
    if covered is not None and (args.cycle in (None, covered)):
        # schedule-only recovery: this exact snapshot pair is already
        # a completed cycle (e.g. a crash hit between the obs commit
        # and the schedule write). Skip the diff — diffed once, ever —
        # and just recompute the schedule from the log below.
        cycle, recovered = covered, True
    elif covered is not None:
        # an explicit FRESH cycle number cannot re-diff an
        # already-covered pair either — that would double-count every
        # observation (inflated n_obs, halved intervals)
        raise ValueError(
            f"geometry: snapshot pair already diffed as cycle "
            f"{covered} in {args.obs} — observations are diffed once, "
            f"ever; rerun without --cycle (or with --cycle {covered}) "
            "for the schedule-only recovery path"
        )
    elif cycle in cycles:
        raise ValueError(
            f"geometry: cycle {cycle} is already COMPLETED in "
            f"{args.obs} from a DIFFERENT snapshot pair — "
            "observations are diffed once, ever; a crashed partial "
            "cycle carries no _PAIR.json and is simply re-run, and a "
            "same-pair rerun takes the schedule-only recovery path"
        )
    else:
        recovered = False

    cycle_path = f"{args.obs}/cycle={cycle}"
    if not recovered:
        old = spark.read.parquet(args.old)
        new = spark.read.parquet(args.new)
        diff = textops.corpus_diff(old, new)
        obs_new = diff.select("doc_id", "status")
        # overwrite: re-running a crashed partial cycle is the
        # recovery path (a cycle counts as done only once _SUCCESS
        # AND _PAIR.json both exist)
        obs_new.write.mode("overwrite").parquet(cycle_path)
        _write_pair_marker(spark, cycle_path, {
            "pair_fp": pair_fp, "old": args.old, "new": args.new,
            "cycle": cycle,
        })

    # read the log through the completed-cycle list (+ this run's
    # fresh write) so a partial directory can never leak rows
    good_paths = [
        f"{args.obs}/cycle={c}" for c in cycles if c != cycle
    ] + [cycle_path]
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
    if recovered:
        stats["recovered"] = True
    print(json.dumps(stats))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
