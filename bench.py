#!/usr/bin/env python3
"""Benchmark harness.

Default mode: one JSON line with end-to-end extraction throughput on a
deterministic synthesized spans corpus (scaled by SF) plus per-query
wall times at $SPARK_GRAFT_SF_DIR.

    SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    (default 32)

--scaling: run the same extraction job at local[8] and local[32] on the
same corpus and report throughput + scaling efficiency (the sandbox
proxy for the N-vs-4N-executors criterion; see BASELINE.md), updating
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_DOCS_PER_SF = 600_000  # sf0.1 -> 60k docs (~160 MB with heavy tail)


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_corpus(sf: float, n_docs: int | None = None) -> tuple[str, int]:
    from dompa_spark import corpus

    if n_docs is None:
        n_docs = max(1000, int(BENCH_DOCS_PER_SF * sf))
    path = os.path.join(REPO, ".bench", f"corpus-{n_docs}")
    marker = os.path.join(path, "_COMPLETE")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        corpus.write_corpus(path, n_docs)
        with open(marker, "w") as f:
            f.write(str(n_docs))
    return path, n_docs


def make_spark(cpus: int, event_log_dir: str | None = None):
    from pyspark.sql import SparkSession

    from dompa_spark.pipeline import session_confs

    # local-mode python workers inherit the JVM's env, which inherits
    # ours: make dompa_spark importable on executors regardless of the
    # caller's cwd
    os.environ["PYTHONPATH"] = (
        REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"dompa-bench-{cpus}")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", str(max(32, cpus * 4)))
        .config("spark.ui.enabled", "false")
    )
    if event_log_dir:
        os.makedirs(event_log_dir, exist_ok=True)
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", f"file://{event_log_dir}")
            .config("spark.eventLog.compress", "false")
        )
    return session_confs(builder).getOrCreate()


def parse_event_log(event_log_dir: str) -> dict:
    """Sum task metrics over every application log in the dir:
    executor run/CPU/GC time and shuffle bytes. CPU time is reported by
    Spark in ns; run/GC in ms — all normalized to ms here."""
    agg = {
        "executor_run_ms": 0,
        "executor_cpu_ms": 0,
        "jvm_gc_ms": 0,
        "shuffle_write_bytes": 0,
        "shuffle_read_bytes": 0,
        "tasks": 0,
    }
    paths = []
    for root, _dirs, files in os.walk(event_log_dir):
        for name in files:
            # Spark 4 rolling layout: eventlog_v2_<app>/events_1_<app>
            # plus an empty appstatus_* marker
            if name.startswith("appstatus"):
                continue
            paths.append(os.path.join(root, name))
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                m = ev.get("Task Metrics") or {}
                agg["tasks"] += 1
                agg["executor_run_ms"] += m.get("Executor Run Time", 0)
                agg["executor_cpu_ms"] += int(
                    m.get("Executor CPU Time", 0) / 1e6
                )
                agg["jvm_gc_ms"] += m.get("JVM GC Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                agg["shuffle_write_bytes"] += sw.get(
                    "Shuffle Bytes Written", 0
                )
                sr = m.get("Shuffle Read Metrics") or {}
                agg["shuffle_read_bytes"] += sr.get(
                    "Remote Bytes Read", 0
                ) + sr.get("Local Bytes Read", 0)
    return agg


def corpus_stats(spark, corpus_path: str):
    from pyspark.sql import functions as F

    from dompa_spark import pipeline

    df = pipeline.read_input(spark, corpus_path)
    row = df.select(
        F.count("*").alias("docs"),
        F.sum(
            F.aggregate(
                "spans",
                F.lit(0).cast("long"),
                lambda a, s: a + F.coalesce(F.length(s["text"]), F.lit(0)),
            )
        ).alias("chars"),
    ).first()
    return row.docs, row.chars


# Fixed partition layout across parallelism levels (the scaling runs must
# shuffle the same layout; 80 parts >= 2 x 32 tasks — BASELINE.md protocol)
BENCH_LIGHT_PARTS = 64
BENCH_HEAVY_PARTS = 16


def run_extraction(
    spark, corpus_path: str, out_path: str, passthrough: bool = False
) -> float:
    from dompa_spark import pipeline

    shutil.rmtree(out_path, ignore_errors=True)
    t0 = time.time()
    pipeline.run_extract(
        spark,
        corpus_path,
        out_path,
        light_parts=BENCH_LIGHT_PARTS,
        heavy_parts=BENCH_HEAVY_PARTS,
        resume=False,
        passthrough=passthrough,
    )
    return time.time() - t0


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    times = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        # operator-internal .cache() calls are scoped to one invocation;
        # drop their blocks so the loop doesn't accumulate dead cached
        # partitions across 36 queries (caller-owned cache lifecycle)
        spark.catalog.clearCache()
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)

    if "--scaling" in sys.argv:
        # Scaling needs a corpus big enough that compute dominates fixed
        # job overhead, else the 8-vs-32 signal drowns (~10 s of setup,
        # scan and commit costs are parallelism-independent).
        corpus_path, n_docs = ensure_corpus(
            sf, int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "240000"))
        )
        # --noop: swap the parse/extract kernel for an identity copy —
        # measures the JVM/shuffle/Arrow/parquet ceiling in isolation so
        # BENCH.md can split "kernel scaling" from "JVM overhead scaling".
        passthrough = "--noop" in sys.argv
        # SPARK_GRAFT_SCALING_LEVELS picks the N,4N pair: "8,32" (default)
        # stresses the shared DRAM bus at the top level; "2,8" keeps both
        # levels under bus saturation — the closer proxy for adding
        # machines, where 4x executors bring 4x memory buses (BENCH.md).
        lo, hi = (
            int(v) for v in os.environ.get(
                "SPARK_GRAFT_SCALING_LEVELS", "8,32").split(",")
        )
        reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
        # Warm-JVM protocol: per level, untimed warm-up runs absorb C2
        # JIT + Python-worker spin-up (parallelism-independent costs that
        # would masquerade as poor scaling; a real 10^12-doc job runs
        # warm its whole life), then `reps` timed runs in the same warm
        # JVM; best-of-reps guards against host-load spikes (the sandbox
        # VM shares a host with nonzero steal time). All lo reps run
        # before all hi reps — slow host drift between the level blocks
        # is visible as rep-to-rep spread, which we report.
        # The timed reps run in a SECOND SparkContext with the event log
        # enabled (same JVM — py4j gateway survives stop()), so per-task
        # run/CPU/GC/shuffle metrics cover exactly the timed reps.
        results: dict[int, list[float]] = {lo: [], hi: []}
        metrics: dict[int, dict] = {}
        docs = chars = 0
        for n in (lo, hi):
            out_dir = f"/tmp/dompa_bench_out_{n}"
            spark = make_spark(n)
            if n == lo:
                docs, chars = corpus_stats(spark, corpus_path)
            for _w in range(
                int(os.environ.get("SPARK_GRAFT_SCALING_WARMUPS", "2"))
            ):
                run_extraction(spark, corpus_path, out_dir, passthrough)
            spark.stop()
            elog = f"/tmp/dompa_bench_elog_{n}"
            shutil.rmtree(elog, ignore_errors=True)
            spark = make_spark(n, event_log_dir=elog)
            for _rep in range(reps):
                wall = run_extraction(
                    spark, corpus_path, out_dir, passthrough
                )
                results[n].append(round(wall, 2))
            spark.stop()
            m = parse_event_log(elog)
            m["walls"] = results[n]
            metrics[n] = m
        best_lo, best_hi = min(results[lo]), min(results[hi])
        thr_lo = docs / best_lo
        thr_hi = docs / best_hi
        eff = (thr_hi / thr_lo) / (hi / lo)
        label = "noop" if passthrough else "extract"
        out = {
            "metric": f"scaling efficiency local[{lo}]->local[{hi}]"
            + (" (noop kernel)" if passthrough else ""),
            "value": round(eff, 3),
            "unit": "ratio",
            "docs": docs,
            "chars": chars,
            f"walls_{lo}": results[lo],
            f"walls_{hi}": results[hi],
            f"docs_per_sec_{lo}": round(thr_lo, 1),
            f"docs_per_sec_{hi}": round(thr_hi, 1),
            f"task_metrics_{lo}": metrics[lo],
            f"task_metrics_{hi}": metrics[hi],
            "sf": sf,
        }
        # Persist so default-mode bench runs (the per-round BENCH_r{N}.json)
        # carry the latest measured N-vs-4N evidence alongside throughput.
        try:
            with open(os.path.join(REPO, "SCALING.json")) as f:
                cache = json.load(f)
        except (OSError, ValueError):
            cache = {}
        cache[f"local[{lo}]->local[{hi}]:{label}"] = out
        with open(os.path.join(REPO, "SCALING.json"), "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
        print(json.dumps(out))
        return

    if "--recall" in sys.argv:
        run_recall_sweep(sf_dir, cpus, sf)
        return

    corpus_path, n_docs = ensure_corpus(sf)
    spark = make_spark(cpus)
    docs, chars = corpus_stats(spark, corpus_path)
    # First run in a fresh JVM pays C2 JIT + worker-pool spin-up (~2x the
    # warm wall); report the warm wall — the steady state a long job runs
    # at — and keep the cold one as a separate field.
    cold_wall = run_extraction(spark, corpus_path, "/tmp/dompa_bench_out")
    # full C2 steady state takes ~3 runs; best-of-3 after the cold run
    wall = min(
        run_extraction(spark, corpus_path, "/tmp/dompa_bench_out")
        for _ in range(3)
    )
    qtimes = time_queries(spark, sf_dir)
    spark.stop()
    try:
        with open(os.path.join(REPO, "SCALING.json")) as f:
            scaling_cache = json.load(f)
    except (OSError, ValueError):
        scaling_cache = {}
    # cold_wall/chars are measured for BENCH.md sessions but no longer
    # ride the byte-budgeted final line
    _ = (cold_wall, chars)
    print(json.dumps(
        build_output(wall, qtimes, sf, docs, cpus, scaling_cache)
    ))


def run_recall_sweep(sf_dir: str, cpus: int, sf: float) -> None:
    """--recall: recall@5 of the approximate ANN paths vs exact brute
    force across their quality knobs (LSH multi-probe planes, IVF
    n_probe) on $SPARK_GRAFT_SF_DIR's embeddings — the table a pipeline
    tunes dedup/search aggressiveness against (VERDICT r03 #3). Writes
    RECALL.json and prints one JSON line; the default-knob floor is
    pinned by test_ann_recall_floor, the BENCH.md table is pasted from
    this output."""
    from __spark_entry__ import EMBED_DIM, _emb
    from dompa_spark import textops

    spark = make_spark(cpus)
    emb = _emb(spark, sf_dir).cache()
    n_vecs = emb.count()  # materialize once; every sweep point reuses it
    rows = []
    for planes in (4, 6, 8, 10):
        r = {x["method"]: x for x in map(
            lambda p: p.asDict(),
            textops.ann_recall(emb, dim=EMBED_DIM, lsh_planes=planes)
            .collect(),
        )}
        rows.append({"knob": "lsh_planes", "value": planes,
                     "recall_at_5": r["lsh"]["recall_at_k"]})
    for probe in (1, 2, 4, 8, 16):
        r = {x["method"]: x for x in map(
            lambda p: p.asDict(),
            textops.ann_recall(emb, dim=EMBED_DIM, ivf_probe=probe)
            .collect(),
        )}
        rows.append({"knob": "ivf_probe", "value": probe,
                     "recall_at_5": r["ivf"]["recall_at_k"]})
    emb.unpersist()
    spark.stop()
    out = {"metric": "ann_recall_sweep", "unit": "recall@5", "sf": sf,
           "n_vecs": n_vecs, "dim": EMBED_DIM,
           "defaults": {"lsh_planes": textops.ANN_LSH_PLANES,
                        "ivf_probe": textops.IVF_PROBE,
                        "ivf_centroids": textops.IVF_CENTROIDS},
           "sweep": rows}
    with open(os.path.join(REPO, "RECALL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def build_output(
    wall: float,
    qtimes: dict[str, float],
    sf: float,
    docs: int,
    cpus: int,
    scaling_cache: dict,
) -> dict:
    """Build the single-line JSON the driver captures.

    The driver's tail buffer is exactly 2,000 bytes: if this line runs
    longer, the captured tail starts MID-LINE and the round's perf
    evidence comes back `"parsed": null` (it did, twice — r02 embedded
    task_metrics, r03's 110-char metric prose + 3-decimal walls pushed
    the line to 2,133 bytes). Everything here is therefore byte-budgeted:
    slug metric, 2-decimal walls, and a scaling attach holding ONLY
    the efficiency value per pair under a shortened key (full protocol
    detail — walls, docs/sec, task metrics, corpus size, cold wall,
    MB/s — lives in SCALING.json / BENCH.md). tests/test_bench_output.py
    pins the budget at < 1,900 bytes with 68 worst-case query keys
    (live set: 62), and the degradation loop below makes overflow
    structurally impossible even if the set keeps growing.
    """
    out = {
        "metric": "e2e_extract_wall",  # read->salt->kernel->write+manifest
        "value": round(wall, 3),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in qtimes.items()},
        "sf": sf,
        "docs": docs,
        "docs_per_sec": round(docs / wall, 1),
        # mb_per_sec and cold_wall_sec were cut from the line when the
        # query set outgrew the old budget (they live in BENCH.md);
        # key "local[2]->local[8]:extract" -> "2-8:e"; one efficiency
        # number per pair (full detail in SCALING.json)
        "cpus": cpus,
        "scaling": {
            k.replace("local[", "")
            .replace("]", "")
            .replace("->", "-")
            .replace(":extract", ":e")
            .replace(":noop", ":n"): v["value"]
            for k, v in scaling_cache.items()
        },
    }
    # Byte-aware self-protection: the budget must hold even in a
    # pathological session where every query wall blows out to 2-3
    # digits (exactly the session whose evidence matters most).
    # Degrade deterministically: first coarsen walls to 1 decimal,
    # then drop the FASTEST queries (the slow ones are the
    # informative ones), recording how many were cut.
    budget = 1880
    if len(json.dumps(out)) > budget:
        out["queries"] = {k: round(v, 1) for k, v in qtimes.items()}
    omitted = 0
    while len(json.dumps(out)) > budget and out["queries"]:
        fastest = min(out["queries"], key=lambda k: (out["queries"][k], k))
        del out["queries"][fastest]
        omitted += 1
        out["q_omitted"] = omitted
    return out


if __name__ == "__main__":
    main()
