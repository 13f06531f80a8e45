#!/usr/bin/env python3
"""spark-submit entry point for the BM25 text-index lifecycle: tokenize
and aggregate ONCE, persist the index tables, then serve any number of
search jobs from the persisted index without re-reading the corpus —
the 10^12-doc deployment shape (index construction is a scheduled
batch job; searches are cheap and frequent; new crawls APPEND deltas
instead of rewriting the main postings, LSM-style, and a rare compact
submit amortizes the rewrite).

    # build: postings + dictionary + docstats from the documents table
    spark-submit --py-files dompa_spark.zip \
        dompa_spark/jobs/build_text_index.py --mode build \
        --input /path/documents --index /path/index \
        [--postings-parts 32]

    # update: append a new crawl as a DELTA (no main-postings rewrite)
    ... --mode update --input /path/new_docs --index /path/index

    # delete: tombstone doc_ids (negative dictionary delta; nothing
    #         rewritten — compact applies removals physically)
    ... --mode delete --input /path/doc_ids --index /path/index

    # compact: merge main + deltas - tombstones into a fresh full index
    ... --mode compact --index /path/index --out-index /path/index2

    # search: BM25 top-k for explicit queries (reads main + deltas)
    ... --mode search --index /path/index \
        --query "big data,stream join" --output /path/topk [--topk 5]

Index layout (parquet tables ARE the interface — any engine can read
them; the build_ann_index layout philosophy):
    {index}/postings/    (term, doc_id, tf)  repartitioned + sorted on
                         term, so a search's term IN-list predicate
                         prunes parquet row groups at the scan — the
                         search job reads the queried posting lists,
                         not the index
    {index}/dictionary/  (term, df_w, cf)
    {index}/docstats/    (doc_id, dl)
    {index}/deltas/dNNNN/{postings,dictionary,docstats}  one per update
    {index}/deltas/dNNNN/{tombstones,dictionary}  one per delete — the
                         dictionary rows carry NEGATIVE df_w/cf so the
                         search-time re-aggregate nets deleted docs out
                         with no rewrite; tombstones anti-join the
                         candidate set (post term-filter, so the cost
                         is candidates, not corpus)
    {index}/params.json  collection stats (n_docs, n_tokens), scoring
                         constants (k1, b — search refuses mismatched
                         flags), delta list

Delete semantics (tombstoned ids stay unusable until compact — the
search anti-join has no generation order, so re-adding under an old
tombstone would silently suppress the new doc; update refuses those
ids and compaction clears them): a delete writes (a) the doc_id
tombstone list and
(b) a dictionary delta holding the NEGATED per-term df_w/cf of exactly
the deleted docs' postings (computed from the index in one pass at
delete time), so SUM-based dictionary merging stays an exact integer
identity: merged == rebuilt-without-the-deleted-docs, bit-identical.
Collection stats in params.json are decremented the same way. Search
excludes tombstoned docs by anti-join AFTER the query-term filter
(cost: candidates) and over docstats (cost: one slim pass).

Update semantics: APPEND-ONLY — an update whose doc_ids intersect the
LIVE indexed set is refused (corpus_diff is the tool that computes a
replace plan); disjointness is exactly what makes delta-merge ==
rebuild: per-term df_w/cf are sums of disjoint partial counts, so the
search-time dictionary re-aggregate reproduces the from-scratch build
bit-identically (pinned by the e2e test). Update cost is the NEW
crawl's tokenization only; nothing existing is rewritten. Search cost
grows with delta count (one more pruned scan each), which is what
compact amortizes on a schedule.

Build stats (one JSON line): docs, terms, posting rows, tokens.
Update stats: docs/tokens added, delta name. Search: queries, rows.

Determinism: the index is pure integer aggregates of the corpus, so
'rerun the build' IS the resume story; scores are textops._bm25_rank's
fixed-point sums — a search against the persisted index reproduces the
fused bm25_topk/bm25_search answers bit-identically.
"""

from __future__ import annotations

import argparse
import json
import sys


def _write_params(spark, path: str, params: dict) -> None:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    out.write(bytearray(json.dumps(params).encode()))
    out.close()


def _read_params(spark, path: str) -> dict:
    return json.loads(
        "".join(r.value for r in spark.read.text(path).collect())
    )


def _index_tables(spark, index: str, params: dict):
    """(postings, dictionary, docstats, tombstones) across main +
    deltas. The dictionary re-aggregate is exact BECAUSE updates are
    append-only disjoint and deletes contribute NEGATED counts:
    per-term df_w/cf are sums of disjoint (signed) partial counts.
    tombstones is None when no delete delta exists. docstats comes
    back tombstone-filtered (slim pass); postings does NOT — callers
    must anti-join tombstones AFTER their own pruning filter so the
    cost is candidates, not corpus."""
    from pyspark.sql import functions as F

    deltas = params.get("deltas", [])
    doc_roots = [index] + [
        f"{index}/deltas/{d['name']}" for d in deltas
        if d["kind"] == "docs"
    ]
    dict_roots = [index] + [
        f"{index}/deltas/{d['name']}" for d in deltas
    ]
    tomb_roots = [
        f"{index}/deltas/{d['name']}" for d in deltas
        if d["kind"] == "tombstones"
    ]
    postings = spark.read.parquet(*[f"{r}/postings" for r in doc_roots])
    docstats = spark.read.parquet(*[f"{r}/docstats" for r in doc_roots])
    dictionary = (
        spark.read.parquet(*[f"{r}/dictionary" for r in dict_roots])
        .groupBy("term")
        .agg(
            F.sum("df_w").cast("long").alias("df_w"),
            F.sum("cf").cast("long").alias("cf"),
        )
        .filter(F.col("df_w") > 0)
    )
    tombstones = None
    if tomb_roots:
        tombstones = spark.read.parquet(
            *[f"{r}/tombstones" for r in tomb_roots]
        ).select("doc_id").distinct()
        docstats = docstats.join(tombstones, "doc_id", "left_anti")
    return postings, dictionary, docstats, tombstones


def _write_index(spark, docs_or_tables, root: str, parts: int):
    """Write one (postings, dictionary, docstats) triple under root,
    postings in the term-clustered layout (see module docstring)."""
    from pyspark.sql import functions as F

    postings, dictionary, docstats = docs_or_tables
    (
        postings.repartition(parts, F.col("term"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(f"{root}/postings")
    )
    dictionary.write.mode("overwrite").parquet(f"{root}/dictionary")
    docstats.write.mode("overwrite").parquet(f"{root}/docstats")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="dompa_spark BM25 index")
    p.add_argument("--mode", default="build",
                   choices=["build", "update", "delete", "compact",
                            "search"])
    p.add_argument("--input", default=None,
                   help="documents parquet (doc_id, text) "
                        "[build/update]; doc_id parquet [delete]")
    p.add_argument("--index", required=True)
    p.add_argument("--out-index", default=None,
                   help="destination for the compacted index [compact]")
    p.add_argument("--query", default=None,
                   help="comma-separated queries of space-separated "
                        "terms [search]")
    p.add_argument("--output", default=None, help="top-k parquet [search]")
    p.add_argument("--postings-parts", type=int, default=None,
                   help="shuffle partitions for the postings table "
                        "[build/update/compact; default: session "
                        "shuffle partitions]")
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

    params_path = f"{args.index}/params.json"
    parts = args.postings_parts or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )

    def collection_stats(docstats_path_or_df):
        df = (
            spark.read.parquet(docstats_path_or_df)
            if isinstance(docstats_path_or_df, str)
            else docstats_path_or_df
        )
        st = df.agg(
            F.count(F.when(F.col("dl") >= 1, 1)).alias("n_docs"),
            F.sum("dl").alias("n_tokens"),
        ).first()
        return int(st.n_docs), int(st.n_tokens or 0)

    if args.mode == "build":
        if not args.input:
            p.error("build mode requires --input")
        docs = spark.read.parquet(args.input)
        _write_index(spark, textops.bm25_index(docs), args.index, parts)
        n_docs, n_tokens = collection_stats(f"{args.index}/docstats")
        params = {
            "n_docs": n_docs,
            "n_tokens": n_tokens,
            "k1": args.k1 if args.k1 is not None else textops.BM25_K1,
            "b": args.b if args.b is not None else textops.BM25_B,
            "deltas": [],
        }
        _write_params(spark, params_path, params)
        stats = {
            "mode": "build",
            "docs": n_docs,
            "tokens": n_tokens,
            "terms": spark.read.parquet(
                f"{args.index}/dictionary"
            ).count(),
            "posting_rows": spark.read.parquet(
                f"{args.index}/postings"
            ).count(),
        }
    elif args.mode == "update":
        if not args.input:
            p.error("update mode requires --input")
        params = _read_params(spark, params_path)
        new_docs = spark.read.parquet(args.input)
        triple = textops.bm25_index(new_docs)
        # append-only contract: doc_ids overlapping the LIVE set would
        # double-count df_w/cf in the delta-merge; TOMBSTONED ids are
        # refused too — the search-time anti-join has no generation
        # order, so a re-added doc would be silently suppressed by its
        # old tombstone. Compact clears tombstones; re-add after that.
        _, _, live_stats, tombs = _index_tables(
            spark, args.index, params
        )
        blocked = live_stats.select("doc_id")
        if tombs is not None:
            blocked = blocked.unionByName(tombs)
        overlap = triple[2].join(blocked, "doc_id").count()
        if overlap:
            raise SystemExit(
                f"update refused: {overlap} doc_ids already indexed "
                "or tombstoned (append-only; compact clears "
                "tombstones; use corpus_diff to plan a replace)"
            )
        dname = f"d{len(params['deltas']):04d}"
        _write_index(
            spark, triple, f"{args.index}/deltas/{dname}", parts
        )
        add_docs, add_tokens = collection_stats(
            f"{args.index}/deltas/{dname}/docstats"
        )
        params["n_docs"] += add_docs
        params["n_tokens"] += add_tokens
        params["deltas"].append({"name": dname, "kind": "docs"})
        _write_params(spark, params_path, params)
        stats = {
            "mode": "update",
            "delta": dname,
            "docs_added": add_docs,
            "tokens_added": add_tokens,
            "deltas": len(params["deltas"]),
        }
    elif args.mode == "delete":
        if not args.input:
            p.error("delete mode requires --input (doc_id parquet)")
        params = _read_params(spark, params_path)
        postings, _, live_stats, _ = _index_tables(
            spark, args.index, params
        )
        del_ids = (
            spark.read.parquet(args.input)
            .select(F.col("doc_id").cast("long").alias("doc_id"))
            .distinct()
            .join(live_stats.select("doc_id"), "doc_id")  # live only
        )
        # one pass over the index postings: the deleted docs' per-term
        # counts, NEGATED, so the SUM-based dictionary merge nets them
        # out as an exact integer identity
        dead_posts = postings.join(del_ids, "doc_id")
        neg_dict = dead_posts.groupBy("term").agg(
            (-F.count(F.when(F.col("tf") >= 1, 1))).cast("long")
            .alias("df_w"),
            (-F.sum("tf")).cast("long").alias("cf"),
        )
        dead = live_stats.join(del_ids, "doc_id").agg(
            F.count(F.when(F.col("dl") >= 1, 1)).alias("n_docs"),
            F.sum("dl").alias("n_tokens"),
        ).first()
        dname = f"d{len(params['deltas']):04d}"
        droot = f"{args.index}/deltas/{dname}"
        del_ids.coalesce(1).write.mode("overwrite").parquet(
            f"{droot}/tombstones"
        )
        neg_dict.write.mode("overwrite").parquet(f"{droot}/dictionary")
        n_del = int(dead.n_docs or 0)
        params["n_docs"] -= n_del
        params["n_tokens"] -= int(dead.n_tokens or 0)
        params["deltas"].append({"name": dname, "kind": "tombstones"})
        _write_params(spark, params_path, params)
        stats = {
            "mode": "delete",
            "delta": dname,
            "docs_deleted": n_del,
            "tokens_deleted": int(dead.n_tokens or 0),
            "deltas": len(params["deltas"]),
        }
    elif args.mode == "compact":
        if not args.out_index:
            p.error("compact mode requires --out-index")
        if args.out_index == args.index:
            raise SystemExit(
                "compact refused: --out-index must differ from --index "
                "(no in-place rewrite over tables being read)"
            )
        params = _read_params(spark, params_path)
        postings, dictionary, docstats, tombstones = _index_tables(
            spark, args.index, params
        )
        if tombstones is not None:
            # compaction is where deletions become physical: the only
            # full-postings anti-join in the lifecycle, paid on the
            # amortized schedule
            postings = postings.join(tombstones, "doc_id", "left_anti")
        _write_index(
            spark, (postings, dictionary, docstats),
            args.out_index, parts,
        )
        n_docs, n_tokens = collection_stats(
            f"{args.out_index}/docstats"
        )
        out_params = dict(params, n_docs=n_docs, n_tokens=n_tokens,
                          deltas=[])
        _write_params(
            spark, f"{args.out_index}/params.json", out_params
        )
        stats = {
            "mode": "compact",
            "docs": n_docs,
            "tokens": n_tokens,
            "deltas_merged": len(params["deltas"]),
        }
    else:
        if not (args.query and args.output):
            p.error("search mode requires --query and --output")
        params = _read_params(spark, params_path)
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
        # every postings scan (main + deltas) as a pushed-down IN
        # filter (row-group pruning on the term-sorted layout); the
        # broadcast join then attaches query_id/df_w
        term_list = sorted({t for _, t in qrows})
        postings, dictionary, docstats, tombstones = _index_tables(
            spark, args.index, params
        )
        cand_posts = postings.filter(F.col("term").isin(term_list))
        if tombstones is not None:
            # anti-join AFTER the term filter: cost is the candidate
            # posting lists, never the corpus
            cand_posts = cand_posts.join(
                tombstones, "doc_id", "left_anti"
            )
        top = textops.bm25_search(
            qterms,
            cand_posts,
            dictionary.filter(F.col("term").isin(term_list)),
            docstats,
            stats=spark.createDataFrame(
                [(params["n_docs"], params["n_tokens"])],
                "n_docs long, n_tokens long",
            ),
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
