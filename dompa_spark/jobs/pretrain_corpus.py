#!/usr/bin/env python3
"""spark-submit entry point for the COMPOSED training-corpus pipeline:

    raw interleaved docs -> extraction (resumable, chunked)
                         -> doc text assembly + language-ID
                         -> curation (quality / sample / domain cap /
                            exact dedup, optional repetition gate)
                         -> near-dup dedup (linear LSH star edges ->
                            connected components, canonical keeper)
                         -> kept corpus (optional repeated-line strip)
                            + one JSON stats line

    spark-submit --py-files dompa_spark.zip \
        dompa_spark/jobs/pretrain_corpus.py \
        --input /path/raw_docs --workdir /path/work \
        [--chunk-parts N] [--with-repetition] [--with-lm] \
        [--with-line-dedup] [--with-span-dedup] [--with-pii-scrub] \
        [--with-c4] [--with-markdown] [--no-resume]

Every stage is the corresponding tested operator (pipeline.run_extract,
textops.lang_id_heuristic / curate_corpus / repetition_scores /
minhash_band_edges, graphops.connected_components) — this job only
sequences them and owns the stage directories. Stage outputs land under
{workdir}/{extracted,docs,decisions,kept}; a completed stage (parquet
_SUCCESS marker) is skipped on resume, so a killed run restarts where
it stopped — extraction itself resumes at chunk granularity below that.

Scale notes: the assembled docs table is written once and re-read by
the two consumer stages (cheaper than recomputing the concat at 100 TB
— and it gives the stage boundary durability); near-dup clustering
uses the linear star-edge path (B edges per B-clique), never the
quadratic pair object; the final keep join is doc_id-keyed and
AQE-managed.
"""

from __future__ import annotations

import argparse
import json
import sys


def _stage_done(spark, path: str) -> bool:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path + "/_SUCCESS")
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="dompa_spark composed pretraining-corpus pipeline"
    )
    p.add_argument("--input", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--chunk-parts", type=int, default=0)
    p.add_argument("--light-parts", type=int, default=None)
    p.add_argument("--heavy-parts", type=int, default=None)
    p.add_argument("--with-repetition", action="store_true")
    p.add_argument("--with-lm", action="store_true",
                   help="AND the LM-surprisal gate into `kept`")
    p.add_argument("--with-script-gate", action="store_true",
                   help="AND the mixed-script gate (textops."
                        "script_profile.script_ok) into `kept`: docs "
                        "whose dominant unicode script owns < 90%% of "
                        "their scripted letters drop")
    p.add_argument("--with-pii-scrub", action="store_true",
                   help="redact emails/IPs/phones (textops.pii_scrub) "
                        "in the kept corpus text; applied last (after "
                        "the optional line dedup) so placeholders "
                        "never feed the hot-segment vote")
    p.add_argument("--with-host-boilerplate", action="store_true",
                   help="strip per-SOURCE site-template segments "
                        "(textops.host_boilerplate: segments in >= 60% "
                        "of a source's kept docs, min 3 docs) from the "
                        "kept corpus text. Runs FIRST among the text "
                        "cleanups — site chrome is the biggest whole-"
                        "segment offender and removing it host-scoped "
                        "keeps the global line-dedup vote clean; uses "
                        "--line-seg-mode/--line-seg-words as its "
                        "segment unit")
    p.add_argument("--with-line-dedup", action="store_true",
                   help="strip segments repeated across kept docs "
                        "(textops.segment_dedup) when writing the kept "
                        "corpus. Runs AFTER near-dup dedup on purpose: "
                        "hot-segment votes come from the kept set only, "
                        "so a dropped 50-copy near-dup cluster cannot "
                        "mark its canonical survivor's text as "
                        "boilerplate and gut it")
    p.add_argument("--with-span-dedup", action="store_true",
                   help="cut exact duplicated passages from the kept "
                        "corpus text (textops.span_dedup: OVERLAPPING "
                        "n-gram windows, per-token coverage — catches "
                        "any-alignment duplication the fixed-chunk line "
                        "dedup can't). Ordering contract: runs AFTER "
                        "near-dup dedup (hot votes come from the kept "
                        "set only, and doc-level dups are DROPPED, not "
                        "shredded here), after --with-line-dedup (cheap "
                        "whole-segment strip first), and BEFORE "
                        "--with-pii-scrub (placeholders never vote)")
    p.add_argument("--span-n", type=int, default=None,
                   help="window size for --with-span-dedup (default: "
                        "textops.SPANDEDUP_N)")
    p.add_argument("--line-seg-mode", default="words",
                   choices=["words", "newline"],
                   help="segment unit for --with-line-dedup: 'newline' "
                        "for real multi-line web text, 'words' "
                        "(fixed windows) for single-line corpora")
    p.add_argument("--line-seg-words", type=int, default=None,
                   help="window size for --line-seg-mode=words "
                        "(default: textops.SEGDEDUP_WORDS)")
    p.add_argument("--with-c4", action="store_true",
                   help="C4-style line scrub (textops.c4_line_filter) "
                        "on the kept corpus: junk lines drop, pages "
                        "failing the lorem/brace/kept-lines gates drop "
                        "entirely. Runs FIRST among the text cleanups "
                        "so junk lines never vote in the segment dedup; "
                        "note `kept` in the stats counts curation "
                        "survivors — C4 page drops show separately as "
                        "c4_pages_dropped")
    p.add_argument("--with-markdown", action="store_true",
                   help="also write the kept docs' markdown rendition "
                        "(pipeline.to_markdown_df over the extracted "
                        "spans) under workdir/markdown — the page-form "
                        "product next to the plain-text corpus; text "
                        "cleanups do not apply to it")
    p.add_argument("--with-mixture", action="store_true",
                   help="write a deterministic mixture resampling plan "
                        "(doc_id, lang, n_copies — hash-gated integer "
                        "ppm, replayable on any cluster) for the KEPT "
                        "corpus under workdir/mixture_plan")
    p.add_argument("--domain-cap", type=int, default=None,
                   help="docs kept per source domain (default: the "
                        "operator's DOMAIN_CAP; raise for corpora with "
                        "few distinct sources)")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dompa_spark import graphops, pipeline, textops

    builder = SparkSession.builder.appName("dompa-spark-pretrain-corpus")
    if args.master:
        builder = builder.master(args.master)
    owns_session = SparkSession.getActiveSession() is None
    spark = pipeline.session_confs(builder).getOrCreate()
    resume = not args.no_resume

    extracted = f"{args.workdir}/extracted"
    docs_path = f"{args.workdir}/docs"
    decisions = f"{args.workdir}/decisions"
    kept_path = f"{args.workdir}/kept"

    # 1. extraction (chunk-resumable on its own manifest)
    kwargs = {}
    if args.light_parts is not None:
        kwargs["light_parts"] = args.light_parts
    if args.heavy_parts is not None:
        kwargs["heavy_parts"] = args.heavy_parts
    pipeline.run_extract(
        spark, args.input, extracted,
        chunk_parts=args.chunk_parts, resume=resume, **kwargs,
    )

    # 2. doc assembly: spans -> text; source from the first media ref
    # (media://<source>/<id>); lang from the language-ID heuristic —
    # the operators' own composition (lang feeds stratified sampling)
    if not (resume and _stage_done(spark, docs_path)):
        ext = spark.read.parquet(extracted)
        text = F.concat_ws(
            " ",
            F.filter(
                F.transform("spans", lambda s: s["text"]),
                lambda t: t.isNotNull(),
            ),
        )
        # F.get is null-safe on empty arrays (docs without media spans);
        # element_at would throw under ANSI mode
        first_media = F.get(
            F.filter(
                F.transform("spans", lambda s: s["media_ref"]),
                lambda m: m.isNotNull(),
            ),
            0,
        )
        source = F.coalesce(
            F.regexp_extract(first_media, r"^([a-z]+://[^/]+)", 1),
            F.lit("unknown"),
        )
        # the text operators key on a LONG doc_id; string identities get
        # a deterministic xxhash64 surrogate (collision odds ~(n^2)/2^65
        # — negligible below ~10^9 docs; a 10^12-doc deployment would
        # assign a monotonic surrogate at ingest instead), with the
        # original id carried alongside for the final output
        base = ext.select(
            F.xxhash64(F.col("doc_id").cast("string")).alias("doc_id"),
            F.col("doc_id").cast("string").alias("orig_doc_id"),
            text.alias("text"),
            F.when(source == "", "unknown").otherwise(source).alias("source"),
        )
        lang = textops.lang_id_heuristic(base).select(
            "doc_id", F.col("lang_pred").alias("lang")
        )
        base.join(lang, "doc_id").write.mode("overwrite").parquet(docs_path)

    # 3. curation decisions (single-scan composition + optional
    # repetition gate), AND near-dup canonical flags
    if not (resume and _stage_done(spark, decisions)):
        docs = spark.read.parquet(docs_path)
        ckw = {}
        if args.domain_cap is not None:
            ckw["domain_cap_n"] = args.domain_cap
        # scoped: the curation cache unpersists after the stage write
        # materializes it — resumed/multi-stage sessions stay
        # cache-bounded (ADVICE r03)
        with textops.curate_corpus_scoped(docs, **ckw) as cur:
            if args.with_repetition:
                rep = textops.repetition_scores(docs).select(
                    "doc_id", "repetition_ok"
                )
                cur = cur.join(rep, "doc_id", "left").withColumn(
                    "repetition_ok",
                    F.coalesce("repetition_ok", F.lit(False)),
                ).withColumn("kept", F.col("kept") & F.col("repetition_ok"))
            if args.with_lm:
                lm = textops.lm_surprisal_scores(docs).select(
                    "doc_id", "lm_ok"
                )
                cur = cur.join(lm, "doc_id", "left").withColumn(
                    "lm_ok", F.coalesce("lm_ok", F.lit(False))
                ).withColumn("kept", F.col("kept") & F.col("lm_ok"))
            if args.with_script_gate:
                sg = textops.script_profile(docs).select(
                    "doc_id", "script_ok"
                )
                cur = cur.join(sg, "doc_id", "left").withColumn(
                    "script_ok", F.coalesce("script_ok", F.lit(False))
                ).withColumn(
                    "kept", F.col("kept") & F.col("script_ok")
                )
            # linear near-dup clustering; non-canonical cluster members
            # drop. Fused accessor: the hot-bucket telemetry rides the
            # SAME shingle+minhash pass as the edges (minhash_band_
            # edges_with_stats) — the 4-row stats table is the
            # observability contract (did a viral cluster appear? how
            # big?) at zero extra hashing.
            edges, bstats = textops.minhash_band_edges_with_stats(docs)
            bstats.coalesce(1).write.mode("overwrite").parquet(
                f"{args.workdir}/dedup_bucket_stats"
            )
            cc_full = graphops.dedup_components(edges)
            # macro dedup telemetry next to the per-bucket stats: the
            # cluster-size histogram rides the SAME checkpointed CC
            # labels the keep-decision reads (one viral cluster vs a
            # million scattered pairs — this table tells them apart)
            graphops.cluster_size_stats(cc_full).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{args.workdir}/dedup_cluster_sizes")
            cc = cc_full.select("doc_id", "is_canonical")
            out = cur.join(cc, "doc_id", "left").withColumn(
                "near_dup_drop", ~F.coalesce("is_canonical", F.lit(True))
            ).withColumn(
                "kept", F.col("kept") & ~F.col("near_dup_drop")
            ).drop("is_canonical")
            out.write.mode("overwrite").parquet(decisions)

    # A resumed decisions stage must match the CURRENT gate flags in
    # BOTH directions: a stage written without a requested gate baked a
    # looser `kept` bit (ungated docs would ship), and a stage written
    # WITH a gate the current run didn't ask for baked a stricter one
    # (docs silently missing). Refuse up front, BEFORE stages 4-5
    # spend anything (the run_extract changed-geometry contract).
    dec_cols = set(spark.read.parquet(decisions).columns)
    for flag, col, opt in [
        (args.with_repetition, "repetition_ok", "--with-repetition"),
        (args.with_lm, "lm_ok", "--with-lm"),
        (args.with_script_gate, "script_ok", "--with-script-gate"),
    ]:
        if flag and col not in dec_cols:
            raise ValueError(
                f"geometry: the existing decisions stage was written "
                f"without {opt}; rerun with --no-resume"
            )
        if not flag and col in dec_cols:
            raise ValueError(
                f"geometry: the existing decisions stage was written "
                f"WITH {opt} (its kept bit is stricter than the "
                f"current flags); rerun with --no-resume"
            )

    # 4. kept corpus: the curated, deduped documents (original string
    # ids restored as the identity column)
    if not (resume and _stage_done(spark, kept_path)):
        docs = spark.read.parquet(docs_path)
        keep = spark.read.parquet(decisions).filter("kept").select("doc_id")
        kept_docs = docs.join(keep, "doc_id")
        cols = [F.col("orig_doc_id").alias("doc_id"),
                "text", "source", "lang"]
        if args.with_c4:
            c4 = textops.c4_line_filter(kept_docs).select(
                "doc_id", "page_ok",
                F.col("kept_text").alias("text"),
                (F.col("n_lines") - F.col("n_kept"))
                .alias("c4_lines_removed"),
            )
            kept_docs = (
                kept_docs.drop("text")
                .join(c4, "doc_id")
                .filter("page_ok")
                .drop("page_ok")
            )
            cols.append("c4_lines_removed")
        if args.with_host_boilerplate:
            hbkw = {"mode": args.line_seg_mode}
            if args.line_seg_words is not None:
                hbkw["seg_words"] = args.line_seg_words
            hb = textops.host_boilerplate(
                kept_docs.select(
                    "doc_id", F.col("source").alias("host"), "text"
                ),
                **hbkw,
            ).select(
                "doc_id",
                F.col("text_clean").alias("text"),
                F.col("n_removed").alias("host_template_removed"),
            )
            kept_docs = kept_docs.drop("text").join(hb, "doc_id")
            cols.append("host_template_removed")
        if args.with_line_dedup:
            sdkw = {"mode": args.line_seg_mode}
            if args.line_seg_words is not None:
                sdkw["seg_words"] = args.line_seg_words
            sd = textops.segment_dedup(kept_docs, **sdkw).select(
                "doc_id",
                F.col("text_clean").alias("text"),
                F.col("n_removed").alias("boilerplate_segments_removed"),
            )
            kept_docs = kept_docs.drop("text").join(sd, "doc_id")
            cols.append("boilerplate_segments_removed")
        if args.with_span_dedup:
            spkw = {}
            if args.span_n is not None:
                spkw["n"] = args.span_n
            sp = textops.span_dedup(kept_docs, **spkw).select(
                "doc_id",
                F.col("text_clean").alias("text"),
                F.col("n_removed").alias("span_tokens_removed"),
            )
            kept_docs = kept_docs.drop("text").join(sp, "doc_id")
            cols.append("span_tokens_removed")
        if args.with_pii_scrub:
            pii = textops.pii_scrub(kept_docs).select(
                "doc_id",
                F.col("text_redacted").alias("text"),
                (F.col("n_emails") + F.col("n_ips") + F.col("n_phones"))
                .alias("pii_redactions"),
            )
            kept_docs = kept_docs.drop("text").join(pii, "doc_id")
            cols.append("pii_redactions")
        kept_docs.select(*cols).write.mode("overwrite").parquet(kept_path)

    # 4b. optional markdown rendition of the kept docs (own resumable
    # stage): the page-form product next to the plain-text corpus —
    # rendered from the EXTRACTED spans (structure intact), keyed by
    # the kept set's original string ids
    md_path = f"{args.workdir}/markdown"
    if args.with_markdown and not (resume and _stage_done(spark, md_path)):
        ext_md = spark.read.parquet(extracted)
        keep_ids = spark.read.parquet(kept_path).select("doc_id")
        pipeline.to_markdown_df(
            ext_md.join(keep_ids, "doc_id")
        ).write.mode("overwrite").parquet(md_path)

    # 5. optional mixture plan over the kept corpus (its own resumable
    # stage: the plan is deterministic given the kept table, so a
    # resumed run reproduces it bit-identically rather than re-rolling)
    mixture_path = f"{args.workdir}/mixture_plan"
    if args.with_mixture and not (
        resume and _stage_done(spark, mixture_path)
    ):
        textops.sample_mixture(
            spark.read.parquet(kept_path)
        ).write.mode("overwrite").parquet(mixture_path)

    dec = spark.read.parquet(decisions)
    stats = {
        "docs": dec.count(),
        "kept": dec.filter("kept").count(),
        "near_dup_dropped": dec.filter("near_dup_drop").count(),
    }
    if args.with_script_gate:
        stats["script_rejected"] = dec.filter("NOT script_ok").count()
    if args.with_c4:
        kt = spark.read.parquet(kept_path)
        stats["c4_pages_dropped"] = stats["kept"] - kt.count()
        stats["c4_lines_removed"] = int(
            kt.agg(F.sum("c4_lines_removed")).first()[0] or 0
        )
    if args.with_markdown:
        mddf = spark.read.parquet(md_path)
        stats["markdown_docs"] = mddf.count()
        stats["markdown_blocks"] = int(
            mddf.agg(F.sum("n_blocks")).first()[0] or 0
        )
    if args.with_host_boilerplate:
        stats["host_template_segments_removed"] = int(
            spark.read.parquet(kept_path)
            .agg(F.sum("host_template_removed")).first()[0] or 0
        )
    if args.with_line_dedup:
        stats["line_segments_removed"] = int(
            spark.read.parquet(kept_path)
            .agg(F.sum("boilerplate_segments_removed")).first()[0] or 0
        )
    if args.with_span_dedup:
        stats["span_tokens_removed"] = int(
            spark.read.parquet(kept_path)
            .agg(F.sum("span_tokens_removed")).first()[0] or 0
        )
    if args.with_pii_scrub:
        stats["pii_redactions"] = int(
            spark.read.parquet(kept_path)
            .agg(F.sum("pii_redactions")).first()[0] or 0
        )
    if args.with_mixture:
        plan = spark.read.parquet(mixture_path)
        stats["mixture_docs"] = plan.count()
        stats["mixture_copies"] = int(
            plan.agg(F.sum("n_copies")).first()[0] or 0
        )
    print(json.dumps(stats))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
