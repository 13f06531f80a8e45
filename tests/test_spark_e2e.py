"""End-to-end Spark pipeline tests: the full Spark plan (scan -> salted
repartition -> mapInPandas kernel -> write) must reproduce the oracle's
per-row span sequences exactly, and resume-from-checkpoint must be
exactly-once per partition.
"""

import pandas as pd
import pytest

from dompa_spark import corpus, oracle, pipeline


def oracle_spans_for(n_docs):
    expected = {}
    for i in range(n_docs):
        doc_id, spans = corpus.gen_doc(i)
        expected[doc_id] = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in oracle.extract_document(spans)
        ]
    return expected


def collected_spans(df):
    got = {}
    for row in df.collect():
        got[row.doc_id] = [
            (s.kind, s.text, s.media_ref, s.offset) for s in (row.spans or [])
        ]
    return got


def test_corpus_deterministic():
    a = corpus.gen_batch(0, 50)
    b = corpus.gen_batch(0, 50)
    assert a.equals(b)
    # chunk-independence: generating a sub-range matches the full range
    c = corpus.gen_batch(25, 50)
    assert a.slice(25, 25).to_pydict() == c.to_pydict()


def test_extract_df_matches_oracle(spark, small_corpus):
    df = pipeline.read_input(spark, small_corpus)
    got = collected_spans(pipeline.extract_df(df))
    expected = oracle_spans_for(300)
    assert len(got) == 300
    mismatches = [d for d in expected if got.get(d) != expected[d]]
    assert mismatches == [], f"{len(mismatches)} docs mismatch: {mismatches[:5]}"


def test_roundtrip_df_matches_oracle(spark, small_corpus):
    df = pipeline.read_input(spark, small_corpus)
    got = {r.doc_id: r.html for r in pipeline.roundtrip_df(df).collect()}
    for i in range(300):
        doc_id, spans = corpus.gen_doc(i)
        html = "".join(
            s["text"] or ""
            for s in sorted(
                (s for s in spans if s["kind"] == "html"),
                key=lambda s: s["offset"],
            )
        )
        assert got[doc_id] == oracle.to_html(oracle.parse(html)), doc_id


def test_parse_nodes_df_shape(spark, small_corpus):
    df = pipeline.read_input(spark, small_corpus)
    nodes = pipeline.parse_nodes_df(df)
    row = nodes.filter("size(nodes) > 3").first()
    ids = [n.node_id for n in row.nodes]
    assert ids == sorted(ids)
    assert all(n.parent_id < n.node_id for n in row.nodes)


def test_run_extract_and_resume(spark, small_corpus, tmp_path):
    out = str(tmp_path / "out")
    stats = pipeline.run_extract(
        spark, small_corpus, out, light_parts=6, heavy_parts=2, chunk_parts=4
    )
    assert stats["docs"] == 300
    assert stats["parts_skipped"] == 0

    first = collected_spans(
        spark.read.parquet(f"{out}/data").select("doc_id", "spans")
    )
    assert len(first) == 300
    expected = oracle_spans_for(300)
    assert all(first[d] == expected[d] for d in expected)

    # manifest covers every part that has data
    manifest = spark.read.parquet(f"{out}/_manifest")
    mparts = {r.part_id for r in manifest.select("part_id").collect()}
    assert mparts == set(range(8))
    checks0 = {
        r.part_id: (r.doc_count, r.checksum) for r in manifest.collect()
    }

    # simulate a crash: wipe the manifest for the second chunk, resume
    import shutil

    shutil.rmtree(f"{out}/_manifest/chunk=1")
    stats2 = pipeline.run_extract(
        spark, small_corpus, out, light_parts=6, heavy_parts=2, chunk_parts=4
    )
    assert stats2["parts_skipped"] == 4 and stats2["chunks_run"] == 1

    second = collected_spans(
        spark.read.parquet(f"{out}/data").select("doc_id", "spans")
    )
    assert second == first  # exactly-once per part, byte-stable
    manifest2 = {
        r.part_id: (r.doc_count, r.checksum)
        for r in spark.read.parquet(f"{out}/_manifest").collect()
    }
    assert manifest2 == checks0

    # full resume: nothing to do
    stats3 = pipeline.run_extract(
        spark, small_corpus, out, light_parts=6, heavy_parts=2, chunk_parts=4
    )
    assert stats3["parts_skipped"] == 8 and stats3["docs"] == 0

    # changed geometry must be refused (stale outputs would be unsound)
    with pytest.raises(ValueError, match="geometry"):
        pipeline.run_extract(
            spark, small_corpus, out, light_parts=6, heavy_parts=2
        )


def test_chunked_resume_scan_is_partition_pruned(spark, small_corpus, tmp_path):
    """Chunked runs stage the input partitioned by chunk id; a (resumed)
    chunk's scan must carry a partition filter on chunk — i.e. it reads
    one chunk=C directory, not the whole 100-TB source (VERDICT r01)."""
    import contextlib
    import io
    import os

    from pyspark.sql import functions as F

    out = str(tmp_path / "out_pruned")
    pipeline.run_extract(
        spark, small_corpus, out, light_parts=6, heavy_parts=2, chunk_parts=4
    )
    staged = f"{out}/_staged"
    assert os.path.exists(f"{staged}/_STAGED")
    assert os.path.isdir(f"{staged}/chunk=0") and os.path.isdir(
        f"{staged}/chunk=1"
    )
    df = spark.read.parquet(staged).where(F.col("chunk") == 1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "chunk" in pf[0], plan
    # and the data actually read is only chunk 1's parts (4..7)
    parts = {r.part_id for r in df.select("part_id").distinct().collect()}
    assert parts <= set(range(4, 8)), parts


def test_resume_refuses_different_input_path(spark, small_corpus, tmp_path):
    """The config guard pins in_path: resuming the same out_path against
    a different source would mix lineages / read stale staging."""
    out = str(tmp_path / "out_inpath")
    pipeline.run_extract(
        spark, small_corpus, out, light_parts=6, heavy_parts=2
    )
    other = str(tmp_path / "other_corpus")
    from dompa_spark import corpus as corpus_mod

    corpus_mod.write_corpus(other, 10)
    with pytest.raises(ValueError, match="geometry"):
        pipeline.run_extract(
            spark, other, out, light_parts=6, heavy_parts=2
        )


def test_nonresume_rebuilds_staging(spark, tmp_path):
    """resume=False must rewrite the staged copy — a stale staging from
    a previous run over different input data would silently win."""
    import os

    from dompa_spark import corpus as corpus_mod

    in_path = str(tmp_path / "mutable_in")
    out = str(tmp_path / "out_restage")
    corpus_mod.write_corpus(in_path, 40)
    pipeline.run_extract(
        spark, in_path, out, light_parts=6, heavy_parts=2, chunk_parts=4,
        resume=False,
    )
    n1 = spark.read.parquet(f"{out}/data").count()
    # grow the input in place; resume=False must see the new docs
    import pyarrow.parquet as pq

    pq.write_table(
        corpus_mod.gen_batch(40, 80),
        os.path.join(in_path, "part-extra.parquet"),
    )
    pipeline.run_extract(
        spark, in_path, out, light_parts=6, heavy_parts=2, chunk_parts=4,
        resume=False,
    )
    n2 = spark.read.parquet(f"{out}/data").count()
    assert (n1, n2) == (40, 80)


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the same key join with ZERO exchanges —
    the co-location technique a recurring doc_id join pays for once at
    write time. The unbucketed control plan shuffles both sides."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from dompa_spark import pipeline

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("meta")
    )
    scores = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3 % 11).alias("score")
    )
    pipeline.write_bucketed(docs, "t_docs_b", "doc_id", 8)
    pipeline.write_bucketed(scores, "t_scores_b", "doc_id", 8)
    # tiny test tables would otherwise broadcast-join, which proves
    # nothing about co-location; force the sort-merge path both ways
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_docs_b").join(
            spark.table("t_scores_b"), "doc_id"
        )

        def exchanges(df):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            import re

            return len(
                re.findall(r"^\(\d+\) Exchange", buf.getvalue(), re.M)
            )

        assert exchanges(joined) == 0, "bucketed join must not shuffle"
        control = docs.join(scores, "doc_id")
        assert exchanges(control) >= 2, "control should shuffle both sides"
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_scores_b")


def test_manifest_invariant_across_execution_slicing(
    spark, small_corpus, tmp_path
):
    """Per-part lineage (doc/span counts, chars, order-insensitive crc
    checksum) must not depend on how execution was sliced: one chunk vs
    chunked runs produce identical manifests. (The same invariant holds
    across parallelism levels — verified at 120k docs local[8] vs
    local[32], all 80 part checksums identical; see BENCH.md.)"""

    def manifest_of(chunk_parts):
        out = str(tmp_path / f"out_cp{chunk_parts}")
        pipeline.run_extract(
            spark, small_corpus, out, light_parts=6, heavy_parts=2,
            chunk_parts=chunk_parts, resume=False,
        )
        rows = spark.read.parquet(f"{out}/_manifest").collect()
        return sorted(
            (r.part_id, r.doc_count, r.span_count, r.out_chars, r.checksum)
            for r in rows
        )

    assert manifest_of(0) == manifest_of(3)


def test_staging_marker_on_scheme_qualified_path(spark, small_corpus, tmp_path):
    """The _STAGED marker goes through the Hadoop FileSystem API, so a
    scheme-qualified URI (file:///) must stage, mark, and short-circuit
    the rewrite exactly like a bare local path — the contract that
    makes chunked-input resume work on hdfs:///s3a:// too."""
    from dompa_spark import pipeline
    from pyspark.sql import functions as F

    staged = f"file://{tmp_path}/staged_uri"
    df = pipeline.with_part_id(
        pipeline.read_input(spark, small_corpus), 6, 2
    )
    out1 = pipeline._stage_chunked_input(spark, df, staged, 4)
    n1 = out1.count()
    assert n1 == df.count()
    # marker exists through the Hadoop API -> second call must NOT
    # rewrite (mutate the staged copy; an overwrite would drop the file)
    import glob
    import os

    files1 = sorted(glob.glob(f"{tmp_path}/staged_uri/**/*.parquet",
                              recursive=True))
    mtimes1 = [os.path.getmtime(f) for f in files1]
    out2 = pipeline._stage_chunked_input(spark, df, staged, 4)
    assert out2.count() == n1
    files2 = sorted(glob.glob(f"{tmp_path}/staged_uri/**/*.parquet",
                              recursive=True))
    assert files2 == files1
    assert [os.path.getmtime(f) for f in files2] == mtimes1
    # chunk filter prunes at directory level on the URI path too
    pruned = out2.filter(F.col("chunk") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(chunk" in plan or \
        "chunk#" in plan.split("PartitionFilters")[1][:80], plan


def test_curate_job_cli(spark, tmp_path, capsys):
    """The curation spark-submit entry point end-to-end in-process:
    decisions parquet equals the operator composition (incl. the
    --with-repetition AND), --kept-only writes the slim join list."""
    import json

    from pyspark.sql import functions as F

    from dompa_spark import textops
    from dompa_spark.jobs import curate

    in_path = str(tmp_path / "docs_in")
    spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), (F.col("id") % 50 + 5).cast("int")),
                lambda j: F.concat(F.lit("the word"), F.col("id") * 3 + j),
            ),
        ).alias("text"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("other").alias("lang"),
        F.concat(F.lit("s"), F.col("id") % 7).alias("source"),
    ).write.mode("overwrite").parquet(in_path)

    out1 = str(tmp_path / "decisions")
    rc = curate.main([
        "--input", in_path, "--output", out1, "--with-repetition",
        "--master", "local[2]",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = {r.doc_id: (r.kept, r.repetition_ok)
           for r in spark.read.parquet(out1).collect()}
    docs = spark.read.parquet(in_path)
    want_cur = {r.doc_id: r.kept
                for r in textops.curate_corpus(docs).collect()}
    want_rep = {r.doc_id: r.repetition_ok
                for r in textops.repetition_scores(docs).collect()}
    assert len(got) == 200 and stats["docs"] == 200
    for d, (kept, rep_ok) in got.items():
        assert rep_ok == want_rep[d]
        assert kept == (want_cur[d] and want_rep[d])
    assert stats["kept"] == sum(1 for k, r in got.values() if k)

    out2 = str(tmp_path / "kept_only")
    rc = curate.main([
        "--input", in_path, "--output", out2, "--with-repetition",
        "--kept-only", "--master", "local[2]",
    ])
    assert rc == 0
    kept_ids = {r.doc_id for r in spark.read.parquet(out2).collect()}
    assert kept_ids == {d for d, (k, _) in got.items() if k}

    # --with-lm: the CCNet-style LM-surprisal gate ANDs in the same way
    out3 = str(tmp_path / "decisions_lm")
    rc = curate.main([
        "--input", in_path, "--output", out3, "--with-repetition",
        "--with-lm", "--master", "local[2]",
    ])
    assert rc == 0
    got_lm = {r.doc_id: (r.kept, r.lm_ok)
              for r in spark.read.parquet(out3).collect()}
    want_lm = {r.doc_id: r.lm_ok
               for r in textops.lm_surprisal_scores(docs).collect()}
    assert len(got_lm) == 200
    for d, (kept, lm_ok) in got_lm.items():
        assert lm_ok == want_lm[d]
        assert kept == (want_cur[d] and want_rep[d] and want_lm[d])


def test_pretrain_corpus_pipeline_end_to_end(spark, small_corpus, tmp_path,
                                             capsys):
    """The composed pipeline job: extract -> assemble+lang -> curate ->
    near-dup dedup -> kept corpus. Final kept set must equal the manual
    operator composition over the assembled docs table; a rerun resumes
    (stage outputs untouched, same stats)."""
    import glob
    import json
    import os

    from pyspark.sql import functions as F

    from dompa_spark import graphops, textops
    from dompa_spark.jobs import pretrain_corpus

    wd = str(tmp_path / "work")
    rc = pretrain_corpus.main([
        "--input", small_corpus, "--workdir", wd,
        "--chunk-parts", "4", "--with-repetition", "--with-lm",
        "--with-line-dedup", "--with-pii-scrub", "--domain-cap", "100",
        "--light-parts", "6", "--heavy-parts", "2",
        "--master", "local[2]",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs"] == 300
    assert 0 < stats["kept"] < 300

    docs = spark.read.parquet(f"{wd}/docs")
    cur = {r.doc_id: r.kept
           for r in textops.curate_corpus(docs, domain_cap_n=100).collect()}
    rep = {r.doc_id: r.repetition_ok
           for r in textops.repetition_scores(docs).collect()}
    lm = {r.doc_id: r.lm_ok
          for r in textops.lm_surprisal_scores(docs).collect()}
    cc = {r.doc_id: r.is_canonical
          for r in graphops.dedup_components(
              textops.minhash_band_edges(docs)).collect()}
    # the persisted cluster-size histogram == the library composition
    # over the same CC labels
    want_hist = sorted(map(tuple, graphops.cluster_size_stats(
        graphops.dedup_components(
            textops.minhash_band_edges(docs))).collect()))
    got_hist = sorted(map(tuple, spark.read.parquet(
        f"{wd}/dedup_cluster_sizes").collect()))
    assert got_hist == want_hist
    key_of = {r.doc_id: r.orig_doc_id for r in docs.collect()}
    want_kept = {
        key_of[d]
        for d in cur
        if cur[d] and rep[d] and lm[d] and cc.get(d, True)
    }
    kept_rows = spark.read.parquet(f"{wd}/kept").collect()
    got_kept = {r.doc_id for r in kept_rows}
    assert got_kept == want_kept
    # kept corpus carries the original string identities
    assert all(d.startswith("doc-") for d in got_kept)
    # --with-line-dedup: kept text equals segment_dedup over the KEPT
    # set (hot votes from kept docs only — post-near-dup by design)
    kept_long = [d for d in key_of if key_of[d] in want_kept]
    sd = {key_of[r.doc_id]: (r.text_clean, r.n_removed)
          for r in textops.segment_dedup(
              docs.filter(F.col("doc_id").isin(kept_long))).collect()}
    # --with-pii-scrub composes last: expected text = pii over the
    # line-deduped text (Python re matches the restricted patterns)
    import re as pyre
    pats = [(textops.PII_EMAIL, "<EMAIL>"), (textops.PII_IPV4, "<IP>"),
            (textops.PII_PHONE, "<PHONE>")]
    for r in kept_rows:
        clean, n_rm = sd[r.doc_id]
        n_pii = sum(len(pyre.findall(p, clean)) for p, _ in pats)
        red = clean
        for p, tok in pats:
            red = pyre.sub(p, tok, red)
        assert (r.text, r.boilerplate_segments_removed,
                r.pii_redactions) == (red, n_rm, n_pii)
    assert stats["line_segments_removed"] == sum(
        v[1] for v in sd.values())
    assert stats["pii_redactions"] >= 0

    # resume: stage parquet files untouched on rerun, same stats
    files1 = sorted(glob.glob(f"{wd}/docs/**/*.parquet", recursive=True))
    mtimes1 = [os.path.getmtime(f) for f in files1]
    rc = pretrain_corpus.main([
        "--input", small_corpus, "--workdir", wd,
        "--chunk-parts", "4", "--with-repetition", "--with-lm",
        "--with-line-dedup", "--with-pii-scrub", "--domain-cap", "100",
        "--light-parts", "6", "--heavy-parts", "2",
        "--master", "local[2]",
    ])
    assert rc == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2 == stats
    files2 = sorted(glob.glob(f"{wd}/docs/**/*.parquet", recursive=True))
    assert files2 == files1
    assert [os.path.getmtime(f) for f in files2] == mtimes1


def test_pretrain_c4_and_markdown_stages(spark, tmp_path, capsys):
    """--with-c4 (kept-stage line scrub + page gate) and
    --with-markdown (page-form rendition of the kept docs): kept text
    equals the manual c4_line_filter composition, dropped pages and
    line counts audit in the stats, and the markdown table covers
    exactly the shipped doc set."""
    import json

    from pyspark.sql import functions as F

    from dompa_spark import textops
    from dompa_spark.jobs import pretrain_corpus

    # crafted corpus: multi-line English sentences (text spans pass
    # through extraction verbatim), one media span per doc for a
    # distinct source (domain cap) and a markdown image block;
    # every 5th doc carries a lorem-ipsum line -> C4 page drop
    rows = []
    for i in range(40):
        # letter-based unique token: digits would collapse under the
        # normalized exact dedup (digit -> 0) and mark every doc a dup
        uid = "".join(chr(97 + int(c)) for c in str(i))
        lines = [
            f"The first sentence of document {uid} is long enough to "
            "be useful here.",
            "short.",
            "you must enable javascript to continue.",
            f"The second sentence is also fine and the words of it "
            f"are many for {uid}.",
            "The third sentence is good too and it ends well with "
            "the right length.",
            f"A fourth sentence with the and of a to in it keeps the "
            f"stopword ratio high for {uid}.",
            "And a fifth sentence that is here so the token count of "
            "the document is comfortably past the gate.",
        ]
        if i % 5 == 0:
            lines.append("this page is lorem ipsum filler text.")
        text = "\n".join(lines)
        rows.append((
            f"doc-{i:04d}",
            [
                {"kind": "text", "text": text,
                 "media_ref": None, "offset": 0},
                {"kind": "image", "text": None,
                 "media_ref": f"media://s{i}/img", "offset": 1},
            ],
        ))
    in_path = str(tmp_path / "raw")
    spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    ).write.parquet(in_path)

    wd = str(tmp_path / "work")
    rc = pretrain_corpus.main([
        "--input", in_path, "--workdir", wd,
        "--with-c4", "--with-markdown",
        "--light-parts", "4", "--heavy-parts", "1",
        "--master", "local[2]",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs"] == 40 and stats["kept"] > 0

    # manual composition: c4 over the decision-kept docs
    docs = spark.read.parquet(f"{wd}/docs")
    keep = spark.read.parquet(f"{wd}/decisions").filter("kept").select(
        "doc_id"
    )
    c4 = {
        r.orig: r
        for r in textops.c4_line_filter(docs.join(keep, "doc_id"))
        .join(
            docs.select("doc_id", F.col("orig_doc_id").alias("orig")),
            "doc_id",
        )
        .collect()
    }
    kept_rows = {r.doc_id: r for r in
                 spark.read.parquet(f"{wd}/kept").collect()}
    want_shipped = {k for k, r in c4.items() if r.page_ok}
    assert set(kept_rows) == want_shipped
    # every 5th doc (lorem line) must be gone even where curation kept it
    assert all(int(d.split("-")[1]) % 5 != 0 for d in kept_rows)
    for d, r in kept_rows.items():
        assert r.text == c4[d].kept_text
        assert r.c4_lines_removed == c4[d].n_lines - c4[d].n_kept
    assert stats["c4_pages_dropped"] == stats["kept"] - len(kept_rows)
    assert stats["c4_lines_removed"] == sum(
        r.n_lines - r.n_kept for k, r in c4.items() if k in want_shipped
    )

    # markdown covers exactly the shipped set; text span -> paragraph
    # block, media span -> image block
    md = {r.doc_id: r for r in
          spark.read.parquet(f"{wd}/markdown").collect()}
    assert set(md) == set(kept_rows)
    assert stats["markdown_docs"] == len(kept_rows)
    for d, r in md.items():
        i = int(d.split("-")[1])
        assert r.markdown.endswith(f"![](media://s{i}/img)")
        assert r.markdown.startswith("The first sentence")
        assert r.n_blocks == 2
    assert stats["markdown_blocks"] == 2 * len(md)


def test_pretrain_corpus_script_gate(spark, tmp_path, capsys):
    """--with-script-gate ANDs script_profile.script_ok into `kept`:
    mixed-script docs that pass every other gate (length, quality,
    dedup) drop, pure-script docs survive; the stats line reports the
    rejection count."""
    import json as _json

    from pyspark.sql import functions as F

    from dompa_spark import graphops, textops
    from dompa_spark.jobs import pretrain_corpus

    stops = ["the", "and", "was", "that"]
    rows = []
    for i in range(8):
        words = []
        for j in range(88):
            if j % 2 == 0:
                words.append(stops[j // 2 % 4])
            else:
                # letters-only unique tokens: every shingle is unique
                # per doc (no accidental near-dups), and normalized
                # dedup can't collapse them either
                words.append(
                    "w" + chr(97 + i) + chr(97 + j % 26)
                    + chr(97 + j // 26)
                )
        t = " ".join(words)
        if i in (2, 3):  # sampled-in ids (hash-gated sample keeps them)
            t += " пример текста слово образец письмо буква" * 6
        rows.append((f"doc-{i}", t))
    spans = spark.createDataFrame(
        rows, "doc_id string, text string"
    ).select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    in_path = str(tmp_path / "in")
    spans.write.parquet(in_path)
    wd = str(tmp_path / "work")
    rc = pretrain_corpus.main([
        "--input", in_path, "--workdir", wd, "--domain-cap", "100",
        "--with-script-gate", "--master", "local[2]",
    ])
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    docs = spark.read.parquet(f"{wd}/docs")
    cur = {r.doc_id: r.kept
           for r in textops.curate_corpus(
               docs, domain_cap_n=100).collect()}
    sg = {r.doc_id: r.script_ok
          for r in textops.script_profile(docs).collect()}
    cc = {r.doc_id: r.is_canonical
          for r in graphops.dedup_components(
              textops.minhash_band_edges(docs)).collect()}
    key_of = {r.doc_id: r.orig_doc_id for r in docs.collect()}
    want = {key_of[d] for d in cur if cur[d] and sg[d] and cc.get(d, True)}
    got = {r.doc_id
           for r in spark.read.parquet(f"{wd}/kept").collect()}
    assert got == want
    # precondition: the gate did real work — the mixed-script docs
    # passed curation and were dropped by the script gate alone
    assert any(cur[d] and not sg[d] for d in cur)
    assert {"doc-2", "doc-3"}.isdisjoint(got)
    assert {"doc-4", "doc-7"} <= got
    assert stats["script_rejected"] == 2


def test_pretrain_corpus_script_gate_resume_refused(spark, tmp_path):
    """A decisions stage written WITHOUT --with-script-gate must be
    refused when a resumed run asks for the gate (it baked a gate-less
    `kept` bit) — the run_extract changed-geometry contract, caught in
    review before it shipped as a stats-time crash."""
    from pyspark.sql import functions as F

    from dompa_spark.jobs import pretrain_corpus

    rows = []
    for i in range(4):
        words = []
        for j in range(70):
            words.append(
                ["the", "and", "was", "that"][j // 2 % 4]
                if j % 2 == 0
                else "v" + chr(97 + i) + chr(97 + j % 26) + chr(97 + j // 26)
            )
        rows.append((f"doc-{i}", " ".join(words)))
    spans = spark.createDataFrame(
        rows, "doc_id string, text string"
    ).select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    in_path = str(tmp_path / "in")
    spans.write.parquet(in_path)
    wd = str(tmp_path / "work")
    base = ["--input", in_path, "--workdir", wd,
            "--domain-cap", "100", "--master", "local[2]"]
    assert pretrain_corpus.main(base) == 0
    with pytest.raises(ValueError, match="geometry"):
        pretrain_corpus.main(base + ["--with-script-gate"])
    # --no-resume recomputes the decisions stage with the gate
    assert pretrain_corpus.main(
        base + ["--with-script-gate", "--no-resume"]
    ) == 0
    dec = spark.read.parquet(f"{wd}/decisions")
    assert "script_ok" in dec.columns
    # the guard is bidirectional: resuming WITHOUT the gate against a
    # gated decisions stage must refuse too (its kept bit is stricter
    # than the current flags)
    with pytest.raises(ValueError, match="geometry"):
        pretrain_corpus.main(base)


def test_recrawl_schedule_job_two_cycles(spark, tmp_path, capsys):
    """The recrawl loop end to end: two snapshot diffs accumulate in
    the observation log, the schedule equals the library composition,
    removed docs leave the schedule, and a duplicate cycle is
    refused."""
    import json as _json

    from dompa_spark import textops
    from dompa_spark.jobs import recrawl_schedule

    def snap(path, rows):
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.mode("overwrite").parquet(path)
        return path

    s0 = snap(str(tmp_path / "s0"),
              [(1, "alpha"), (2, "beta"), (3, "gamma")])
    s1 = snap(str(tmp_path / "s1"),
              [(1, "alpha CHANGED"), (2, "beta"), (4, "delta")])
    s2 = snap(str(tmp_path / "s2"),
              [(1, "alpha CHANGED twice"), (2, "beta again"),
               (3, "back"), (4, "delta")])
    obs = str(tmp_path / "obs")
    out = str(tmp_path / "sched")
    base = ["--obs", obs, "--output", out, "--master", "local[2]"]

    assert recrawl_schedule.main(
        ["--old", s0, "--new", s1] + base) == 0
    st1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st1 == {
        "cycle": 0, "docs_diffed": 4, "added": 1, "changed": 1,
        "unchanged": 1, "removed": 1, "scheduled": 3, "dead": 1,
    }

    assert recrawl_schedule.main(
        ["--old", s1, "--new", s2] + base) == 0
    st2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st2["cycle"] == 1
    assert st2["added"] == 1  # doc 3 revived

    # schedule == library composition over the accumulated log
    all_obs = spark.read.parquet(obs)
    want = sorted(
        map(tuple, textops.recrawl_priority(all_obs).collect())
    )
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got == want
    sched = {r["doc_id"]: r.asDict()
             for r in spark.read.parquet(out).collect()}
    # doc 3: removed at cycle 0, revived at cycle 1 -> scheduled again
    assert sched[3]["last_status"] == "added"
    assert sched[3]["interval_days"] is not None
    # doc 1 changed twice -> base div 3
    assert sched[1]["n_changes"] == 2
    assert sched[1]["interval_days"] == textops.RECRAWL_BASE_DAYS // 3

    # re-running the SAME snapshot pair (with or without --cycle) is
    # the crash-recovery path: no new cycle, no double-counted
    # observations, schedule recomputed — even after the schedule
    # output was lost mid-crash
    import shutil as _shutil2
    _shutil2.rmtree(out)
    assert recrawl_schedule.main(
        ["--old", s1, "--new", s2] + base) == 0
    str_ = _json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert str_["cycle"] == 1 and str_["recovered"] is True
    assert spark.read.parquet(obs).count() == 8  # still 2 cycles
    got_r = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got_r == want  # schedule rebuilt, identical
    assert recrawl_schedule.main(
        ["--old", s1, "--new", s2, "--cycle", "1"] + base) == 0
    assert _json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )["recovered"] is True

    # a completed cycle number with a DIFFERENT pair is refused
    with pytest.raises(ValueError, match="geometry"):
        recrawl_schedule.main(
            ["--old", s0, "--new", s2, "--cycle", "1"] + base)

    # crash recovery: a partial cycle dir (parquet rows, NO _SUCCESS)
    # is invisible to the completed-cycle list — the default cycle
    # re-picks its number, the overwrite replaces the partial rows,
    # and the schedule never saw them
    import glob as _glob
    import os as _os
    import shutil as _shutil

    partial = f"{obs}/cycle=2"
    _os.makedirs(partial)
    src = _glob.glob(f"{obs}/cycle=1/*.parquet")[0]
    _shutil.copy(src, f"{partial}/part-junk.parquet")
    s3 = snap(str(tmp_path / "s3"),
              [(1, "alpha CHANGED twice"), (2, "beta again"),
               (3, "back"), (4, "delta FRESH")])
    assert recrawl_schedule.main(
        ["--old", s2, "--new", s3] + base) == 0
    st3 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st3["cycle"] == 2  # the partial slot was retaken
    all_obs2 = spark.read.parquet(obs)
    # cycle 2 holds exactly this diff's 4 rows, not junk + 4
    assert all_obs2.filter("cycle = 2").count() == 4
    want2 = sorted(map(
        tuple, textops.recrawl_priority(all_obs2).collect()))
    got2 = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got2 == want2

    # ORPHAN cycle (_SUCCESS committed, _PAIR.json missing — a
    # pre-marker-era log or a crash between the parquet commit and
    # the marker write): the job must refuse to renumber over it or
    # silently drop its observations from the schedule
    cycle2_rows = sorted(
        map(tuple, all_obs2.filter("cycle = 2").collect())
    )
    _os.remove(f"{obs}/cycle=2/{recrawl_schedule.PAIR_MARKER}")
    s4 = snap(str(tmp_path / "s4"),
              [(1, "alpha final"), (2, "beta again"),
               (3, "back"), (4, "delta FRESH")])
    with pytest.raises(ValueError, match="orphan|_PAIR"):
        recrawl_schedule.main(["--old", s3, "--new", s4] + base)
    # recovery path A: explicitly re-diff the orphan slot with its
    # original snapshot pair — identical rows, marker restored
    assert recrawl_schedule.main(
        ["--old", s2, "--new", s3, "--cycle", "2"] + base) == 0
    capsys.readouterr()
    assert sorted(map(
        tuple, spark.read.parquet(obs).filter("cycle = 2").collect()
    )) == cycle2_rows
    # recovery path B: adopt the orphan data as-is
    _os.remove(f"{obs}/cycle=2/{recrawl_schedule.PAIR_MARKER}")
    assert recrawl_schedule.main(
        ["--old", s3, "--new", s4, "--adopt-orphans"] + base) == 0
    st4 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st4["cycle"] == 3  # numbering continued PAST the orphan
    all_obs3 = spark.read.parquet(obs)
    assert all_obs3.filter("cycle = 2").count() == 4  # data kept
    want3 = sorted(map(
        tuple, textops.recrawl_priority(all_obs3).collect()))
    assert sorted(
        map(tuple, spark.read.parquet(out).collect())) == want3
