"""Session-8 operators: Bloom membership dedup, corpus snapshot diff,
code-block extraction, embedding topic clusters."""

from pyspark.sql import functions as F

from dompa_spark import pipeline, textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- bloom_dedup ------------------------------------------------------


def test_bloom_dedup_no_false_negatives_and_verified_exact(spark):
    """Content present in the old side MUST bloom-hit (the filter's
    defining guarantee), exact_dup must equal true exact membership,
    and bloom_hit is a superset of exact_dup."""
    old = _docs(spark, [(i, f"shared doc {i % 4} body") for i in range(8)])
    new = _docs(
        spark,
        [(100 + i, f"shared doc {i} body") for i in range(4)]  # dups
        + [(200 + i, f"novel doc {i} body") for i in range(4)],
    )
    r = {
        x["doc_id"]: (x["bloom_hit"], x["exact_dup"])
        for x in textops.bloom_dedup(new, old).collect()
    }
    assert len(r) == 8
    for i in range(4):
        assert r[100 + i] == (True, True)  # no false negatives
    for i in range(4):
        b, e = r[200 + i]
        assert not e  # novel text is never exact_dup
    assert all(b or not e for b, e in r.values())


def test_bloom_dedup_saturated_filter_stays_exact(spark):
    """At a deliberately tiny m_bits the filter saturates: every probe
    hits (all bloom_hit True — false positives), but exact_dup stays
    correct because the verify join is what makes the operator exact."""
    old = _docs(spark, [(i, f"old text {i} payload") for i in range(64)])
    new = _docs(
        spark, [(1000 + i, f"new text {i} payload") for i in range(32)]
    )
    out = textops.bloom_dedup(new, old, m_bits=32, k=5).collect()
    assert len(out) == 32
    assert all(not x["exact_dup"] for x in out)
    # 64 keys x 5 probes into 32 bits set every bit (verified against
    # the DuckDB replay) -> every novel doc is a false positive
    assert all(x["bloom_hit"] for x in out)


def test_bloom_dedup_bitmap_bounded_and_broadcast(spark):
    """The bitmap table is bounded by m_bits/32 rows regardless of the
    old corpus size, and the probe join broadcasts it."""
    old = _docs(spark, [(i, f"doc {i} words here") for i in range(200)])
    new = _docs(spark, [(900 + i, f"doc {i} words here") for i in range(5)])
    out = textops.bloom_dedup(new, old, m_bits=1 << 10, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # every new doc's text exists in old -> all exact
    assert all(x["exact_dup"] for x in out.collect())


def test_bloom_dedup_persisted_artifacts_equal_inplace(spark):
    """old_bitmap=/old_fps= (the --save-bloom-index hatch) must
    reproduce the derive-in-place answer exactly — artifacts are a pure
    function of the old corpus's content."""
    old = _docs(spark, [(i, f"content {i % 6} here") for i in range(12)])
    new = _docs(spark, [(50 + i, f"content {i} here") for i in range(9)])
    inplace = sorted(
        tuple(r) for r in textops.bloom_dedup(new, old).collect()
    )
    bm = textops.bloom_bitmap(old)
    fps = textops.bloom_fps(old)
    via_artifacts = sorted(
        tuple(r)
        for r in textops.bloom_dedup(
            new, old_bitmap=bm, old_fps=fps
        ).collect()
    )
    assert inplace == via_artifacts


def test_bloom_merge_equals_rebuild(spark):
    """bitmap(A ∪ B) == bloom_merge(bitmap(A), bitmap(B)) — bit_or
    associativity is what makes per-cycle accumulation constant-work."""
    a = _docs(spark, [(i, f"side a doc {i}") for i in range(10)])
    b = _docs(spark, [(100 + i, f"side b doc {i}") for i in range(10)])
    merged = {
        r["word"]: r["bits"]
        for r in textops.bloom_merge(
            textops.bloom_bitmap(a), textops.bloom_bitmap(b)
        ).collect()
    }
    rebuilt = {
        r["word"]: r["bits"]
        for r in textops.bloom_bitmap(a.unionByName(b)).collect()
    }
    assert merged == rebuilt


def test_bloom_dedup_requires_old_side(spark):
    import pytest as _pytest

    new = _docs(spark, [(1, "x")])
    with _pytest.raises(ValueError):
        textops.bloom_dedup(new)


# --- corpus_diff ------------------------------------------------------


def test_corpus_diff_all_four_statuses(spark):
    old = _docs(
        spark,
        [(1, "alpha"), (2, "beta"), (3, "gamma")],  # 4 absent -> added
    )
    new = _docs(
        spark,
        [(1, "alpha"), (2, "beta CHANGED"), (4, "delta")],  # 3 -> removed
    )
    r = {x["doc_id"]: x["status"] for x in
         textops.corpus_diff(old, new).collect()}
    assert r == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_diff_fps_null_on_absent_side(spark):
    old = _docs(spark, [(1, "a")])
    new = _docs(spark, [(2, "b")])
    rows = {x["doc_id"]: x for x in textops.corpus_diff(old, new).collect()}
    assert rows[1]["new_fp"] is None and rows[1]["old_fp"] is not None
    assert rows[2]["old_fp"] is None and rows[2]["new_fp"] is not None


# --- extract_code -----------------------------------------------------


def _parse_blocks(spark, html):
    df = spark.createDataFrame([("7", html)], "doc_id string, html string")
    wrapped = df.select(
        "doc_id",
        F.array(textops.html_span(F.col("html"), 0)).alias("spans"),
    )
    return sorted(
        tuple(r)
        for r in textops.extract_code_df(
            pipeline.parse_nodes_df(wrapped)
        ).collect()
    )


def test_extract_code_fenced_bare_and_inline_decoy(spark):
    rows = _parse_blocks(
        spark,
        '<div><p>x <code>inline decoy</code></p>'
        '<pre><code class="language-rust">fn main() {}</code></pre>'
        "<pre>plain block</pre></div>",
    )
    assert rows == [
        (7, 0, "rust", "fn main() {}"),
        (7, 1, None, "plain block"),
    ]


def test_extract_code_classless_and_unprefixed_class(spark):
    """A code child without a class, or whose class lacks the
    'language-' prefix, yields lang NULL but still surfaces its text."""
    rows = _parse_blocks(
        spark,
        "<div><pre><code>no class</code></pre>"
        '<pre><code class="hl">unprefixed</code></pre></div>',
    )
    assert rows == [(7, 0, None, "no class"), (7, 1, None, "unprefixed")]


def test_extract_code_direct_child_text_contract(spark):
    """Markup nested in a code block keeps its own text — only DIRECT
    child text surfaces (the tables/anchors/title contract)."""
    rows = _parse_blocks(
        spark,
        '<div><pre><code class="language-c">a <b>bold</b> b</code></pre>'
        "</div>",
    )
    assert rows == [(7, 0, "c", "a  b")]


# --- cluster_topics ---------------------------------------------------


def test_cluster_topics_labels_separate_clusters(spark):
    """Two well-separated embedding clusters whose docs use disjoint
    content words: each cluster's top term must be its own word, and
    the everywhere-word must be stopword-gated out."""
    dim = 4
    rows = []
    texts = []
    for i in range(24):
        hot = 1.0 if i % 2 == 0 else -1.0
        # cluster axis 0 vs axis 1; vec_ids 10,11 seed one of each
        v = [hot, -hot, 0.1, 0.1]
        rows.append((i, v, i % 2))
        word = "appletoken" if i % 2 == 0 else "bananatoken"
        texts.append((i, f"the {word} {word} filler{i} the"))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    docs = _docs(spark, texts)
    out = textops.cluster_topics(
        emb,
        docs,
        dim=dim,
        n_centroids=2,
        train_iters=2,
        top_terms=1,
        min_count=2,
        df_max_ppm=500_000,
    ).collect()
    tops = {x["cid"]: x["term"] for x in out if x["rank"] == 1}
    assert sorted(tops.values()) == ["appletoken", "bananatoken"]
    sizes = {x["cid"]: x["n_docs"] for x in out}
    assert sorted(sizes.values()) == [12, 12]
    # 'the' appears in every doc -> excluded by the ppm df gate
    assert all(x["term"] != "the" for x in out)


# --- distinct_sketch --------------------------------------------------


def test_distinct_sketch_duplicate_insensitive_and_bounded(spark):
    """min over a multiset == min over its set: tripling every doc must
    leave est_distinct EXACTLY unchanged (n_tokens triples) — the
    property that makes the sketch a plain partial-agg MIN. Accuracy on
    a known cardinality stays within the ~1/sqrt(k) band (deterministic
    fixture, so the bound is a pinned fact, not a flaky sample)."""
    docs = spark.createDataFrame(
        [(i, "g1", " ".join(f"w{j}" for j in range(i * 20, i * 20 + 20)))
         for i in range(25)],  # 500 distinct terms, 500 tokens
        "doc_id long, source string, text string",
    )
    one = textops.distinct_sketch(docs).collect()[0]
    tripled = docs.unionByName(docs).unionByName(docs)
    three = textops.distinct_sketch(tripled).collect()[0]
    assert one["est_distinct"] == three["est_distinct"]
    assert three["n_tokens"] == 3 * one["n_tokens"] == 1500
    truth = 500
    assert abs(one["est_distinct"] - truth) / truth < 0.40  # k=32 band


def test_distinct_sketch_groups_independent(spark):
    """Each group's estimate sees only its own terms: a tiny group next
    to a large one keeps a tiny estimate."""
    rows = [(1, "big", " ".join(f"t{j}" for j in range(400)))]
    rows += [(2, "small", "only three words")]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    r = {x["source"]: x for x in textops.distinct_sketch(docs).collect()}
    assert r["small"]["n_tokens"] == 3
    assert r["small"]["est_distinct"] <= 10
    assert r["big"]["est_distinct"] > 100


# --- heavy_hitters ----------------------------------------------------


def test_heavy_hitters_detects_hot_term_misses_rare(spark):
    """An engineered viral term clears the floor with an estimate in
    the sampling band; per-doc unique terms never surface (their
    estimate cannot reach min_est at rate*floor > corpus count)."""
    docs = spark.createDataFrame(
        [(i, "viral " * 40 + f"unique{i}") for i in range(100)],
        "doc_id long, text string",
    )
    r = {x["term"]: x for x in
         textops.heavy_hitters(docs, rate=4, min_est=40).collect()}
    assert "viral" in r
    est = r["viral"]["est_count"]
    truth = 4000
    assert abs(est - truth) / truth < 0.25  # deterministic sample band
    assert r["viral"]["sampled_n"] * 4 == est
    assert not any(t.startswith("unique") for t in r)


def test_heavy_hitters_deterministic_and_rate_scaled(spark):
    """Same input -> identical output (the sample is a pure hash
    function); rate=1 degenerates to the exact count."""
    docs = spark.createDataFrame(
        [(i, "hot hot cold") for i in range(30)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, textops.heavy_hitters(
        docs, rate=2, min_est=10).collect()))
    b = sorted(map(tuple, textops.heavy_hitters(
        docs, rate=2, min_est=10).collect()))
    assert a == b
    exact = {x["term"]: x["est_count"] for x in
             textops.heavy_hitters(docs, rate=1, min_est=1).collect()}
    assert exact == {"hot": 60, "cold": 30}


def test_cluster_topics_rank_tiebreak_deterministic(spark):
    """Equal counts break ties by term ascending — the (count desc,
    term asc) contract that keeps the value hash stable."""
    dim = 4
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(14)],
        "vec_id long, embedding array<float>, label int",
    )
    docs = _docs(spark, [(i, "zz aa zz aa mid") for i in range(14)])
    out = textops.cluster_topics(
        emb,
        docs,
        dim=dim,
        n_centroids=1,
        train_iters=1,
        top_terms=2,
        min_count=2,
        df_max_ppm=1_000_000,
    ).collect()
    ranked = sorted((x["rank"], x["term"]) for x in out)
    assert ranked == [(1, "aa"), (2, "zz")]  # same count, term asc
