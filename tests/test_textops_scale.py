"""Scale-shape assertions for the dedup/cap operator family (VERDICT r01):
the properties that separate "passes at sf0.01" from "survives 10^9 docs".

Each test builds a synthetic corpus engineered for the failure mode it
guards (uniform vocab for bucket spread, a mega-domain / mega-prefix for
skew) and asserts both the semantics (equality with the naive one-window
formulation) and the plan/data shape (bounded bucket occupancy, salted
partition keys, map-side partial aggregation).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dompa_spark import textops


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def _uniform_docs(spark, n=4000, words_per_doc=30):
    """n docs with pairwise-disjoint word sets (stride > words_per_doc)
    -> word hashes independent across docs -> simhash ~uniform."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
                lambda j: F.concat(F.lit("w"), (F.col("id") * 31 + j)),
            ),
        ).alias("text"),
    )


def test_simhash_band_buckets_spread(spark):
    """4 x 15-bit bands: on a 4k-doc uniform corpus every band must
    occupy > 10^3 distinct bucket keys with single-digit max occupancy —
    the candidate self-join stays ~linear in n. (The old 8-bit bands
    collapsed 4k docs into <= 256 buckets per band: quadratic.)"""
    sh = textops.simhash(_uniform_docs(spark))
    bands = sh.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", b * textops.SIMHASH_BAND_BITS)
                    .bitwiseAND(F.lit(textops.SIMHASH_BAND_MASK))
                    .alias("bkey"),
                )
                for b in range(textops.SIMHASH_BANDS)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bkey")
    stats = (
        bands.groupBy("band", "bkey")
        .count()
        .groupBy("band")
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("count").alias("max_bucket"),
        )
        .collect()
    )
    assert len(stats) == textops.SIMHASH_BANDS
    for r in stats:
        assert r.n_buckets > 1000, (r.band, r.n_buckets)
        assert r.max_bucket <= 8, (r.band, r.max_bucket)


def _skewed_sources(spark, n=2000):
    """One mega domain holds 50% of all rows; the rest spread over 17."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n // 2, F.lit("mega"))
        .otherwise(F.concat(F.lit("s"), F.col("id") % 17))
        .alias("source"),
    )


def test_domain_cap_matches_naive_on_skewed_corpus(spark):
    df = _skewed_sources(spark)
    got = {
        (r.doc_id, r.source, r.rank_in_source)
        for r in textops.domain_cap(df).collect()
    }
    w = Window.partitionBy("source").orderBy("doc_id")
    naive = (
        df.select(F.col("doc_id").cast("long").alias("doc_id"), "source")
        .withColumn("rank_in_source", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_source") <= textops.DOMAIN_CAP)
    )
    want = {(r.doc_id, r.source, r.rank_in_source) for r in naive.collect()}
    assert got == want
    assert len(got) == textops.DOMAIN_CAP * 18  # mega + 17 tail domains


def test_domain_cap_phase1_is_salted(spark):
    """The first window must partition by (source, salt) — that's the
    property that keeps the mega-domain sort off a single task."""
    plan = plan_of(textops.domain_cap(_skewed_sources(spark)))
    windows = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert any("salt" in ln and "source" in ln for ln in windows), plan
    # and phase 1 bounds every task's group: no (source, salt) bucket
    # holds more than a hash-uniform share of the mega domain
    df = _skewed_sources(spark)
    salted = df.select(
        "source",
        (F.abs(F.xxhash64(F.col("doc_id").cast("long")))
         % textops.DOMAIN_CAP_SALTS).alias("salt"),
    )
    max_bucket = (
        salted.groupBy("source", "salt").count().agg(F.max("count")).first()[0]
    )
    # mega = 1000 rows / 16 salts ~ 62; allow generous hash wobble
    assert max_bucket <= 150, max_bucket


def test_dedup_exact_matches_naive_on_mega_prefix(spark):
    """50% of docs share one viral 3-word prefix; groupBy-min + join must
    reproduce the window formulation's keep/dup decisions exactly."""
    n = 2000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit("viral boilerplate prefix tail"), F.col("id")),
        )
        .otherwise(
            F.concat(F.lit("unique "), F.col("id"), F.lit(" head body"))
        )
        .alias("text"),
    )
    got = {
        (r.doc_id, r.dedup_key, r.keep_doc_id, r.is_dup)
        for r in textops.dedup_exact_prefix(df).collect()
    }
    key = F.concat_ws(" ", F.slice(F.split("text", " "), 1, 3))
    keyed = df.select(
        F.col("doc_id").cast("long").alias("doc_id"), key.alias("dedup_key")
    )
    w = Window.partitionBy("dedup_key")
    naive = keyed.select(
        "doc_id",
        "dedup_key",
        F.min("doc_id").over(w).alias("keep_doc_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
    )
    want = {
        (r.doc_id, r.dedup_key, r.keep_doc_id, r.is_dup)
        for r in naive.collect()
    }
    assert got == want
    assert sum(1 for t in got if t[3]) == n // 2 - 1  # the viral dups


def _pseudo_vectors(spark, n, dim=16):
    """Deterministic pseudo-random embeddings (md5-derived components in
    [-1, 1]) — uniform directions, so SRP buckets fill ~uniformly."""
    comp = lambda i: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{i}"))),
                1, 15,
            ),
            16, 10,
        ).cast("long") % 2001 - 1000
    ) / 1000.0
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(i) for i in range(dim)]).alias("v"),
    )


def test_srp_candidates_grow_linearly_with_corpus(spark):
    """The plane count is a parameter precisely so it can track log2(n):
    doubling the corpus while adding one plane must keep candidates-per-
    vector flat (~linear growth), not quadratic."""
    import math

    counts = {}
    for n in (1000, 2000):
        emb = _pseudo_vectors(spark, n)
        planes = int(math.log2(n)) + 2
        counts[n] = textops.srp_candidate_pairs(
            emb, dim=16, n_planes=planes, n_tables=2
        ).count()
    per_vec_1k = counts[1000] / 1000
    per_vec_2k = counts[2000] / 2000
    # quadratic growth would double candidates-per-vector; allow wobble
    assert per_vec_2k <= per_vec_1k * 1.5 + 0.1, counts


def test_srp_hot_bucket_salt_bounds_candidates(spark):
    """A tight semantic cluster (40% of vectors nearly identical => one
    bucket in every table, which no amount of extra SRP planes can
    split) must trigger the salt-group refinement: candidate pairs stay
    ~B*cap/2 instead of the unguarded B^2/2 blowup."""
    n, cluster, cap = 1000, 400, 50
    base = _pseudo_vectors(spark, n)
    # cluster vectors: one shared direction + small per-vector jitter
    jitter = lambda i: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("vec_id").cast("string"),
                               F.lit(f"j{i}"))),
                1, 15,
            ),
            16, 10,
        ).cast("long") % 2001 - 1000
    ) / 1000.0 * 0.01
    # asymmetric shared direction: a symmetric one (all 1.0) makes any
    # balanced ±1 plane dot to ~0 and split the cluster on jitter signs
    clustered = base.select(
        "vec_id",
        F.when(
            F.col("vec_id") < cluster,
            F.array(*[
                F.lit(1.0 + 0.37 * i / 16.0) + jitter(i) for i in range(16)
            ]),
        ).otherwise(F.col("v")).alias("v"),
    )
    capped = textops.srp_candidate_pairs(
        clustered, dim=16, n_planes=12, n_tables=2, bucket_cap=cap
    ).count()
    uncapped = textops.srp_candidate_pairs(
        clustered, dim=16, n_planes=12, n_tables=2, bucket_cap=10**9
    ).count()
    assert uncapped >= cluster * (cluster - 1) // 4  # the blowup is real
    # bound: ~2 tables * ceil(B/cap) groups * C(~cap, 2) pairs + noise
    assert capped <= 2 * (cluster // cap + 1) * cap * cap, (capped, uncapped)
    assert capped < uncapped / 3, (capped, uncapped)


def test_minhash_band_edges_linear_on_clique(spark):
    """200 identical docs: the pair graph is the quadratic object
    (C(200,2) pairs); the star-edge list must stay linear (199 edges)
    while producing one cluster."""
    from dompa_spark import graphops

    n = 200
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same viral boilerplate text repeated verbatim").alias(
            "text"
        ),
    )
    edges = textops.minhash_band_edges(df)
    assert edges.count() == n - 1
    cc = graphops.connected_components(edges).collect()
    assert len(cc) == n and all(r.component == 0 for r in cc)


def test_lsh_construction_runs_no_spark_job(spark):
    """VERDICT r01 item 4: building the ANN/dedup plans must not fire a
    driver-side job (the old dim probe ran df.first() per construction)."""
    sc = spark.sparkContext
    emb = _pseudo_vectors(spark, 50).select(
        "vec_id", F.col("v").alias("embedding")
    )
    sc.setJobGroup("lsh-construct", "construction-only")
    try:
        textops.ann_lsh_topk(emb, dim=16)
        textops.dedup_embedding_cosine(
            emb.select("vec_id", "embedding"), dim=16
        )
        ids = sc.statusTracker().getJobIdsForGroup("lsh-construct")
    finally:
        sc.setJobGroup("", "")
    assert ids == [], ids


def test_vocab_topk_aggregates_map_side(spark):
    """Both aggregation levels must partial-aggregate before their
    shuffles — the raw token stream never crosses the wire."""
    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma alpha").alias("text"),
    )
    plan = plan_of(textops.vocab_topk(df))
    assert "partial_count" in plan, plan
    assert "windowspecdefinition" not in plan, plan
    got = {r.word: (r.n_occurrences, r.n_docs)
           for r in textops.vocab_topk(df).collect()}
    assert got == {"alpha": (100, 50), "beta": (50, 50), "gamma": (50, 50)}


def test_embed_dim_constant_matches_testdata():
    import os

    import pytest

    path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata absent")
    import pyarrow.parquet as pq

    import __spark_entry__ as entry_mod

    row = pq.read_table(path, columns=["embedding"]).slice(0, 1)
    assert len(row.column("embedding")[0]) == entry_mod.EMBED_DIM


def test_dedup_exact_keeper_aggregates_map_side(spark):
    """The keeper table must come from a partial (map-side) min — the
    property that collapses a mega-group before the shuffle."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("same prefix here x").alias("text")
    )
    plan = plan_of(textops.dedup_exact_prefix(df))
    assert "partial_min" in plan, plan
    assert "windowspecdefinition" not in plan, plan  # no window at all


def test_arrow_kernels_tolerate_null_text(spark):
    """Null-tolerance regression (ADVICE r02): a null text row must not
    kill the Arrow batch. simhash propagates null (like the old JVM
    expression); the minhash path filters null-shingle rows upstream."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.simhash for r in textops.simhash(df).collect()}
    assert rows[2] is None
    assert rows[1] is not None and rows[3] is not None
    # minhash: null text -> words(null)=null -> size filter drops the row
    sigs = textops.minhash_sigs(df).collect()
    assert sorted(r.doc_id for r in sigs) == [1, 3]
    assert all(len(r.sig) == textops.N_MINHASH for r in sigs)
    # repetition: one row per doc — a null-text doc is REPORTED as
    # rejected (n_words=0 fails the floor), never silently dropped
    # (ADVICE r03)
    rep = {r.doc_id: r for r in textops.repetition_scores(df).collect()}
    assert sorted(rep) == [1, 2, 3]
    assert rep[2].n_words == 0 and rep[2].repetition_ok is False
    assert rep[2].dup_word_ratio == 0.0 and rep[2].top_bigram_frac == 0.0


def _clique_docs(spark, n=500, clique=200):
    """clique docs share one viral boilerplate text; the rest have
    pairwise-disjoint vocabularies (no accidental near-dups)."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < clique,
            F.lit("the same viral boilerplate text repeated verbatim "
                  "across the whole crawl tier"),
        ).otherwise(
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(11)),
                    lambda j: F.concat(F.lit("u"), F.col("id") * 37 + j),
                ),
            )
        ).alias("text"),
    )


def test_minhash_pairs_hot_bucket_salt_bounds_candidates(spark):
    """VERDICT r02 #1: a clique of B identical docs lands in ONE
    (band, bkey) bucket per band; the salted cap must bound the pair
    output ~B*cap/2 per band instead of B^2/2."""
    n, clique, cap = 500, 200, 10
    df = _clique_docs(spark, n, clique)
    uncapped = textops.minhash_lsh_pairs(df, bucket_cap=10**9).count()
    capped = textops.minhash_lsh_pairs(df, bucket_cap=cap).count()
    assert uncapped >= clique * (clique - 1) // 2  # the blowup is real
    # bound: 4 bands x ceil(B/cap) salt groups x C(cap,2), plus noise
    bands = textops.LSH_BANDS
    assert capped <= bands * (clique // cap + 1) * cap * cap, (
        capped, uncapped)
    assert capped < uncapped / 2, (capped, uncapped)


def test_simhash_dedup_hot_bucket_salt_bounds_candidates(spark):
    """Same guard for the wide-simhash pair operator (the internal
    with_near_dups augmentation adds a second, smaller clique of
    mutated copies — bounds stay generous to cover it)."""
    n, clique, cap = 500, 200, 10
    df = _clique_docs(spark, n, clique)
    uncapped = textops.simhash_dedup(df, bucket_cap=10**9).count()
    capped = textops.simhash_dedup(df, bucket_cap=cap).count()
    assert uncapped >= clique * (clique - 1) // 2
    assert capped < uncapped / 2, (capped, uncapped)


def test_simhash_wide_band_key_space(spark):
    """VERDICT r02 #2: the wide fingerprint's 30-bit bands must spread a
    uniform corpus over the full 2^30 key space (>10^6 possible keys —
    vs 32,768 for 15-bit bands): essentially collision-free buckets at
    4k docs and keys reaching far beyond the 15-bit ceiling."""
    sh = textops.simhash_wide(_uniform_docs(spark))
    banded = textops._simhash_wide_banded(sh)
    stats = (
        banded.groupBy("band", "bkey")
        .count()
        .groupBy("band")
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("count").alias("max_bucket"),
            F.max("bkey").alias("max_key"),
        )
        .collect()
    )
    assert len(stats) == 4
    for r in stats:
        assert r.n_buckets > 3900, (r.band, r.n_buckets)  # ~no collisions
        assert r.max_bucket <= 3, (r.band, r.max_bucket)
        assert r.max_key > (1 << 25), (r.band, r.max_key)  # wide key space
        assert r.max_key <= textops.SIMHASH_WIDE_BAND_MASK


def test_bucket_stats_flag_hot_buckets(spark):
    """Telemetry contract: on a clique corpus the stats row must show
    the cap firing (n_hot_buckets > 0) and the capped pair bound far
    below the raw bound; on a uniform corpus nothing is hot."""
    clique_stats = textops.minhash_bucket_stats(
        _clique_docs(spark), cap=10
    ).collect()
    assert all(r.n_hot_buckets >= 1 for r in clique_stats)
    assert all(r.capped_pair_bound < r.raw_pair_bound / 2
               for r in clique_stats)
    assert all(r.max_bucket_n >= 200 for r in clique_stats)
    uniform_stats = textops.simhash_bucket_stats(
        _uniform_docs(spark, n=500), cap=64
    ).collect()
    assert all(r.n_hot_buckets == 0 for r in uniform_stats)
    assert all(r.capped_pair_bound == r.raw_pair_bound
               for r in uniform_stats)


def test_curate_corpus_single_scan(spark, tmp_path):
    """VERDICT r02 #3: curate must read the input ONCE (cached slim
    projection), not once per stage. Every file scan in the plan must
    sit under an InMemoryTableScan (i.e. be the cached relation's
    definition, not an independent read), and the stage flags must
    still agree with the standalone operators."""
    import os

    path = os.path.join(str(tmp_path), "docs.parquet")
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), (F.col("id") % 40).cast("int")),
                lambda j: F.concat(F.lit("the w"), F.col("id") * 7 + j),
            ),
        ).alias("text"),
        F.concat(F.lit("s"), F.col("id") % 9).alias("source"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("other").alias("lang"),
    )
    docs.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    try:
        cur = textops.curate_corpus(df)
        plan = cur._jdf.queryExecution().executedPlan().toString()
        n_scans = plan.count("FileScan parquet")
        n_cached = plan.count("InMemoryTableScan")
        assert n_cached > 0, plan
        # every FileScan line is the cached relation's stored plan —
        # an uncached consumer would add a FileScan without a matching
        # InMemoryTableScan above it
        assert n_scans == n_cached, (n_scans, n_cached)
        got = {r.doc_id: (r.quality_ok, r.sampled, r.capped_in, r.is_dup)
               for r in cur.collect()}
        q = {r.doc_id for r in textops.quality_scores(df).collect()
             if r.quality_score >= textops.CURATE_QUALITY_MIN}
        s = {r.doc_id for r in textops.sample_stratified(df).collect()}
        c = {r.doc_id for r in textops.domain_cap(df).collect()}
        d = {r.doc_id: r.is_dup
             for r in textops.dedup_exact_prefix(df).collect()}
        assert len(got) == 300
        for i, (qa, sa, ca, da) in got.items():
            assert qa == (i in q) and sa == (i in s) and ca == (i in c)
            assert da == d[i]
    finally:
        spark.catalog.clearCache()


def test_vocab_and_tfidf_explode_once(spark, tmp_path):
    """VERDICT r02 #4: the token-stream explode (the dominant byte
    volume) must appear exactly once in the executed plan — vocab
    computes both aggregates in one cascade (no join), tfidf derives
    df_w from tf via a reused shuffle stage."""
    import os

    path = os.path.join(str(tmp_path), "docs2.parquet")
    spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("alpha"),
            F.concat(F.lit("w"), F.col("id") % 17),
            F.lit("beta alpha"),
        ).alias("text"),
    ).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)

    vocab = textops.vocab_topk(df)
    vocab.collect()
    vplan = (
        vocab._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert vplan.count("Generate") == 1, vplan
    assert "Join" not in vplan, vplan  # single aggregate cascade

    tfidf = textops.tfidf_top_terms(df)
    tfidf.collect()
    tplan = (
        tfidf._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert tplan.count("Generate") == 1, tplan


def test_fused_shingle_kernel_matches_expression(spark):
    """Differential guard for the fused Python shingle kernel
    (shingle_sets / minhash_sigs) vs the shingles3() Catalyst
    expression it replaced: str.split(' ') must equal
    F.split(text, ' ', -1) (keeps empties, no regex collapsing) and
    dict.fromkeys must equal array_distinct (first-occurrence order)
    on adversarial texts — doubled/leading/trailing spaces, unicode,
    empties, shared shingles."""
    texts = [
        "a b c d e",
        "a  b c",              # doubled space -> empty words
        " a b c ",             # leading/trailing spaces
        "",                    # single empty word
        "x y",                 # under 3 words
        "ünï çödé wörds ünï çödé wörds",  # unicode + repeat shingles
        "p q r p q r p q r",   # all shingles repeat
        "tab\tand newline\nare not separators x y z",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fused = {r.doc_id: list(r.sh)
             for r in textops.shingle_sets(df, keep_empty=True).collect()}
    expr = {r.doc_id: list(r.sh)
            for r in df.select("doc_id",
                               textops.shingles3().alias("sh")).collect()}
    assert fused == expr
    # and the fused minhash drops exactly the <3-word docs
    sig_ids = sorted(r.doc_id
                     for r in textops.minhash_sigs(df).collect())
    assert sig_ids == sorted(i for i, t in enumerate(texts)
                             if len(t.split(" ")) >= 3)


def test_flattened_simhash_matches_per_row_reference(spark):
    """Differential guard for the flattened simhash kernels: the
    reduceat batch form must be bit-identical to a per-row Python
    reference of the spec (majority rule over md5-per-word bit
    families) on adversarial texts, for both the 60-bit hash and the
    120-bit halves."""
    import hashlib

    texts = [
        "a", "", "a  b", " lead", "trail ",
        "many words spread over a longer document with repeats repeats",
        "ünï çödé", "x " * 300 + "tail",
    ]

    def ref_half(t, half):
        b0, b1 = (0, 8) if half == 0 else (8, 16)
        ws = t.split(" ")
        out = 0
        for b in range(60):
            ones = sum(
                (int.from_bytes(
                    hashlib.md5(w.encode()).digest()[b0:b1], "big")
                 >> 4 >> b) & 1
                for w in ws
            )
            if ones * 2 > len(ws):
                out |= 1 << b
        return out

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got60 = {r.doc_id: r.simhash for r in textops.simhash(df).collect()}
    assert got60 == {i: ref_half(t, 0) for i, t in enumerate(texts)}
    gotw = {r.doc_id: (r.simhash_lo, r.simhash_hi)
            for r in textops.simhash_wide(df).collect()}
    assert gotw == {
        i: (ref_half(t, 0), ref_half(t, 1)) for i, t in enumerate(texts)
    }


def test_fused_shingle_kernel_fuzz_vs_expression(spark):
    """Seeded fuzz: 300 random texts over an alphabet that stresses the
    split semantics (runs of spaces, unicode, quotes, empty) — the
    fused kernel and the shingles3() expression must agree exactly."""
    import random

    rng = random.Random(42)
    alphabet = ["a", "b", "ü", "€", '"', " ", "  ", "", "w1", "longword"]
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 30)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fused = {r.doc_id: list(r.sh)
             for r in textops.shingle_sets(df, keep_empty=True).collect()}
    expr = {r.doc_id: list(r.sh)
            for r in df.select(
                "doc_id", textops.shingles3().alias("sh")).collect()}
    assert fused == expr


def test_repetition_scores_semantics_and_mapside_plan(spark):
    """Gopher-style repetition gates: a boilerplate doc (one bigram
    dominating) must fail, a diverse doc must pass; and the whole
    operator is map-side — NO exchange anywhere in the plan (the
    bigram mode lives in the Arrow kernel, not in an explode+groupBy)."""
    diverse = " ".join(f"w{i}" for i in range(60))
    spammy = "buy now " * 40  # trailing empty word too
    df = spark.createDataFrame(
        [(1, diverse), (2, spammy.strip()), (3, "tiny doc")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.repetition_scores(df).collect()}
    assert out[1].repetition_ok
    assert out[1].dup_word_ratio == 0.0
    # "buy now buy now ...": bigram "now buy" (39x) and "buy now" (40x)
    # over 79 bigrams -> top fraction > 0.5; dup ratio ~ 1 - 2/80
    assert not out[2].repetition_ok
    assert out[2].top_bigram_frac > textops.REP_TOP_BIGRAM_MAX
    assert out[2].dup_word_ratio > textops.REP_DUP_WORD_MAX
    assert not out[3].repetition_ok  # under REP_MIN_WORDS
    assert out[3].top_bigram_frac == 1.0  # one bigram, once
    plan = plan_of(textops.repetition_scores(df))
    assert "Exchange" not in plan, plan


def test_ann_ivf_assignment_is_mapside_and_prunes(spark):
    """IVF-flat: the centroid argmin must partial-aggregate BEFORE its
    shuffle (a vector's K centroid rows collapse map-side — the plan
    carries partial_min), and each query must score only its probed
    inverted lists (~n_probe/n_centroids of the corpus), not the whole
    table."""
    emb = _pseudo_vectors(spark, 800).select(
        "vec_id", F.col("v").alias("embedding")
    )
    out = textops.ann_ivf_topk(emb, n_queries=6, k=5, dim=16)
    plan = plan_of(out)
    assert "partial_min" in plan, plan
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(6))
    for q, rs in by_q.items():
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
        cos = [r.cosine for r in sorted(rs, key=lambda r: r.rank)]
        assert cos == sorted(cos, reverse=True)
        # every neighbor lives in one of the query's probed lists
        assert len({r.cid for r in rs}) <= textops.IVF_PROBE


# ---------------------------------------------------------------------------
# fused dedup + telemetry (VERDICT r03 #2)
# ---------------------------------------------------------------------------


def _fused_plan_is_cache_fed(stats) -> None:
    """Every file/kernel scan in the stats plan must sit under an
    InMemoryTableScan (the cached banded/sig relations' stored
    definitions), i.e. materializing the pair side first makes the
    telemetry side a pure cache read — one hashing pass total."""
    plan = stats._jdf.queryExecution().executedPlan().toString()
    n_inmem = plan.count("InMemoryTableScan")
    assert n_inmem > 0, plan
    # an unfused stats plan has standalone scans with NO cache above
    # them; in the fused plan each printed scan is a cached relation's
    # stored plan (curate_corpus single-scan idiom)
    for scan in ("FileScan", "MapInPandas", "Scan ExistingRDD"):
        assert plan.count(scan) <= n_inmem, (scan, plan)


def test_minhash_fused_single_hash_pass(spark):
    docs = _clique_docs(spark)
    pairs, stats = textops.minhash_lsh_with_stats(docs, bucket_cap=10)
    _fused_plan_is_cache_fed(stats)
    # values identical to the standalone operators (same plans below
    # the shared cache) — the CORRECTNESS oracles transfer unchanged
    want_pairs = {(r.doc_a, r.doc_b, r.jaccard)
                  for r in textops.minhash_lsh_pairs(
                      docs, bucket_cap=10).collect()}
    got_pairs = {(r.doc_a, r.doc_b, r.jaccard) for r in pairs.collect()}
    assert got_pairs == want_pairs and got_pairs
    want_stats = {tuple(r) for r in textops.minhash_bucket_stats(
        docs, cap=10).collect()}
    got_stats = {tuple(r) for r in stats.collect()}
    assert got_stats == want_stats
    spark.catalog.clearCache()


def test_simhash_fused_single_hash_pass(spark):
    # clique corpus: identical docs -> hamming-0 pairs exist, and the
    # deterministic salt cap fires identically on both paths
    docs = _clique_docs(spark, n=200, clique=60)
    pairs, stats = textops.simhash_dedup_with_stats(docs)
    _fused_plan_is_cache_fed(stats)
    want_pairs = {(r.doc_a, r.doc_b, r.hamming)
                  for r in textops.simhash_dedup(docs).collect()}
    got_pairs = {(r.doc_a, r.doc_b, r.hamming) for r in pairs.collect()}
    assert got_pairs == want_pairs and got_pairs
    want_stats = {tuple(r) for r in textops.simhash_bucket_stats(
        docs).collect()}
    got_stats = {tuple(r) for r in stats.collect()}
    assert got_stats == want_stats
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# ANN quality gauges: recall + IVF list balance (VERDICT r03 #3/#4)
# ---------------------------------------------------------------------------


def _md5_comp(seed_col, i, scale=1.0):
    """One deterministic pseudo-random component in [-scale, scale]."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(seed_col, F.lit(f":{i}"))), 1, 15),
            16, 10,
        ).cast("long") % 2001 - 1000
    ) / 1000.0 * scale


def _clustered_vectors(spark, n, dim=16, n_clusters=10, noise=0.1):
    """n vectors in `n_clusters` tight clusters (cluster = vec_id %
    n_clusters, member = md5-derived center + small md5 noise). Queries
    (vec_id < 10) each sit in a distinct cluster, so the exact top-5 is
    in-cluster — the realistic shape ANN recall is judged on (random
    uniform vectors have no neighbor structure to recover)."""
    df = spark.range(n).select(F.col("id").alias("vec_id"))
    df = df.withColumn("c", F.col("vec_id") % n_clusters)
    cen = lambda i: _md5_comp(  # noqa: E731
        F.concat(F.lit("c"), F.col("c").cast("string")), i
    )
    noi = lambda i: _md5_comp(  # noqa: E731
        F.concat(F.lit("n"), F.col("vec_id").cast("string")), i, noise
    )
    return df.select(
        "vec_id",
        F.array(*[cen(i) + noi(i) for i in range(dim)]).alias("embedding"),
    )


def _uniform_with_clumped_seeds(spark, n, dim=16, seed_noise=0.02):
    """Uniform pseudo-random corpus whose IVF seed rows (vec_id in
    [10, 26)) are planted as one tight clique — the worst case for an
    untrained coarse quantizer: near-identical centroids partition the
    space badly until Lloyd spreads them."""
    df = spark.range(n).select(F.col("id").alias("vec_id"))
    is_seed = (F.col("vec_id") >= 10) & (F.col("vec_id") < 26)
    base = lambda i: _md5_comp(F.col("vec_id").cast("string"), i)  # noqa: E731
    clump = lambda i: _md5_comp(F.lit("seedbase"), i) + _md5_comp(  # noqa: E731
        F.concat(F.lit("sn"), F.col("vec_id").cast("string")), i, seed_noise
    )
    return df.select(
        "vec_id",
        F.array(
            *[F.when(is_seed, clump(i)).otherwise(base(i)) for i in range(dim)]
        ).alias("embedding"),
    )


def test_ann_recall_floor(spark):
    """recall@5 of the approximate paths vs the exact answer must clear
    0.8 at DEFAULT knobs on a clustered corpus — the blind-knob fix from
    VERDICT r03 #3. The ADC paths (pq/ivfpq) rank by approximate L2
    while the exact answer ranks by cosine, so their floor is lower —
    the gauge's job is to show exactly that gap. (Measured: ivf 1.0,
    lsh 0.98 at noise=0.1; pq/ivfpq track the geometry paths on this
    clustered corpus.)"""
    emb = _clustered_vectors(spark, 400)
    rows = {r.method: r for r in textops.ann_recall(emb, dim=16).collect()}
    assert set(rows) == {"ivf", "lsh", "pq", "ivfpq"}
    for m in ("ivf", "lsh"):
        assert rows[m].recall_at_k >= 0.8, (m, rows[m].recall_at_k)
    # pure-ADC floors are structurally lower: the quantizer collapses a
    # tight cluster to one code signature, so intra-cluster order
    # degenerates to the vec_id tiebreak (~topk/cluster_size baseline);
    # residual codes (ivfpq) resolve finer than flat pq. Measured:
    # ivfpq 0.6, pq 0.22 — the gauge exists to show exactly this.
    assert rows["ivfpq"].recall_at_k >= 0.5, rows["ivfpq"]
    assert rows["pq"].recall_at_k >= 0.15, rows["pq"]
    assert rows["ivfpq"].recall_at_k > rows["pq"].recall_at_k
    for m, r in rows.items():
        assert r.hits == round(r.recall_at_k * 50), r


def test_ann_pq_rerank_restores_recall(spark):
    """The textbook refine step: ADC shortlist of R*topk candidates +
    exact cosine re-rank. R >= cluster_size/topk makes the shortlist
    cover the whole collapsed cluster, so recall goes 0.22 -> 1.0
    while still reading only R*topk full vectors per query."""
    emb = _clustered_vectors(spark, 400)
    exact = textops.ann_cosine_topk(emb).select("query_id", "neighbor_id")
    out = textops.ann_pq_topk(emb, dim=16, rerank=8)
    hits = (
        out.select("query_id", "neighbor_id")
        .join(exact, ["query_id", "neighbor_id"])
        .count()
    )
    assert hits / 50 >= 0.9
    # output switches to exact-cosine form, descending
    rows = out.filter("query_id = 0").orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    cosines = [r.cosine for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_ivf_training_balances_lists(spark):
    """Why Lloyd training matters: with clumped seeds on a continuous
    corpus the untrained quantizer leaves a >5x max/mean list imbalance
    (probes scan way more than n_probe/n_centroids of the corpus);
    IVF_TRAIN_ITERS=2 iterations better than halve it. (Measured
    deterministic values: 5.22 untrained -> 3.50 -> 2.64 -> 2.12.)"""
    emb = _uniform_with_clumped_seeds(spark, 800)

    def max_over_mean(iters):
        ns = [
            r.list_n
            for r in textops.ivf_list_sizes(
                emb, dim=16, train_iters=iters
            ).collect()
        ]
        return max(ns) / (sum(ns) / len(ns))

    untrained = max_over_mean(0)
    trained = max_over_mean(textops.IVF_TRAIN_ITERS)
    assert untrained > 4.5, untrained
    assert trained < 3.0, trained
    assert trained < untrained / 1.8, (untrained, trained)


def test_semdedup_flags_exactly_the_perturbed_copies(spark):
    """SemDeDup on a uniform corpus + the engineered perturbed copies:
    the flagged set is exactly the perturbed ids (uniform 16-dim
    directions never reach cosine 0.95 by chance; each copy lands in
    its original's Voronoi cell), keepers carry NULL nn_cosine, dups
    carry ~1.0."""
    emb = _pseudo_vectors(spark, 120).select(
        "vec_id", F.col("v").alias("embedding")
    )
    out = textops.semdedup(emb, dim=16).collect()
    assert len(out) == 120 + 30
    flagged = {r.vec_id for r in out if r.is_dup}
    assert flagged == {i + 10_000 for i in range(0, 120, 4)}
    for r in out:
        if r.is_dup:
            assert r.nn_cosine is not None and r.nn_cosine >= 0.99, r
        else:
            assert r.nn_cosine is None, r


def test_semdedup_min_id_keeper_and_cluster_scope(spark):
    """Three verbatim-identical vectors: the lowest id keeps (the
    dedup_exact contract), the other two flag with nn_cosine 1.0, and
    all three share one cluster. augment=False on a uniform corpus
    flags nothing else."""
    emb = _pseudo_vectors(spark, 100).select(
        "vec_id", F.col("v").alias("embedding")
    )
    src = emb.filter(F.col("vec_id") == 50)
    aug = emb
    for off in (150, 151):
        aug = aug.unionByName(
            src.select(
                (F.col("vec_id") + off).alias("vec_id"), "embedding"
            )
        )
    out = {
        r.vec_id: r
        for r in textops.semdedup(aug, dim=16, augment=False).collect()
    }
    assert len(out) == 102
    assert not out[50].is_dup
    for vid in (200, 201):
        assert out[vid].is_dup, out[vid]
        assert out[vid].nn_cosine == 1.0, out[vid]
        assert out[vid].cid == out[50].cid
    assert {v for v, r in out.items() if r.is_dup} == {200, 201}


def test_semdedup_comparisons_are_cluster_bounded(spark):
    """The scale contract: comparisons stay within clusters — no global
    self-join ever forms. On a clustered corpus every flagged vector's
    nn sits in the SAME cluster, and the executed plan contains no
    CartesianProduct (the only crossJoin is the broadcast 16-row
    centroid table)."""
    emb = _clustered_vectors(spark, 300, noise=0.01)
    res = textops.semdedup(emb, dim=16, augment=False, cos_min=0.999)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    rows = res.collect()
    assert len(rows) == 300
    # noise=0.01 cluster members exceed cosine 0.999 -> every cluster
    # keeps exactly its min id per cid: flagged count = n - #cids
    n_keep = sum(1 for r in rows if not r.is_dup)
    assert n_keep == len({r.cid for r in rows}), n_keep


def _perceptron_reference(rows, n_features=64, iters=3, quality_min=0.5):
    """Pure-Python replay of train_quality_classifier: same labels
    (quality gate), same md5 feature hashing, same batch rounds."""
    import hashlib

    from dompa_spark.textops import STOPWORDS

    def feat(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % n_features

    docs = []
    for doc_id, text in rows:
        if text is None:
            docs.append((doc_id, -1, {}))
            continue
        ws = text.split(" ")
        n_tok = len(ws)
        n_stop = sum(1 for w in ws if w in STOPWORDS)
        mean_len = (len(text) - (n_tok - 1)) / n_tok
        score = round(
            min(1.0, n_tok / 64.0) * 0.5
            + round(n_stop / n_tok, 4) * 0.3
            + min(1.0, mean_len / 8.0) * 0.2,
            4,
        )
        y = 1 if score >= quality_min else -1
        fc: dict = {}
        for w in ws:
            fc[feat(w)] = fc.get(feat(w), 0) + 1
        docs.append((doc_id, y, fc))
    w = [0] * n_features
    for _ in range(iters):
        upd = [0] * n_features
        for _, y, fc in docs:
            margin = sum(c * w[f] for f, c in fc.items())
            if y * margin <= 0:
                for f, c in fc.items():
                    upd[f] += y * c
        w = [a + b for a, b in zip(w, upd)]
    out = {}
    for doc_id, y, fc in docs:
        s = sum(c * w[f] for f, c in fc.items())
        p = 1 if s > 0 else -1
        out[doc_id] = (y, s, p, p == y)
    return out


def test_quality_classifier_matches_python_reference(spark):
    """Differential: the distributed batch perceptron must reproduce the
    sequential reference bit-for-bit (labels, scores, preds) — the
    exact-integer-training claim."""
    rows = [
        (i, f"the quick brown fox {i} jumps over the lazy dog and "
            f"then it sat down to rest for a while in the sun " * 2)
        for i in range(10)
    ] + [
        (100 + i, f"junkword{i} zap") for i in range(10)
    ] + [(200, None), (201, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.label, r.score, r.pred, r.correct)
        for r in textops.train_quality_classifier(df).collect()
    }
    assert got == _perceptron_reference(rows)


def test_quality_classifier_learns_the_gate(spark):
    """On a corpus whose good/bad docs use disjoint vocabulary the
    learned classifier must actually separate them (training accuracy
    >= 0.9) — the distillation property a pipeline consumes."""
    good = [
        (i, "the and of a is " * 20 + f"topic{i % 7} report")
        for i in range(60)
    ]
    bad = [(100 + i, f"zz{i % 11} qq") for i in range(60)]
    df = spark.createDataFrame(good + bad, "doc_id long, text string")
    rows = textops.train_quality_classifier(df).collect()
    labels = {r.doc_id: r.label for r in rows}
    assert all(labels[i] == 1 for i, _ in good)
    assert all(labels[i] == -1 for i, _ in bad)
    acc = sum(1 for r in rows if r.correct) / len(rows)
    assert acc >= 0.9, acc


def test_quality_classifier_plan_shape(spark):
    """No window functions anywhere; the per-round weight join is a
    broadcast (the n_features-row side must never shuffle the corpus)."""
    df = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("some words here for doc "),
                 F.col("id").cast("string")).alias("text"),
    )
    out = textops.train_quality_classifier(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan.lower(), plan
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_curate_corpus_scoped_unpersists(spark, tmp_path):
    """ADVICE r03: the scoped variant must release the slim-projection
    cache on exit (repeated invocations in a long-lived session stay
    cache-bounded), while yielding the same verdicts as the plain
    call."""
    path = str(tmp_path / "docs")
    spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text body of doc "), F.col("id"),
                 F.lit(" with several words")).alias("text"),
        F.when(F.col("id") % 3 == 0, F.lit("en"))
        .otherwise(F.lit("de")).alias("lang"),
        F.concat(F.lit("s"), F.col("id") % 7).alias("source"),
    ).write.parquet(path)
    docs = spark.read.parquet(path)

    jsm = spark._jsparkSession.sharedState().cacheManager()
    want = {(r.doc_id, r.kept)
            for r in textops.curate_corpus(docs).collect()}
    spark.catalog.clearCache()
    assert jsm.isEmpty()
    with textops.curate_corpus_scoped(docs) as out:
        got = {(r.doc_id, r.kept) for r in out.collect()}
        assert not jsm.isEmpty()  # slim cache live inside the block
    assert jsm.isEmpty(), "scoped exit must unpersist the slim cache"
    assert got == want


def test_lm_surprisal_exact_buckets_and_oov(spark):
    """The LM quality gate computes EXACT integer surprisal buckets:
    a hand-built corpus where every count, N, and floor(log2(N//c)) is
    known in closed form, plus the OOV path via a small vocab_k cutoff
    (deterministic count-desc/word-asc tie-break) and the one-row-per-
    doc null-text contract."""
    df = spark.createDataFrame(
        [
            (1, "a a a a b"),       # 4x a, 1x b
            (2, "a a b c"),         # 2x a, 1x b, 1x c
            (3, None),              # null text -> zeros row, lm_ok false
            (4, "zzz"),             # the rarest word
        ],
        "doc_id long, text string",
    )
    # corpus: N=10; counts a=6, b=2, c=1, zzz=1
    # vocab_k=2 keeps {a (6), b (2)}; c and zzz are OOV (count=1)
    # surprisal: a -> floor(log2(10//6=1))=0; b -> floor(log2(5))=2
    #            OOV -> floor(log2(10//1))=3
    rows = {r.doc_id: r for r in textops.lm_surprisal_scores(
        df, vocab_k=2, surprisal_max=2.5).collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    r1 = rows[1]
    assert r1.n_tokens == 5 and r1.oov_ratio == 0.0
    assert r1.mean_surprisal == round((0 * 4 + 2) / 5, 4)  # 0.4
    assert r1.lm_ok is True
    r2 = rows[2]
    assert r2.n_tokens == 4 and r2.oov_ratio == 0.25
    assert r2.mean_surprisal == round((0 + 0 + 2 + 3) / 4, 4)  # 1.25
    assert r2.lm_ok is True
    r3 = rows[3]
    assert (r3.n_tokens, r3.oov_ratio, r3.mean_surprisal, r3.lm_ok) == (
        0, 0.0, 0.0, False)
    r4 = rows[4]  # single OOV token: mean=3.0 > 2.5 -> gated out
    assert r4.n_tokens == 1 and r4.oov_ratio == 1.0
    assert r4.mean_surprisal == 3.0 and r4.lm_ok is False


def test_lm_surprisal_vocab_tiebreak_deterministic(spark):
    """Equal-count words at the vocab_k boundary resolve by word ASC —
    the LM is identical across engines/partitionings, never dependent
    on which tied word a top-k heap happened to keep."""
    df = spark.createDataFrame(
        [(1, "x y"), (2, "y x"), (3, "x y z")],
        "doc_id long, text string",
    )
    # counts: x=3, y=3, z=1. vocab_k=1 must keep x (tie x/y -> word asc)
    rows = {r.doc_id: r for r in textops.lm_surprisal_scores(
        df, vocab_k=1).collect()}
    # N=7; x in-vocab: floor(log2(7//3=2))=1; y,z OOV: floor(log2(7))=2
    assert rows[1].mean_surprisal == round((1 + 2) / 2, 4)
    assert rows[3].oov_ratio == round(2 / 3, 4)


# ---------------------------------------------------------------------------
# segment_dedup (CCNet-style repeated-line removal)
# ---------------------------------------------------------------------------


def test_segment_dedup_newline_boilerplate(spark):
    """Lines shared verbatim across docs are stripped; unique lines
    survive in order; empty lines are min_chars-exempt; null-text docs
    report one row (n_segments=0, text_clean='') — never dropped."""
    rows = [
        (1, "COOKIE BANNER\nalpha unique one\nfooter text"),
        (2, "COOKIE BANNER\nbeta unique two\nfooter text"),
        (3, "gamma unique three\n\ndelta line"),
        (4, None),
        (5, "epsilon line\n\nzeta line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           textops.segment_dedup(df, mode="newline").collect()}
    assert out[1].text_clean == "alpha unique one"
    assert out[1].n_segments == 3 and out[1].n_removed == 2
    assert out[2].text_clean == "beta unique two"
    # docs 3 and 5 share only the empty line -> exempt, both untouched
    assert out[3].text_clean == "gamma unique three\n\ndelta line"
    assert out[3].n_removed == 0 and out[5].n_removed == 0
    assert out[4].n_segments == 0 and out[4].n_removed == 0
    assert out[4].text_clean == ""


def test_segment_dedup_within_doc_repeat_kept(spark):
    """The hot count is per DISTINCT doc: a segment repeated only
    within one document is site-unique content, not boilerplate, and
    must survive (in-doc repetition is repetition_scores' job)."""
    df = spark.createDataFrame(
        [(1, "dup line\ndup line\nuniq one"), (2, "other text")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           textops.segment_dedup(df, mode="newline").collect()}
    assert out[1].text_clean == "dup line\ndup line\nuniq one"
    assert out[1].n_removed == 0


def test_segment_dedup_words_mode_roundtrip_and_removal(spark):
    """words mode: fixed seg_words windows; a shared 5-word run at a
    window boundary is stripped from every doc carrying it, and docs
    with no hot window reconstruct byte-identically (fast path)."""
    shared = "v w x y z"
    df = spark.createDataFrame(
        [
            (1, shared + " a1 b1 c1 d1 e1 f1 g1"),
            (2, shared + " a2 b2 c2 d2 e2"),
            (3, "p q r s t u1 v1 w1"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           textops.segment_dedup(df, seg_words=5).collect()}
    assert out[1].text_clean == "a1 b1 c1 d1 e1 f1 g1"
    assert out[1].n_segments == 3 and out[1].n_removed == 1
    assert out[2].text_clean == "a2 b2 c2 d2 e2"
    # untouched doc: byte-identical original (split/rejoin is lossless,
    # and the fast path short-circuits to the source column anyway)
    assert out[3].text_clean == "p q r s t u1 v1 w1"
    assert out[3].n_removed == 0


def test_segment_dedup_shuffles_are_slim(spark):
    """The counting/candidate passes must shuffle only (doc_id, pos,
    hash) — at most ONE Exchange (the final doc-side equi-join, which
    AQE broadcasts away when boilerplate is sparse) may carry the text
    column, and the distinct-doc count must partial-aggregate map-side."""
    import re

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")],
        "doc_id long, text string",
    )
    plan = plan_of(textops.segment_dedup(df))
    assert "xxhash64" in plan, plan
    assert "partial_count" in plan, plan  # two-phase distinct agg
    blocks = re.findall(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan
    )
    assert blocks, plan
    texty = [b for b in blocks if re.search(r"\btext#\d+", b)]
    assert len(texty) <= 1, (texty, plan)


def test_pii_scrub_semantics_and_mapside_plan(spark):
    """Redaction order (email -> ip -> phone), digit-TLD non-emails
    falling through to the IP rule, null-text passthrough with zero
    counts, and a shuffle-free whole-stage-codegen plan."""
    rows = [
        (1, "mail a.b+c@ex-1.org or x@y.io ok"),
        (2, "host u@1.2.3.4 is not an email"),
        (3, "ip 192.168.10.250. call 555-123-4567 now"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textops.pii_scrub(df).collect()}
    assert out[1].text_redacted == "mail <EMAIL> or <EMAIL> ok"
    assert out[1].n_emails == 2 and out[1].n_ips == 0
    # digit TLD fails the email pattern; the IP inside gets masked
    assert out[2].text_redacted == "host u@<IP> is not an email"
    assert out[2].n_emails == 0 and out[2].n_ips == 1
    assert out[3].text_redacted == "ip <IP>. call <PHONE> now"
    assert out[3].n_ips == 1 and out[3].n_phones == 1
    assert out[4].text_redacted is None
    assert (out[4].n_emails, out[4].n_ips, out[4].n_phones) == (0, 0, 0)
    plan = plan_of(textops.pii_scrub(df))
    assert "Exchange" not in plan, plan  # pure map-side


def test_corpus_mixture_weights_and_slim_shuffle(spark):
    """weight = target_share / actual token share; languages missing
    from the target mix get weight 0; null text counts 0 tokens. The
    only shuffle carries partial (lang, counts) rows — the token sum
    must partial-aggregate map-side."""
    df = spark.createDataFrame(
        [
            (1, "a b c d", "en"),      # 4 tokens
            (2, "e f", "en"),          # 2
            (3, "g h i j", "de"),      # 4
            (4, None, "xx"),           # null text -> 0 tokens
            (5, "k l", "xx"),          # 2
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.lang: r for r in textops.corpus_mixture(
        df, targets={"en": 0.7, "de": 0.3}).collect()}
    assert out["en"].n_docs == 2 and out["en"].n_tokens == 6
    assert out["xx"].n_docs == 2 and out["xx"].n_tokens == 2
    assert out["en"].token_share == 0.5  # 6 of 12
    assert out["en"].weight == round(0.7 / 0.5, 6)
    assert out["de"].weight == round(0.3 / (4 / 12), 6)
    # not in the target mix -> excluded
    assert out["xx"].target_share == 0.0 and out["xx"].weight == 0.0
    plan = plan_of(textops.corpus_mixture(df))
    assert "partial_sum" in plan, plan
    blocks = __import__("re").findall(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan
    )
    assert all("text#" not in b for b in blocks), blocks


def test_segment_dedup_fuzz_vs_naive(spark):
    """Differential fuzz: segment_dedup must equal a direct Python
    reimplementation (split -> count distinct docs -> threshold ->
    ordered rebuild) on a corpus engineered for heavy segment
    collisions (tiny vocab, mixed doc lengths, exact-dup docs)."""
    import random

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(7)]
    docs = []
    for i in range(120):
        n = rng.randrange(1, 18)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    docs += [(200 + i, docs[i][1]) for i in range(10)]  # exact dups
    docs.append((300, None))

    W, K, C = 3, 2, 1
    segs = {}
    for did, text in docs:
        if text is None:
            segs[did] = []
            continue
        w = text.split(" ")
        segs[did] = [" ".join(w[j:j + W]) for j in range(0, len(w), W)]
    from collections import defaultdict
    seen = defaultdict(set)
    for did, ss in segs.items():
        for s in ss:
            if len(s) >= C:
                seen[s].add(did)
    hot = {s for s, d in seen.items() if len(d) >= K}
    want = {}
    for did, text in docs:
        ss = segs[did]
        keep = [s for s in ss if s not in hot]
        removed = len(ss) - len(keep)
        clean = "" if text is None else (
            text if removed == 0 else " ".join(keep))
        want[did] = (len(ss), removed, clean)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = textops.segment_dedup(df, seg_words=W, min_docs=K,
                                min_chars=C).collect()
    assert len(out) == len(docs)
    for r in out:
        assert (r.n_segments, r.n_removed, r.text_clean) == want[r.doc_id], \
            (r.doc_id, (r.n_segments, r.n_removed, r.text_clean),
             want[r.doc_id])


def test_pii_scrub_fuzz_vs_python_re(spark):
    """Differential fuzz: planted emails/IPs/phones at random positions
    must redact and count exactly as Python's re module (whose
    semantics match Java regex for the restricted pattern subset)."""
    import random
    import re as pyre

    rng = random.Random(99)
    fillers = ["lorem", "ipsum", "dolor", "sit99", "a.b", "x-y", "@@",
               "1.2", "12.34.56", "555-12-3456", "u@v", "t.co"]
    pii = [
        lambda i: f"user{i}@mail-{i % 7}.example.org",
        lambda i: f"{10 + i % 240}.{i % 250}.0.{(i * 7) % 250}",
        lambda i: f"{200 + i % 700:03d}-{100 + i % 900:03d}-{1000 + i % 9000:04d}",
    ]
    docs = []
    for i in range(150):
        toks = [rng.choice(fillers) for _ in range(rng.randrange(0, 12))]
        for _ in range(rng.randrange(0, 4)):
            toks.insert(rng.randrange(0, len(toks) + 1),
                        rng.choice(pii)(rng.randrange(0, 5000)))
        docs.append((i, " ".join(toks)))

    em, ip, ph = (textops.PII_EMAIL, textops.PII_IPV4, textops.PII_PHONE)
    want = {}
    for did, text in docs:
        red = pyre.sub(em, "<EMAIL>", text)
        red = pyre.sub(ip, "<IP>", red)
        red = pyre.sub(ph, "<PHONE>", red)
        want[did] = (len(pyre.findall(em, text)),
                     len(pyre.findall(ip, text)),
                     len(pyre.findall(ph, text)), red)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    for r in textops.pii_scrub(df).collect():
        assert (r.n_emails, r.n_ips, r.n_phones,
                r.text_redacted) == want[r.doc_id], (r.doc_id,)


def test_outlinks_anchor_text_direct_children_only(spark):
    """The outlinks query's anchor text is the concat of DIRECT child
    text nodes; markup-nested text belongs to the inner element.
    Exercised through the real parse kernel on hand-built HTML with a
    nested element and an href-less anchor."""
    from pyspark.sql import Row

    from dompa_spark import pipeline
    from dompa_spark.constants import TEXT_NAME

    html = ('<div><a href="https://e.x/1">pre <b>bold</b> post</a>'
            '<a name="top">skip</a><a href="https://e.x/2"></a></div>')
    df = spark.createDataFrame(
        [Row(doc_id="7", spans=[Row(kind="html", text=html,
                                    media_ref=None, offset=0)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    nodes = pipeline.parse_nodes_df(df)

    def href_of(a):
        return F.get(
            F.filter(a["attrs"], lambda kv: kv["key"] == "href"), 0
        )["val"]

    def anchor_of(a):
        kids = F.filter(
            F.col("nodes"),
            lambda n: (n["parent_id"] == a["node_id"])
            & (n["name"] == TEXT_NAME),
        )
        return F.array_join(F.transform(kids, lambda n: n["value"]), "")

    per = F.transform(
        F.filter("nodes", lambda n: n["name"] == "a"),
        lambda a: F.struct(
            href_of(a).alias("href"), anchor_of(a).alias("anchor_text")
        ),
    )
    rows = (
        nodes.select(F.posexplode(per).alias("link_pos", "l"))
        .where(F.col("l.href").isNotNull())
        .select("link_pos", "l.href", "l.anchor_text")
        .collect()
    )
    got = [(r.link_pos, r.href, r.anchor_text) for r in rows]
    # nested <b>bold</b> text excluded; empty anchor yields ''
    assert got == [(0, "https://e.x/1", "pre  post"),
                   (2, "https://e.x/2", "")], got


def _tables_of(spark, html):
    from dompa_spark import pipeline

    df = spark.createDataFrame([("1", html)], "doc_id string, html string")
    spans = df.select(
        "doc_id",
        F.array(textops.html_span(F.col("html"), 0)).alias("spans"),
    )
    rows = textops.extract_tables_df(
        pipeline.parse_nodes_df(spans)
    ).collect()
    return [(r.table_idx, r.row_idx, r.col_idx, r.is_header, r.cell_text)
            for r in rows]


def test_extract_tables_full_contract(spark):
    """Document-order indices, th/td header flag, direct-child cell
    text (nested markup keeps its own text), multi-table enumeration,
    and the orphan-row decoy (a td->tr chain with no table ancestor
    must never emit)."""
    got = _tables_of(
        spark,
        "<div><table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td>a <b>nested</b> z</td><td></td></tr></table>"
        "<tr><td>orphan</td></tr>"
        "<table><tr><td>t2</td></tr></table></div>",
    )
    assert got == [
        (0, 0, 0, True, "h1"),
        (0, 0, 1, True, "h2"),
        (0, 1, 0, False, "a  z"),
        (0, 1, 1, False, ""),
        (1, 0, 0, False, "t2"),
    ], got


def test_extract_tables_no_tables_emits_nothing(spark):
    assert _tables_of(spark, "<div><p>no tables here</p></div>") == []


def test_extract_tables_indirect_rows_excluded(spark):
    """Only DIRECT tr children of a table count as rows, and only
    DIRECT td/th children of a tr count as cells — a tbody-wrapped or
    div-wrapped layer breaks the chain by contract (the parser is
    spec-agnostic; the operator's chain rule is the documented one)."""
    got = _tables_of(
        spark,
        "<table><tbody><tr><td>wrapped</td></tr></tbody>"
        "<tr><div><td>celldiv</td></div><td>direct</td></tr></table>",
    )
    assert got == [(0, 0, 0, False, "direct")], got


def _sitemap_of(spark, xml):
    from dompa_spark import pipeline

    df = spark.createDataFrame([("1", xml)], "doc_id string, html string")
    spans = df.select(
        "doc_id",
        F.array(textops.html_span(F.col("html"), 0)).alias("spans"),
    )
    rows = textops.sitemap_urls_df(
        pipeline.parse_nodes_df(spans)
    ).collect()
    return [(r.url_pos, r.loc, r.lastmod, r.url_canon, r.host)
            for r in rows]


def test_sitemap_urls_chain_and_canon(spark):
    """url must chain to a urlset parent; loc-less urls drop but hold
    their document-order position; lastmod is NULL when absent; the
    canonical key comes from the SHARED frontier expressions."""
    got = _sitemap_of(
        spark,
        "<urlset><url><loc>https://A.example:443/x/</loc>"
        "<lastmod>2026-01-02</lastmod></url>"
        "<url><priority>1</priority></url>"
        "<url><loc>https://a.example/x#f</loc></url></urlset>"
        "<url><loc>https://stray.example/</loc></url>",
    )
    assert got == [
        (0, "https://A.example:443/x/", "2026-01-02",
         "https://a.example/x", "a.example"),
        (2, "https://a.example/x#f", None,
         "https://a.example/x", "a.example"),
    ], got


def _lists_of(spark, html):
    from dompa_spark import pipeline

    df = spark.createDataFrame([("1", html)], "doc_id string, html string")
    spans = df.select(
        "doc_id",
        F.array(textops.html_span(F.col("html"), 0)).alias("spans"),
    )
    rows = textops.extract_lists_df(
        pipeline.parse_nodes_df(spans)
    ).collect()
    return [(r.list_idx, r.item_idx, r.ordered, r.item_text)
            for r in rows]


def test_extract_lists_contract(spark):
    """Chain rule (stray li never emits), ordered flag, document-order
    enumeration, direct-child text, and a NESTED sub-list: the inner
    ul is its own list_idx and the outer item keeps only its direct
    text."""
    got = _lists_of(
        spark,
        "<div><li>stray</li><ol><li>a</li><li>b <i>x</i></li></ol>"
        "<ul><li>outer <ul><li>inner</li></ul> tail</li></ul></div>",
    )
    assert got == [
        (0, 0, True, "a"),
        (0, 1, True, "b "),
        (1, 0, False, "outer  tail"),
        (2, 0, False, "inner"),
    ], got


def test_extract_structured_single_parse(spark):
    """Five structure families off ONE parse: after execution the
    final plan reads the checkpointed nodes (ExistingRDD), never a
    MapInArrow parse subtree per family (Catalyst column-prunes
    sibling consumers into different first exchanges, so exchange
    reuse alone would re-parse 5x — the anchor_text_agg lesson)."""
    from dompa_spark import pipeline

    docs = spark.createDataFrame(
        [(i, "w%d x" % i, "en", "s", 4) for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    wrapped = textops.structured_wrapped(docs)
    out = textops.extract_structured(pipeline.parse_nodes_df(wrapped))
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[0].n_items == 5 and rows[1].n_items == 3  # %2 and %3
    assert rows[3].n_links == 2 and rows[1].n_links == 1
    assert rows[5].title == "T 5"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 0
    assert "ExistingRDD" in plan


def test_media_captions_edges(spark):
    """Leading media (no prev), trailing media (no next), adjacent
    media sharing a text neighbor, and a text-free doc — the span
    shapes a real interleaved corpus produces."""
    from pyspark.sql import Row

    def span(kind, text, ref, off):
        return Row(kind=kind, text=text, media_ref=ref, offset=off)

    rows = [
        Row(doc_id="1", spans=[
            span("image", None, "m0", 0), span("text", "a", None, 1),
            span("image", None, "m1", 2), span("image", None, "m2", 3),
            span("text", "b", None, 4), span("image", None, "m3", 5),
        ]),
        Row(doc_id="2", spans=[span("audio", None, "m4", 0)]),
        Row(doc_id="3", spans=[span("text", "only", None, 0)]),
    ]
    schema = ("doc_id string, spans array<struct<kind:string,"
              "text:string,media_ref:string,offset:int>>")
    df = spark.createDataFrame(rows, schema)
    got = sorted(
        (r.doc_id, r.media_ref, r.prev_text, r.next_text)
        for r in textops.media_captions(df).collect()
    )
    assert got == [
        (1, "m0", None, "a"),
        (1, "m1", "a", "b"),
        (1, "m2", "a", "b"),
        (1, "m3", "b", None),
        (2, "m4", None, None),
    ], got


def _headings_of(spark, html):
    from dompa_spark import pipeline

    df = spark.createDataFrame([("1", html)], "doc_id string, html string")
    spans = df.select(
        "doc_id",
        F.array(textops.html_span(F.col("html"), 0)).alias("spans"),
    )
    rows = textops.extract_headings_df(
        pipeline.parse_nodes_df(spans)
    ).collect()
    return [(r.h_pos, r.level, r.heading_text, r.parent_pos)
            for r in rows]


def test_extract_headings_outline_links(spark):
    """Nearest-smaller-level parent: an h4 after h1 links straight to
    the h1 (levels can skip); a later h2 jumps back over deeper
    headings; same-level siblings share a parent; a leading h2 with no
    smaller predecessor gets NULL."""
    got = _headings_of(
        spark,
        "<div><h2>pre</h2><h1>top</h1><h4>deep <b>x</b></h4>"
        "<h4>deep2</h4><h2>back</h2><h3>under</h3></div>",
    )
    assert got == [
        (0, 2, "pre", None),
        (1, 1, "top", None),
        (2, 4, "deep ", 1),
        (3, 4, "deep2", 1),
        (4, 2, "back", 1),
        (5, 3, "under", 4),
    ], got


def test_extract_headings_none(spark):
    assert _headings_of(spark, "<div><p>no headings</p></div>") == []


def test_sitemap_urls_no_urlset_emits_nothing(spark):
    assert _sitemap_of(
        spark, "<url><loc>https://x.example/</loc></url>"
    ) == []


def _robots_rules_of(spark, txt):
    df = spark.createDataFrame([("H.ex", txt)],
                               "host string, robots_txt string")
    rows = textops.robots_parse(df).collect()
    return sorted((r.host, r.agent, r.rule, r.path) for r in rows)


def test_robots_parse_group_semantics(spark):
    """Stray pre-group rules ignored; a rule line closes the UA run so
    a later UA line starts a NEW group; two consecutive UA lines share
    their rules; comments and field-name case are stripped; agent
    tokens lowercase; an empty Disallow keeps path ''."""
    got = _robots_rules_of(
        spark,
        "Disallow: /stray\n"
        "# comment\n"
        "USER-AGENT: Alpha\n"
        "User-agent: Beta\n"
        "disallow: /a # trailing comment\n"
        "Allow:\n"
        "User-agent: *\n"
        "Disallow: /b\n",
    )
    assert got == sorted([
        ("h.ex", "alpha", "disallow", "/a"),
        ("h.ex", "alpha", "allow", ""),
        ("h.ex", "beta", "disallow", "/a"),
        ("h.ex", "beta", "allow", ""),
        ("h.ex", "*", "disallow", "/b"),
    ]), got


def test_robots_parse_blank_line_breaks_ua_run(spark):
    """A blank line between two UA lines splits them into separate
    groups — the second group owns the rules."""
    got = _robots_rules_of(
        spark, "User-agent: a\n\nUser-agent: b\nDisallow: /x\n")
    assert got == [("h.ex", "b", "disallow", "/x")], got


def test_robots_filter_precedence(spark):
    """Longest literal prefix wins; allow beats disallow on equal
    length; empty-path rules match nothing; a host with no applicable
    rules is allowed; specific-agent groups override '*' wholesale."""
    rules = spark.createDataFrame(
        [
            ("h1", "*", "disallow", "/p"),
            ("h1", "*", "allow", "/p/ok"),
            ("h1", "*", "disallow", ""),
            ("h1", "*", "disallow", "/t"),
            ("h1", "*", "allow", "/t"),
            ("h2", "*", "disallow", "/"),
            ("h2", "mybot", "disallow", "/only"),
        ],
        "host string, agent string, rule string, path string",
    )
    urls = spark.createDataFrame(
        [(0, "https://h1/p/x"), (1, "https://h1/p/ok/y"),
         (2, "https://h1/t/z"), (3, "https://h1/free"),
         (4, "https://h2/anything"), (5, "https://h2/only/x"),
         (6, "https://h3/norules")],
        "doc_id long, url string",
    )
    got = {r.doc_id: (r.allowed, r.match_len)
           for r in textops.robots_filter(urls, rules, "MyBot").collect()}
    assert got == {
        0: (False, 2), 1: (True, 5), 2: (True, 2), 3: (True, None),
        4: (True, None),  # mybot group on h2 overrides the '*' ban
        5: (False, 5), 6: (True, None),
    }, got


def test_robots_filter_rfc9309_wildcards(spark):
    """RFC 9309 wildcard matching: '*' spans any char run (incl '/'),
    a trailing '$' anchors end-of-path, '$' elsewhere is a literal
    octet, regex metacharacters in rule paths are literal, and
    precedence counts the rule path's octets AS WRITTEN (wildcards
    included)."""
    rules = spark.createDataFrame(
        [
            ("h1", "*", "disallow", "/*.json$"),
            ("h1", "*", "allow", "/wild/*/ok"),
            ("h1", "*", "disallow", "/wild"),
            ("h2", "*", "disallow", "/end*"),
            ("h2", "*", "disallow", "/a$b"),
            ("h3", "*", "disallow", "/p.q*z"),
            ("h3", "*", "disallow", "/m*n*o"),
        ],
        "host string, agent string, rule string, path string",
    )
    urls = spark.createDataFrame(
        [
            (0, "https://h1/f.json"),        # anchored deny
            (1, "https://h1/f.jsonx"),       # '$' anchor: no match
            (2, "https://h1/deep/f.json"),   # '*' spans '/'
            (3, "https://h1/wild/a/b/ok"),   # allow(10) beats deny(5)
            (4, "https://h1/wild/plain"),    # only the deny matches
            (5, "https://h2/endless"),       # trailing '*' prefix
            (6, "https://h2/end"),           # '*' matches empty
            (7, "https://h2/a$b/c"),         # mid '$' is a literal
            (8, "https://h2/ab"),            # ...and never an anchor
            (9, "https://h3/p.qfooz"),       # '.' literal + star
            (10, "https://h3/pxqfooz"),      # '.' is NOT regex-dot
            (11, "https://h3/mxxnyyo"),      # two stars
        ],
        "doc_id long, url string",
    )
    got = {r.doc_id: (r.allowed, r.match_len)
           for r in textops.robots_filter(urls, rules, "MyBot").collect()}
    assert got == {
        0: (False, 8), 1: (True, None), 2: (False, 8),
        3: (True, 10), 4: (False, 5),
        5: (False, 5), 6: (False, 5), 7: (False, 4), 8: (True, None),
        9: (False, 6), 10: (True, None), 11: (False, 6),
    }, got


def test_chunk_documents_differential(spark):
    """Chunk boundaries vs a Python reference across word counts
    bracketing every boundary case (empty-ish, < window, == window,
    one-past, stride multiples, long): complete coverage, correct
    overlap, and no redundant tail chunk."""
    window, stride = 10, 7
    counts = [1, 5, 9, 10, 11, 17, 18, 24, 25, 80]
    docs = [(i, " ".join(f"w{i}_{j}" for j in range(c)))
            for i, c in enumerate(counts)]
    want = {}
    for i, c in enumerate(counts):
        wlist = docs[i][1].split(" ")
        last = 0 if c <= window else -((c - window) // -stride)
        want[i] = [
            (k, k * stride, min(window, c - k * stride),
             " ".join(wlist[k * stride:k * stride + window]))
            for k in range(last + 1)
        ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in textops.chunk_documents(df, window, stride).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start_word, r.n_words, r.chunk_text))
    got = {k: sorted(v) for k, v in got.items()}
    assert got == want, got
    # coverage + non-redundancy: every word in some chunk; every chunk
    # ends past the previous one's end
    for i, chunks in want.items():
        assert chunks[-1][1] + chunks[-1][2] == counts[i]
        for a, b in zip(chunks, chunks[1:]):
            assert b[1] + window > a[1] + window  # strictly advances


def test_chunk_documents_null_text_and_args(spark):
    df = spark.createDataFrame([(1, None), (2, "a b")],
                               "doc_id long, text string")
    rows = textops.chunk_documents(df, 4, 2).collect()
    assert [(r.doc_id, r.chunk_text) for r in rows] == [(2, "a b")]
    import pytest as _pt
    with _pt.raises(ValueError):
        textops.chunk_documents(df, 4, 5)
    with _pt.raises(ValueError):
        textops.chunk_documents(df, 0, 0)


def test_train_bpe_hand_computed(spark):
    """Three rounds on an engineered frequency table: 'aab' x3 +
    'ab' x2 -> round 0 merges (a,b) n=5; round 1 (a,ab) n=3; round 2
    falls to the remaining corpus pair — and the learned table drives
    tokenize_bpe to the expected counts (train/apply composition)."""
    docs = [(0, "aab aab aab ab ab cd")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = textops.train_bpe(df, n_merges=3, vocab_k=100).collect()
    got = [(r.rank, r.left, r.right, r.merged, r.pair_n) for r in rows]
    assert sorted(got) == [
        (0, "a", "b", "ab", 5),
        (1, "a", "ab", "aab", 3),
        (2, "c", "d", "cd", 1),
    ], got
    merges = [(f"{l} {r}", m) for _, l, r, m, _ in sorted(got)]
    enc = textops.tokenize_bpe(df, merges=merges).collect()[0]
    # aab->1 sym x3, ab->1 x2, cd->1: 6 words, 6 bpe tokens
    assert (enc.n_words, enc.n_bpe_tokens) == (6, 6), enc


def test_train_bpe_deterministic_tiebreak(spark):
    """Equal-count pairs resolve (left asc, right asc) — the rank-0
    winner must be the lexicographically smallest pair, on any
    partitioning."""
    df = spark.createDataFrame(
        [(0, "zy zy ba ba")], "doc_id long, text string"
    )
    r0 = [r for r in textops.train_bpe(df, 1, 100).collect()][0]
    assert (r0.left, r0.right, r0.pair_n) == ("b", "a", 2), r0


def _ref_bpe_count(word, merges):
    """Reference greedy BPE: apply merges in rank order, each merging
    all left-to-right non-overlapping occurrences of the symbol PAIR
    (not the string) — the standard fast encode."""
    syms = list(word)
    for a, b in merges:
        left, right = a.split(" ")
        out, i = [], 0
        while i < len(syms):
            if (i + 1 < len(syms) and syms[i] == left
                    and syms[i + 1] == right):
                out.append(b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def test_tokenize_bpe_differential(spark):
    """The terminator-bounded replace fold must equal reference greedy
    BPE symbol-for-symbol — including the 'athe' prefix trap (a bare
    space-separated rewrite falsely merges 'a t' across the boundary
    of symbols ['a','the']), adjacency chains ('ththt'), and fuzz over
    the merge alphabet."""
    import random

    rng = random.Random(11)
    alpha = "theinoralsdgu"
    words_list = ["athe", "ththt", "thers", "ingesting", "the", "a",
                  "zzz", "atat", "thethe", "ouedal"]
    words_list += ["".join(rng.choice(alpha)
                           for _ in range(rng.randrange(1, 14)))
                   for _ in range(300)]
    docs = [(i, w) for i, w in enumerate(words_list)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.n_bpe_tokens
           for r in textops.tokenize_bpe(df).collect()}
    for i, w in docs:
        want = _ref_bpe_count(w, textops.BPE_MERGES)
        assert got[i] == want, (w, got[i], want)
    # sanity: the trap word really is a trap (2 symbols, not 1)
    assert _ref_bpe_count("athe", textops.BPE_MERGES) == 2


def test_tokenize_bpe_doc_rows(spark):
    df = spark.createDataFrame(
        [(0, "the thers"), (1, None), (2, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens, r.bpe_per_word)
           for r in textops.tokenize_bpe(df).collect()}
    # 'the' -> [the] (1); 'thers': t h->th, e r->er (rank 2, so the
    # rank-6 'th e' never sees (th,e)), er s->ers => [th, ers] (2)
    assert got[0] == (2, 3, 1.5), got[0]
    assert got[1] == (0, 0, 0.0), got[1]
    assert got[2] == (1, 0, 0.0), got[2]


def test_sample_mixture_copy_math(spark):
    """Closed-form: lang at 4x its target weight halves... — exact
    check of the ppm copy formula on engineered token shares, plus the
    guarantees a mixing job relies on: total copies per lang lands
    within 1-per-doc of n_docs * weight, repeated invocation is
    bit-identical, and weight-0 langs drop entirely."""
    # 100 en docs x 10 tokens, 100 xx docs x 10 tokens -> shares 0.5;
    # targets: en 0.75 (weight 1.5 -> 1 or 2 copies), xx 0 (dropped)
    docs = [(i, "w " * 9 + "w", "en" if i < 100 else "xx")
            for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    targets = {"en": 0.75}
    rows = textops.sample_mixture(df, targets).collect()
    assert all(r.lang == "en" for r in rows)
    assert len(rows) == 100  # weight >= 1: every en doc kept
    copies = {r.doc_id: r.n_copies for r in rows}
    assert set(copies.values()) <= {1, 2}
    total = sum(copies.values())
    # E[total] = 150; the md5 gate is uniform-ish but fixed — pin a
    # generous band AND determinism across invocations
    assert 120 <= total <= 180, total
    again = {r.doc_id: r.n_copies
             for r in textops.sample_mixture(df, targets).collect()}
    assert again == copies


def test_sample_mixture_zero_token_lang_drops(spark):
    """A lang with target > 0 but zero tokens (all-null text) has an
    infinite weight — it must DROP, not saturate the long cast and
    hand out ~9e12 copies (the non-ANSI Infinity->long trap)."""
    df = spark.createDataFrame(
        [(0, "real words here", "en"), (1, None, "zz")],
        "doc_id long, text string, lang string",
    )
    rows = textops.sample_mixture(df, {"en": 0.5, "zz": 0.5}).collect()
    assert [r.lang for r in rows] == ["en"]
    assert all(r.n_copies < 10 for r in rows), rows


def test_dsir_weights_closed_form(spark):
    """Hand-computed bit buckets on a tiny corpus: target-heavy words
    score positive, raw-only words negative, and a null-text doc
    reports an explicit zero row."""
    raw = spark.createDataFrame(
        [(0, "tgt tgt"), (1, "junk junk"), (2, None)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([(9, "tgt tgt tgt tgt")],
                                   "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.dsir_bits, r.avg_bits)
           for r in textops.dsir_weights(raw, target).collect()}
    # raw: N=4, c(tgt)=2, c(junk)=2 -> bits_raw = log2(4//2) = 1 each
    # tgt: N=4, c(tgt)=4 -> bits_tgt(tgt) = 0; junk OOV c=1 -> 2
    # doc0: 2 tokens * (1 - 0) = +2 ; doc1: 2 * (1 - 2) = -2
    assert got == {0: (2, 2, 1.0), 1: (2, -2, -1.0), 2: (0, 0, 0.0)}, got


def test_dsir_weights_ranks_target_like_docs_higher(spark):
    """On a two-domain corpus, docs drawn from the target domain's
    vocabulary must out-score docs from the other domain — the
    property a resampler actually consumes."""
    import numpy as np

    rng = np.random.default_rng(7)
    wiki = [f"wiki{j}" for j in range(30)]
    spam = [f"spam{j}" for j in range(30)]
    docs = []
    for i in range(200):
        pool = wiki if i % 2 == 0 else spam
        docs.append((i, " ".join(rng.choice(pool, 20))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # target sample: wiki-domain docs only
    target = df.where(F.col("doc_id") % 2 == 0).limit(40)
    res = textops.dsir_weights(df, target).collect()
    wiki_scores = [r.avg_bits for r in res if r.doc_id % 2 == 0]
    spam_scores = [r.avg_bits for r in res if r.doc_id % 2 == 1]
    assert min(wiki_scores) > max(spam_scores), (
        min(wiki_scores), max(spam_scores))


def test_segment_dedup_universal_boilerplate(spark):
    """Worst-case skew: EVERY doc carries the same hot segment. The
    hot set stays one row, output stays one row per doc with exactly
    the boilerplate stripped, and the degradation is the documented
    one (per-doc bad-position rows, linear — not a pair blowup)."""
    n = 2000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared banner line x "),
            F.concat_ws(" ", F.array(
                *[F.concat(F.lit(f"u{j}_"), F.col("id")) for j in range(5)]
            )),
        ).alias("text"),
    )
    out = textops.segment_dedup(df, seg_words=4).collect()
    assert len(out) == n
    for r in out:
        # first 4-word window 'shared banner line x' is hot everywhere;
        # the per-doc unique tail survives
        assert r.n_removed == 1 and r.n_segments == 3
        assert r.text_clean.startswith("u0_") and "banner" not in r.text_clean


def test_token_histogram_buckets_exact(spark):
    """Closed-form buckets: 1 token -> 0, 2-3 -> 1, 4-7 -> 2; zero/null
    docs land in bucket -1 and are never dropped."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c"), (4, "a b c d"),
         (5, None)],
        "doc_id long, text string",
    )
    out = {r.token_bucket: (r.n_docs, r.n_tokens)
           for r in textops.token_histogram(df).collect()}
    assert out == {0: (1, 1), 1: (2, 5), 2: (1, 4), -1: (1, 0)}
    plan = plan_of(textops.token_histogram(df))
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_pack_sequences_offsets_and_contract(spark):
    """Per-source exclusive prefix offsets in doc_id order; seq_id is
    exact BIGINT division by ctx; null text takes 0 tokens but keeps
    its slot; the window is partitioned by source (the sessionize-style
    per-shard skew contract) and the shuffle never carries text."""
    import re

    df = spark.createDataFrame(
        [
            (1, "a b c", "s1"),       # 3 tokens, offset 0, seq 0
            (2, None, "s1"),          # 0 tokens, offset 3, seq 0
            (3, "d e f g", "s1"),     # offset 3, seq 0
            (4, "h i", "s1"),         # offset 7, seq 1 (ctx=4)
            (10, "x y z w v", "s2"),  # other shard restarts at 0
            (11, "q", "s2"),          # offset 5, seq 1
        ],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: (r.tok_offset, r.seq_id)
           for r in textops.pack_sequences(df, ctx=4).collect()}
    assert out == {1: (0, 0), 2: (3, 0), 3: (3, 0), 4: (7, 1),
                   10: (0, 0), 11: (5, 1)}
    plan = plan_of(textops.pack_sequences(df, ctx=4))
    assert "windowspecdefinition(source" in plan, plan
    blocks = re.findall(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan
    )
    assert blocks and all(
        not re.search(r"\btext#\d+", b) for b in blocks), blocks


def test_dedup_incremental_cross_only_best_match_and_sig_reuse(spark):
    """dedup_incremental pins: (a) pairing is cross-snapshot ONLY — two
    byte-identical NEW docs stay novel when the old corpus lacks their
    text (new-vs-new is minhash_lsh_pairs' job); (b) the reported match
    is the highest verified Jaccard with ties broken to the LOWEST old
    doc_id; (c) <3-word new docs follow minhash_sigs' dropped-row
    contract; (d) passing a persisted signature table via old_sigs=
    (the 10^12-doc shape: hash the accumulated corpus once) yields
    identical rows."""
    base = "a b c d e f g h i j k l"
    old = spark.createDataFrame(
        [(1, base), (2, base),
         (5, "a b c d e f g h i j k m")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, base),
         (12, "m n o p q r s t u v w x"),
         (13, "m n o p q r s t u v w x"),
         (14, "one two")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in
            textops.dedup_incremental(new, old).collect()}
    assert set(rows) == {10, 12, 13}  # 14 dropped (<3 words)
    # max jaccard 1.0 against BOTH old 1 and old 2 -> lowest id wins
    assert (rows[10].is_dup_of_prior, rows[10].match_id,
            rows[10].jaccard) == (True, 1, 1.0)
    # identical new-new pair, no old match -> both novel
    for did in (12, 13):
        assert rows[did].is_dup_of_prior is False
        assert rows[did].match_id is None and rows[did].jaccard is None
    via_sigs = {r.doc_id: r for r in textops.dedup_incremental(
        new, old_sigs=textops.minhash_sigs(old)).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == \
           {k: tuple(v) for k, v in via_sigs.items()}


def test_url_normalize_rules_and_mapside_group(spark):
    """Each canonicalization rule pinned on a hand-built URL, plus the
    scale shape: dup grouping is a partial-aggregatable groupBy(min) +
    equi-join, NOT a rank window (a viral URL repeated 10^8 times must
    cost a map-side combine, not one task's sort)."""
    df = spark.createDataFrame(
        [
            (1, "HTTP://EXAMPLE.com:80/Path/"),
            (2, "http://example.com/Path#frag"),
            (3, "https://Example.COM:8443/a?utm_source=t&x=1&utm_medium=m"),
            (4, "https://example.com"),
            (5, "http://example.com/?utm_only=1"),
            (6, None),
        ],
        "doc_id long, url string",
    )
    out = {r.doc_id: r for r in textops.url_normalize(df).collect()}
    # lower scheme/host, strip default port + trailing slash; path case kept
    assert out[1].url_canon == "http://example.com/Path"
    # fragment stripped -> same group; min-doc keeper
    assert out[2].url_canon == out[1].url_canon
    assert (out[1].is_dup, out[2].is_dup) == (False, True)
    assert out[2].keeper_id == 1
    # non-default port kept; utm_* dropped, other params kept in order
    assert out[3].url_canon == "https://example.com:8443/a?x=1"
    assert out[3].n_utm_dropped == 2
    # empty path -> '/'; root path not stripped; all-utm query vanishes
    assert out[4].url_canon == "https://example.com/"
    assert out[5].url_canon == "http://example.com/"
    assert out[5].n_utm_dropped == 1
    assert out[3].host == "example.com"
    # null url: row survives (left join), nobody's duplicate
    assert (out[6].url_canon, out[6].keeper_id, out[6].is_dup) == \
        (None, None, False)
    plan = plan_of(textops.url_normalize(df))
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan


def test_span_dedup_alignment_coverage_and_contracts(spark):
    """span_dedup pins: a passage shared at DIFFERENT alignments is cut
    exactly (per-token coverage union over overlapping hot windows —
    what segment_dedup's fixed chunks cannot see); within-one-doc
    repetition is NOT boilerplate (distinct-doc count); short and null
    docs pass through; the window-explode shuffles never carry the
    gram strings (xxhash64 surrogate only)."""
    import re

    df = spark.createDataFrame(
        [
            (1, "x1 x2 a b c d e f g h y1 y2"),
            (2, "z1 a b c d e f g h z2 z3 z4"),
            (3, "too short for any window"),
            (4, None),
            (5, "p q r s t u v w p q r s t u v w"),
            (7, "m1 m2 c1 c2 c3 c4 c5 c6 c7 c8 c9 m3"),
            (8, "c1 c2 c3 c4 c5 c6 c7 c8 c9 n1 n2 n3"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.span_dedup(df).collect()}
    # 8-token passage at offsets 2 and 1 -> exact extents cut
    assert (out[1].n_removed, out[1].text_clean) == (8, "x1 x2 y1 y2")
    assert (out[2].n_removed, out[2].text_clean) == (8, "z1 z2 z3 z4")
    # 9-token passage -> two overlapping hot windows, coverage unions
    assert (out[7].n_removed, out[7].text_clean) == (9, "m1 m2 m3")
    assert (out[8].n_removed, out[8].text_clean) == (9, "n1 n2 n3")
    # short doc: no window; within-doc repeat: 1 distinct doc -> kept
    assert (out[3].n_removed, out[3].text_clean) == \
        (0, "too short for any window")
    assert (out[5].n_removed, out[5].text_clean) == (0, df.collect()[4].text)
    assert (out[4].n_tokens, out[4].n_removed, out[4].text_clean) == \
        (0, 0, "")
    plan = plan_of(textops.span_dedup(df))
    blocks = re.findall(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan
    )
    assert blocks and all(
        not re.search(r"\bg#\d+", b) for b in blocks), blocks


def test_span_dedup_fuzz_vs_naive(spark):
    """Differential fuzz: span_dedup must equal a direct Python
    reimplementation (overlapping windows -> distinct-doc count ->
    per-token coverage union -> ordered rebuild) on a collision-heavy
    corpus (tiny vocab so 4-grams repeat organically, mixed lengths,
    exact-dup docs, sub-window-length docs, null)."""
    import random
    from collections import defaultdict

    rng = random.Random(4321)
    vocab = [f"w{i}" for i in range(5)]
    docs = []
    for i in range(120):
        n = rng.randrange(1, 22)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    docs += [(200 + i, docs[i][1]) for i in range(10)]  # exact dups
    docs.append((300, None))

    N, K = 4, 2
    grams = {}
    for did, text in docs:
        if text is None:
            grams[did] = []
            continue
        w = text.split(" ")
        grams[did] = [
            " ".join(w[p:p + N]) for p in range(len(w) - N + 1)
        ]
    seen = defaultdict(set)
    for did, gs in grams.items():
        for g in gs:
            seen[g].add(did)
    hot = {g for g, d in seen.items() if len(d) >= K}
    want = {}
    for did, text in docs:
        if text is None:
            want[did] = (0, 0, "")
            continue
        w = text.split(" ")
        covered = set()
        for p, g in enumerate(grams[did]):
            if g in hot:
                covered.update(range(p, p + N))
        keep = [t for i, t in enumerate(w) if i not in covered]
        clean = text if not covered else " ".join(keep)
        want[did] = (len(w), len(covered), clean)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = textops.span_dedup(df, n=N, min_docs=K).collect()
    assert len(out) == len(docs)
    for r in out:
        assert (r.n_tokens, r.n_removed, r.text_clean) == want[r.doc_id], \
            (r.doc_id, (r.n_tokens, r.n_removed, r.text_clean),
             want[r.doc_id])


def test_dedup_incremental_union_salt_bounds_cross_candidates(spark):
    """A viral text present in BOTH snapshots lands old-side and
    new-side rows in the same (band, bkey) bucket: without the cap a
    B_old x B_new cross blowup, with the UNION-computed salt the
    verified output stays a fraction of it (pairs only within matching
    salt groups). Also pins that the salt keys AGREE across sides —
    capped recall must remain non-zero."""
    n, clique, cap = 500, 200, 10
    df = _clique_docs(spark, n, clique)
    new = df.filter(F.col("doc_id") % 2 == 0)
    old = df.filter(F.col("doc_id") % 2 == 1)
    uncapped = textops.dedup_incremental(
        new, old, bucket_cap=10**9
    ).filter("is_dup_of_prior").count()
    capped_rows = textops.dedup_incremental(new, old, bucket_cap=cap)
    capped = capped_rows.filter("is_dup_of_prior").count()
    # every new clique member has an old match when uncapped
    assert uncapped == clique // 2
    # capped: flagged docs are a subset, non-empty (cross-side salt
    # groups align: md5(doc_id:band) is side-independent)
    assert 0 < capped <= uncapped, (capped, uncapped)
    # output stays one row per hashable NEW doc in both modes
    assert capped_rows.count() == new.count()


def test_media_near_dup_hot_bucket_salt_bounds_candidates(spark):
    """An identical image repeated B times (same dhash) is one bucket
    per band: the shared salt cap must bound the verified pair output
    ~B*cap/2 per band instead of B^2/2."""
    from dompa_spark import media

    B = 200
    rows = [(f"img{i:04d}", 7) for i in range(B)] + [
        (f"uniq{i:04d}", (i * 2654435761) % (1 << 56)) for i in range(100)
    ]
    hashes = spark.createDataFrame(rows, "media_ref string, dhash long")
    uncapped = media.media_near_dup(hashes, bucket_cap=10**9).count()
    capped = media.media_near_dup(hashes, bucket_cap=10).count()
    assert uncapped >= B * (B - 1) // 2
    assert capped <= media.DHASH_BANDS * (B // 10 + 1) * 10 * 10, (
        capped, uncapped)
    assert capped < uncapped / 2, (capped, uncapped)


def test_url_normalize_is_idempotent(spark):
    """Canonicalization must be a fixpoint: feeding url_normalize its
    own canonical output yields the same canonical form (if it didn't,
    two crawl cycles would disagree about which URLs are duplicates)."""
    df = spark.createDataFrame(
        [
            (1, "HTTP://EXAMPLE.com:80/Path/"),
            (2, "https://Example.COM:8443/a?utm_source=t&x=1&utm_medium=m"),
            (3, "https://example.com"),
            (4, "http://example.com/?utm_only=1"),
            (5, "http://h.io/a/b/?id=1&utm_x=2#f"),
            (6, "http://h.io/a//"),   # the single-strip trap: '/a//'
            (7, "http://h.io///"),    # all-slash path -> root
        ],
        "doc_id long, url string",
    )
    once = textops.url_normalize(df).select(
        "doc_id", F.col("url_canon").alias("url")
    )
    twice = textops.url_normalize(once)
    first = {r.doc_id: r.url_canon
             for r in textops.url_normalize(df).collect()}
    second = {r.doc_id: r.url_canon for r in twice.collect()}
    assert first == second
    assert first[6] == "http://h.io/a"
    assert first[7] == "http://h.io/"


def test_pii_scrub_is_idempotent(spark):
    """Redaction is a fixpoint: placeholders never re-match any PII
    pattern, so scrubbing scrubbed text changes nothing and reports
    zero counts (re-running a pipeline stage must not mutate data)."""
    df = spark.createDataFrame(
        [(1, "mail a@b.com ip 1.2.3.4 tel 555-123-4567 end"),
         (2, None)],
        "doc_id long, text string",
    )
    once = textops.pii_scrub(df)
    again = {r.doc_id: r for r in textops.pii_scrub(
        once.select("doc_id", F.col("text_redacted").alias("text"))
    ).collect()}
    for r in once.collect():
        assert again[r.doc_id].text_redacted == r.text_redacted
        assert (again[r.doc_id].n_emails, again[r.doc_id].n_ips,
                again[r.doc_id].n_phones) == (0, 0, 0)


# ---------------------------------------------------------------------------
# domain_stats
# ---------------------------------------------------------------------------

def test_domain_stats_gate_parity():
    """The domain-level quality gate and the per-doc curate gate must
    use the same threshold, or domain rates stop predicting curate
    yield (constant-level pin; the arithmetic is shared via
    quality_score_col)."""
    assert textops.DOMAIN_QUALITY_MIN == textops.CURATE_QUALITY_MIN


def test_domain_stats_counts_and_null_text(spark):
    """Exact counts per host, including the null-text contract: a NULL
    text doc counts as 0 tokens, short, and not quality-ok — but still
    counts as a doc (one row per doc, never silently dropped)."""
    long_good = " ".join(
        ["the", "and", "for", "with"] * 20
    )  # 80 tokens, stopword-heavy -> passes the quality gate
    df = spark.createDataFrame(
        [
            ("a.com", long_good),
            ("a.com", "tiny doc"),
            ("a.com", None),
            ("b.com", long_good),
        ],
        "host string, text string",
    )
    got = {r.host: r for r in textops.domain_stats(df).collect()}
    a, b = got["a.com"], got["b.com"]
    assert a.n_docs == 3 and b.n_docs == 1
    assert a.n_tokens == 80 + 2 + 0 and b.n_tokens == 80
    assert a.max_doc_tokens == 80
    assert a.n_short == 2  # the 2-token doc AND the null doc
    assert a.n_quality_ok == 1 and b.n_quality_ok == 1


def test_domain_stats_quality_count_matches_curate_flags(spark):
    """n_quality_ok per host == the number of curate-gate quality_ok
    docs on that host (the aggregation is exactly the doc gate summed,
    not a reimplementation that can drift)."""
    docs = spark.createDataFrame(
        [
            (i, "h%d" % (i % 3), "en", "word " * (i + 1) + "the and for")
            for i in range(12)
        ],
        "doc_id long, source string, lang string, text string",
    )
    with textops.curate_corpus_scoped(
        docs.select("doc_id", "source", "lang", "text")
    ) as flags:
        truth = {
            r.source: r.n
            for r in docs.join(
                flags.select("doc_id", "quality_ok"), "doc_id"
            )
            .groupBy("source")
            .agg(F.sum(F.col("quality_ok").cast("long")).alias("n"))
            .collect()
        }
    got = {
        r.host: r.n_quality_ok
        for r in textops.domain_stats(docs, host_col="source").collect()
    }
    assert got == truth


def test_domain_stats_single_shuffle_plan(spark):
    """One partial-aggregatable exchange: the plan must contain exactly
    one hashpartitioning exchange (map-side combine before it) and no
    window sort — a viral host must cost combines, not a hot reducer
    sort."""
    df = spark.createDataFrame(
        [("h", "a b c")], "host string, text string"
    )
    plan = (
        textops.domain_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("hashpartitioning") == 1
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# html_metadata
# ---------------------------------------------------------------------------

def _metadata_of(spark, html):
    from dompa_spark import pipeline

    df = spark.createDataFrame([("1", html)], "doc_id string, html string")
    spans = df.select(
        "doc_id",
        F.array(textops.html_span(F.col("html"), 0)).alias("spans"),
    )
    return textops.html_metadata(pipeline.parse_nodes_df(spans)).collect()[0]


def test_html_metadata_full_page(spark):
    r = _metadata_of(
        spark,
        '<html lang="fr"><head><title>T1</title>'
        '<meta name="description" content="D1">'
        '<link rel="canonical" href="https://x/c"></head>'
        "<body><p>b</p></body></html>",
    )
    assert (r.title, r.meta_description, r.canonical_url, r.html_lang) == (
        "T1", "D1", "https://x/c", "fr",
    )


def test_html_metadata_decoys_never_surface(spark):
    """robots meta / stylesheet link / a second description must not
    shadow the real fields; first match wins on duplicates."""
    r = _metadata_of(
        spark,
        '<html lang="en"><head>'
        '<meta name="robots" content="noindex">'
        '<meta name="description" content="real">'
        '<meta name="description" content="dup-later">'
        '<link rel="stylesheet" href="/s.css">'
        '<link rel="canonical" href="https://x/first">'
        '<link rel="canonical" href="https://x/second">'
        "<title>first</title><title>second</title></head></html>",
    )
    assert r.meta_description == "real"
    assert r.canonical_url == "https://x/first"
    assert r.title == "first"


def test_html_metadata_absent_fields_are_null_not_dropped(spark):
    r = _metadata_of(spark, "<div><p>no head at all</p></div>")
    assert r.title is None
    assert r.meta_description is None
    assert r.canonical_url is None
    assert r.html_lang is None


def test_html_metadata_title_direct_child_text_only(spark):
    """Same parent-pointer contract as outlink anchor text: text nested
    in markup INSIDE <title> belongs to the inner element."""
    r = _metadata_of(
        spark, "<html><head><title>a <b>bold</b> z</title></head></html>"
    )
    assert r.title == "a  z"


def test_html_metadata_attr_quirks(spark):
    """Attr values go through the real attr parser including its
    reference quirks: unquoted values work; SINGLE-quoted values keep
    their quote characters (the reference normalizes only double
    quotes), so a single-quoted name='description' does NOT match the
    description lookup — reference parity over leniency. A meta with
    no name attr must not match either."""
    r = _metadata_of(
        spark,
        "<html lang=de><head>"
        "<meta content='orphan'>"
        "<meta name='description' content='sq'>"
        '<meta name="description" content="dq">'
        "</head></html>",
    )
    assert r.html_lang == "de"
    assert r.meta_description == "dq"  # the single-quoted one is
    # "'description'" after the reference's attr normalization


# ---------------------------------------------------------------------------
# anchor_text_agg
# ---------------------------------------------------------------------------

def _links(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, href string, anchor_text string"
    )


def test_anchor_text_agg_counts_and_tiebreak(spark):
    """Exact counts; top pick ties break to the lexicographically
    smallest anchor (deterministic under any aggregation order)."""
    rows = [
        (1, "https://h.org/a", "zeta"),
        (2, "https://h.org/b", "alpha"),
        (3, "https://h.org/c", "zeta"),
        (3, "https://h.org/d", "alpha"),   # tie: alpha==zeta==2
        (4, "https://other.io/x", "solo"),
    ]
    got = {r.host: r for r in textops.anchor_text_agg(_links(spark, rows)).collect()}
    h = got["h.org"]
    assert h.n_inlinks == 4
    assert h.n_src_docs == 3       # doc 3 links twice, counts once
    assert h.n_unique_anchors == 2
    assert h.top_anchor == "alpha" and h.top_anchor_n == 2
    assert got["other.io"].n_inlinks == 1


def test_anchor_text_agg_host_parse_and_drops(spark):
    """Host parse lowercases and strips ports; hrefs with no parseable
    host (relative, fragment-only, NULL) are dropped, never a NULL/''
    host group."""
    rows = [
        (1, "HTTPS://WWW.Ex.COM:443/p", "a"),
        (2, "https://www.ex.com/q", "a"),
        (3, "/relative/only", "b"),
        (4, "#frag", "b"),
        (5, None, "b"),
    ]
    got = {r.host: r for r in textops.anchor_text_agg(_links(spark, rows)).collect()}
    assert set(got) == {"www.ex.com"}
    assert got["www.ex.com"].n_inlinks == 2


def test_anchor_text_agg_no_window_plan(spark):
    """The engine-side plan must be window-free (partial-agg rollups +
    one host join) — a viral host must never serialize into one task's
    sort."""
    plan = (
        textops.anchor_text_agg(_links(spark, [(1, "https://h/", "a")]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# normalize_text / url_filter
# ---------------------------------------------------------------------------

def test_normalize_text_rules_and_idempotence(spark):
    """Each rule fires; normalization is a fixpoint (normalizing the
    normalized text changes nothing — same contract as url_normalize
    and pii_scrub: a re-run pipeline stage must not mutate data)."""
    df = spark.createDataFrame(
        [
            (1, "\tHello   WORLD 42\x01x\t"),
            (2, None),
            (3, "already clean"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in textops.normalize_text(df).collect()}
    assert got[1].text_norm == "hello world 00 x"
    assert got[2].text_norm is None and got[2].n_chars == 0
    assert got[3].text_norm == "already clean"
    once = textops.normalize_text(df).select(
        "doc_id", F.col("text_norm").alias("text")
    )
    again = {r.doc_id: r.text_norm
             for r in textops.normalize_text(once).collect()}
    assert again == {k: r.text_norm for k, r in got.items()}


def test_normalize_text_zero_shuffle_plan(spark):
    plan = (
        textops.normalize_text(
            spark.createDataFrame([(1, "x")], "doc_id long, text string")
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_url_filter_rules(spark):
    """Min-rule tie-break on overlapping prefixes; case-significant
    paths; one row per URL including never-matched and no-rule
    hosts."""
    urls = spark.createDataFrame(
        [
            (1, "https://B.org/A/b5/x"),   # rules 2 and 3 match -> 2
            (2, "https://b.org/A/b9"),     # only rule 3 -> 3
            (3, "https://b.org/a/b5"),     # lowercase path: no match
            (4, "https://c.org/A/b5"),     # host has no rules
        ],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [(2, "b.org", "/A/b5"), (3, "b.org", "/A/b")],
        "rule_id long, host string, path_prefix string",
    )
    got = {r.doc_id: r for r in textops.url_filter(urls, rules).collect()}
    assert (got[1].denied, got[1].rule_id) == (True, 2)
    assert (got[2].denied, got[2].rule_id) == (True, 3)
    assert (got[3].denied, got[3].rule_id) == (False, None)
    assert (got[4].denied, got[4].rule_id) == (False, None)
    assert len(got) == 4


def test_url_filter_broadcast_plan(spark):
    """The rules side must reach the frontier as a broadcast — no
    shuffle of the URL table for the join (the rollup's own exchange
    is the only one allowed)."""
    urls = spark.createDataFrame(
        [(1, "https://b.org/A")], "doc_id long, url string"
    )
    rules = spark.createDataFrame(
        [(1, "b.org", "/A")], "rule_id long, host string, path_prefix string"
    )
    plan = (
        textops.url_filter(urls, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "SortMergeJoin" not in plan


def test_anchor_text_agg_single_parse(spark):
    """The two aggregation branches (top-anchor rollup, distinct-doc
    count) must share ONE materialization of the upstream plan: after
    execution the final plan reads the checkpointed slim pre-aggregate
    (ExistingRDD), not two MapInArrow parse subtrees (Catalyst
    column-prunes the branches into different first exchanges, so
    exchange reuse alone cannot deduplicate the parse — measured 2x
    before the checkpoint)."""
    from dompa_spark import pipeline

    docs = spark.createDataFrame(
        [(str(i), "w%d x" % i) for i in range(6)],
        "doc_id string, text string",
    )
    wrapped = textops.linkfarm_wrapped(docs)
    links = textops.extract_outlinks_df(pipeline.parse_nodes_df(wrapped))
    out = textops.anchor_text_agg(links)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 0
    assert "ExistingRDD" in plan


def test_dedup_recall_normalization_and_counts(spark):
    """Pair order normalizes on both sides, duplicate labels collapse,
    misses count; the recall arithmetic is exact."""
    pairs = spark.createDataFrame(
        [(2, 1), (3, 4), (3, 4)], "doc_a long, doc_b long"
    )
    truth = spark.createDataFrame(
        [(1, 2), (2, 1), (4, 3), (5, 6), (7, 8)],
        "doc_a long, doc_b long",
    )
    r = textops.dedup_recall(pairs, truth).collect()[0]
    assert (r.n_truth, r.n_detected, r.recall) == (4, 2, 0.5)


def test_dedup_recall_zero_detected(spark):
    """An empty detector output still yields one well-formed row (the
    gauge must report 0.0, not vanish)."""
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    truth = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    r = textops.dedup_recall(pairs, truth).collect()[0]
    assert (r.n_truth, r.n_detected, r.recall) == (1, 0, 0.0)


def test_dedup_recall_moves_with_threshold(spark):
    """The knob works end-to-end: loosening jaccard_min can only raise
    recall on the engineered positives (monotone in the threshold)."""
    docs = spark.createDataFrame(
        [(i, " ".join("w%d" % (i * 40 + j) for j in range(4 + i)))
         for i in range(10)],
        "doc_id long, text string",
    )
    aug = textops.with_near_dups(docs)
    truth = docs.filter("doc_id % 5 = 0").selectExpr(
        "doc_id AS doc_a", "doc_id + 1000000 AS doc_b"
    )
    r_tight = textops.dedup_recall(
        textops.minhash_lsh_pairs(aug, jaccard_min=0.9), truth
    ).collect()[0]
    r_loose = textops.dedup_recall(
        textops.minhash_lsh_pairs(aug, jaccard_min=0.1), truth
    ).collect()[0]
    assert r_loose.recall >= r_tight.recall
    assert r_loose.n_truth == r_tight.n_truth == 2


# ---------------------------------------------------------------------------
# host_boilerplate
# ---------------------------------------------------------------------------

def test_host_boilerplate_scoping_and_thresholds(spark):
    """The template line strips ONLY on its own host and only when the
    host is big enough: host A (4 docs, banner in all) strips; host B
    (4 docs, banner in 2 = 50% < 60%) keeps; host C (2 docs < 
    min_host_docs) keeps its 100% banner; A's banner appearing once on
    B does not strip there."""
    rows = []
    for i in range(4):
        rows.append((i, "a.com", "body a%d\nBANNER-A" % i))
    rows.append((10, "b.com", "body b0\nBANNER-B"))
    rows.append((11, "b.com", "body b1\nBANNER-B"))
    rows.append((12, "b.com", "body b2\nBANNER-A"))
    rows.append((13, "b.com", "body b3"))
    rows.append((20, "c.com", "body c0\nBANNER-C"))
    rows.append((21, "c.com", "body c1\nBANNER-C"))
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    got = {r.doc_id: r for r in textops.host_boilerplate(df).collect()}
    for i in range(4):
        assert got[i].text_clean == "body a%d" % i and got[i].n_removed == 1
    for i in (10, 11, 12, 13):
        assert got[i].n_removed == 0  # 50% banner + foreign banner kept
    assert got[12].text_clean == "body b2\nBANNER-A"
    for i in (20, 21):
        assert got[i].n_removed == 0  # tiny host exempt
    assert all(r.host for r in got.values())


def test_host_boilerplate_exact_fraction_boundary(spark):
    """c * 10^6 >= ppm * n at the boundary: 3 of 5 docs (60%) strips
    at frac_min=0.6, 2 of 5 (40%) does not — integer math, no float
    epsilon."""
    rows = [(i, "x", "t%d\nL3" % i) for i in range(3)]
    rows += [(3, "x", "t3\nL2"), (4, "x", "t4\nL2")]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    got = {r.doc_id: r for r in textops.host_boilerplate(
        df, frac_min=0.6, min_host_docs=3).collect()}
    assert all(got[i].n_removed == 1 for i in range(3))       # L3 at 60%
    assert all(got[i].n_removed == 0 for i in (3, 4))          # L2 at 40%


def test_host_boilerplate_null_text_and_fast_path(spark):
    df = spark.createDataFrame(
        [(1, "h", None), (2, "h", "clean only"), (3, "h", "also clean"),
         (4, "h", "yet another")],
        "doc_id long, host string, text string",
    )
    got = {r.doc_id: r for r in textops.host_boilerplate(df).collect()}
    assert got[1].n_segments == 0 and got[1].text_clean == ""
    assert got[2].text_clean == "clean only" and got[2].n_removed == 0


def test_domain_stats_custom_text_col(spark):
    """text_col must drive the quality gate too, not just the token
    counts — with BOTH a decoy 'text' column and the real 'body',
    every stat (incl. n_quality_ok) comes from 'body' (review catch:
    the old form read quality from the hardcoded 'text')."""
    long_good = " ".join(["the", "and", "for", "with"] * 20)
    df = spark.createDataFrame(
        [("a", long_good, "x"), ("a", "tiny", long_good)],
        "host string, body string, text string",
    )
    got = textops.domain_stats(df, text_col="body").collect()[0]
    assert got.n_tokens == 80 + 1
    assert got.n_quality_ok == 1  # the long body passes, 'tiny' fails
    # and no 'text' column at all must work
    got2 = textops.domain_stats(
        df.select("host", "body"), text_col="body"
    ).collect()[0]
    assert (got2.n_tokens, got2.n_quality_ok) == (81, 1)


def test_url_filter_rule_host_case_insensitive(spark):
    """A blocklist authored with an uppercase host must still match
    (review catch: only the URL side was lowercased, so such a rule
    was a silent no-op)."""
    urls = spark.createDataFrame(
        [(1, "https://blocked.org/Bad/x")], "doc_id long, url string"
    )
    rules = spark.createDataFrame(
        [(1, "Blocked.ORG", "/Bad")],
        "rule_id long, host string, path_prefix string",
    )
    r = textops.url_filter(urls, rules).collect()[0]
    assert r.denied is True and r.rule_id == 1


def test_normalize_text_differential_fuzz(spark):
    """Randomized equivalence against a pure-Python reference of the
    same rule chain (control->space, lower, digit->0, collapse, trim).
    ASCII + control-char alphabet on purpose: unicode case mapping is
    locale-shaped and deliberately NOT part of the operator's contract
    (see the no-NFC note in the docstring)."""
    import random
    import re

    def ref(t):
        t = re.sub(r"[\x00-\x1f\x7f]", " ", t)
        t = t.lower()
        t = re.sub(r"[0-9]", "0", t)
        return re.sub(r" +", " ", t).strip()

    rng = random.Random(11)
    alphabet = (
        "abXY z09\t\n\x01\x7f.,-_"
    )
    rows = [
        (i, "".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 60))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text_norm
           for r in textops.normalize_text(df).collect()}
    for i, t in rows:
        assert got[i] == ref(t), (i, repr(t), repr(got[i]), repr(ref(t)))


def test_host_boilerplate_differential_fuzz(spark):
    """Randomized equivalence against a pure-Python reference of the
    host-scoped fraction vote (newline mode)."""
    import random

    rng = random.Random(23)
    lines = ["banner", "promo", "alpha beta", "x", "longer line here"]
    rows = []
    for i in range(120):
        host = "h%d" % rng.randrange(6)
        k = rng.randrange(1, 4)
        text = "\n".join(
            "%s %s" % (rng.choice(lines),
                       host if rng.random() < 0.5 else "")
            for _ in range(k)
        )
        rows.append((i, host, text))

    frac_min, min_docs, min_chars = 0.6, 3, 1
    ppm = int(round(frac_min * 1_000_000))
    host_n = {}
    for _, h, _t in rows:
        host_n[h] = host_n.get(h, 0) + 1
    seg_docs = {}
    for i, h, t in rows:
        for s in set(t.split("\n")):
            if len(s) >= min_chars:
                seg_docs.setdefault((h, s), set()).add(i)
    hot = {
        (h, s)
        for (h, s), docs in seg_docs.items()
        if host_n[h] >= min_docs and len(docs) * 1_000_000 >= ppm * host_n[h]
    }

    def ref(i, h, t):
        segs = t.split("\n")
        kept = [s for s in segs if (h, s) not in hot]
        return len(segs), len(segs) - len(kept), "\n".join(kept)

    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    got = {r.doc_id: (r.n_segments, r.n_removed, r.text_clean)
           for r in textops.host_boilerplate(df).collect()}
    for i, h, t in rows:
        assert got[i] == ref(i, h, t), (i, h, repr(t), got[i], ref(i, h, t))


# ---------------------------------------------------------------------------
# split_holdout
# ---------------------------------------------------------------------------

def test_split_holdout_cluster_never_straddles(spark):
    """THE invariant: every doc of a near-dup cluster gets the same
    split (and the same split_key = the component minimum); unpaired
    docs key by their own id."""
    docs = spark.createDataFrame(
        [(i,) for i in range(20)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (2, 12)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r for r in
           textops.split_holdout(docs, pairs=pairs).collect()}
    assert len(got) == 20
    assert got[1].split_key == got[5].split_key == got[9].split_key == 1
    assert got[1].split == got[5].split == got[9].split
    assert got[2].split_key == got[12].split_key == 2
    assert got[2].split == got[12].split
    assert got[7].split_key == 7  # unpaired: own id


def test_split_holdout_deterministic_and_doc_id_keyed(spark):
    """Without pairs the split is the pure map-side md5 bucket on
    doc_id — identical across invocations (never rand()), and the
    valid fraction tracks valid_pct."""
    docs = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = {r.doc_id: r.split for r in textops.split_holdout(docs).collect()}
    b = {r.doc_id: r.split for r in textops.split_holdout(docs).collect()}
    assert a == b
    n_valid = sum(1 for s in a.values() if s == "valid")
    assert 20 <= n_valid <= 90  # ~10% of 500, generous band
    z = {r.doc_id: r.split
         for r in textops.split_holdout(docs, valid_pct=0).collect()}
    assert set(z.values()) == {"train"}


def test_split_holdout_no_pairs_zero_shuffle_plan(spark):
    docs = spark.createDataFrame([(1,)], "doc_id long")
    plan = (
        textops.split_holdout(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_dedup_exact_normalized_catches_perturbed_copies(spark):
    """Raw exact dedup cannot match a case/whitespace/digit-perturbed
    copy (different bytes); the normalized key must. Distinct texts
    stay distinct."""
    df = spark.createDataFrame(
        [
            (1, "Hello World 42"),
            (2, "\thello   world 99  "),   # same canon as 1
            (3, "hello world"),            # different (no digit group)
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in
           textops.dedup_exact_normalized(df).collect()}
    assert got[1].is_dup is False and got[1].keep_doc_id == 1
    assert got[2].is_dup is True and got[2].keep_doc_id == 1
    assert got[3].is_dup is False
    # and the shuffle key is a fixed-width hash, not the text
    assert len(got[1].dedup_key) == 32
