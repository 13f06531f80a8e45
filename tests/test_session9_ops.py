"""Session-9 operators: BM25 retrieval, PMI collocations, length
quantile histogram, char-class entropy gate."""

from pyspark.sql import functions as F

from dompa_spark import textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- bm25_topk --------------------------------------------------------


def test_bm25_term_saturation(spark):
    """The corpus-derived query is the top-cf term ('apple', cf=5);
    only docs containing it are candidates, and the doc stuffed with
    it outranks the single-mention doc."""
    filler = " ".join(f"w{i}" for i in range(20))
    docs = _docs(
        spark,
        [
            (1, "apple apple apple apple " + filler),
            (2, "apple " + filler),
            (3, filler + " pear"),
            (4, filler + " pear"),
        ],
    )
    out = textops.bm25_topk(
        docs, n_queries=1, terms_per_query=1, topk=4
    ).collect()
    out.sort(key=lambda r: r["rank"])
    assert [r["doc_id"] for r in out] == [1, 2]  # tf=4 beats tf=1
    assert out[0]["score_fp"] > out[1]["score_fp"]


def test_bm25_length_normalization_exact(spark):
    """Same tf for the query term, shorter doc scores strictly
    higher (the b * dl/avgdl denominator)."""
    docs = _docs(
        spark,
        [
            (1, "target short doc"),
            (2, "target " + " ".join(f"pad{i}" for i in range(30))),
            (3, "other words entirely here"),
            (4, "other words entirely here"),
        ],
    )
    # force 'target' into the query set: it must be among top cf terms
    out = {
        (r["query_id"], r["doc_id"]): r["score_fp"]
        for r in textops.bm25_topk(
            docs, n_queries=8, terms_per_query=1, topk=4
        ).collect()
    }
    qid = {
        q for (q, d) in out if d in (1, 2)
    }
    # find the query where both doc 1 and doc 2 scored (the 'target'
    # single-term query)
    both = [
        q for q in qid
        if (q, 1) in out and (q, 2) in out
    ]
    assert both, f"no query hit both target docs: {sorted(out)}"
    q = both[0]
    assert out[(q, 1)] > out[(q, 2)]


def test_bm25_rank_contract(spark):
    """Ranks are 1..topk dense per query, ties break doc_id asc."""
    docs = _docs(
        spark,
        [(i, "same text for everyone") for i in range(10)],
    )
    out = textops.bm25_topk(
        docs, n_queries=2, terms_per_query=2, topk=3
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        # identical texts -> identical scores -> doc_id asc order
        assert [r["doc_id"] for r in rows] == sorted(
            r["doc_id"] for r in rows
        )


def test_bm25_salted_topk_equals_global(spark):
    """The salted two-phase top-k equals the unsalted global rank
    (n_salts=1) — the domain_cap exactness argument."""
    import random

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(30)]
    docs = _docs(
        spark,
        [
            (i, " ".join(rng.choices(vocab, k=rng.randint(5, 40))))
            for i in range(60)
        ],
    )
    a = sorted(
        tuple(r) for r in textops.bm25_topk(docs, n_salts=8).collect()
    )
    b = sorted(
        tuple(r) for r in textops.bm25_topk(docs, n_salts=1).collect()
    )
    assert a == b


# --- pmi_topk ---------------------------------------------------------


def test_pmi_collocation_tops_ranking(spark):
    """A bigram whose words ONLY occur together beats bigrams of
    independent frequent words."""
    rows = []
    for i in range(10):
        # 'hong kong' occurs ONLY as the pair; 'the' is 3x as frequent
        # and pairs with different successors each time
        rows.append((i, "hong kong the cat sat the dog sat the cat ran"))
    out = textops.pmi_topk(_docs(spark, rows), min_count=5, k=4).collect()
    assert out[0]["bigram"] == "hong kong"
    assert out[0]["c_ab"] == 10
    assert all(out[0]["pmi"] >= r["pmi"] for r in out)


def test_pmi_min_count_floor(spark):
    """Bigrams below the floor never appear, whatever their PMI."""
    rows = [(1, "unique pairing here")] + [
        (10 + i, "common words common words common") for i in range(10)
    ]
    out = textops.pmi_topk(_docs(spark, rows), min_count=5, k=10).collect()
    assert all("unique" not in r["bigram"] for r in out)


def test_pmi_short_and_null_docs(spark):
    """Docs under 2 tokens and NULL text contribute no bigrams but
    their tokens still count for the unigram totals."""
    rows = [(1, None), (2, "solo")] + [
        (10 + i, "pair bond pair bond pair bond") for i in range(3)
    ]
    out = textops.pmi_topk(_docs(spark, rows), min_count=3, k=10).collect()
    assert {r["bigram"] for r in out} >= {"pair bond", "bond pair"}


# --- length_quantiles -------------------------------------------------


def test_length_quantiles_exact_bins(spark):
    """Known distribution: 100 docs of 10 chars, 100 of 1000 chars —
    median bin holds 10-char docs, p99 bin holds 1000-char docs."""
    rows = [(i, 10) for i in range(100)] + [
        (100 + i, 1000) for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = {
        r["p_bp"]: r
        for r in textops.length_quantiles(docs, bin_width=64).collect()
    }
    assert out[2500]["bin"] == 0 and out[2500]["est_max_chars"] == 64
    assert out[5000]["bin"] == 0  # rank 100 is still in the first bin
    assert out[7500]["bin"] == 1000 // 64
    assert out[9900]["bin"] == 1000 // 64
    assert out[9900]["target_rank"] == 198


def test_length_quantiles_rank_formula(spark):
    """target_rank = ceil(p * n / 10000) exactly (integer math)."""
    docs = spark.createDataFrame(
        [(i, i) for i in range(7)], "doc_id long, n_chars long"
    )
    out = {
        r["p_bp"]: r["target_rank"]
        for r in textops.length_quantiles(docs).collect()
    }
    assert out[5000] == (5000 * 7 + 9999) // 10000  # == 4
    assert out[9900] == (9900 * 7 + 9999) // 10000  # == 7


# --- char_entropy -----------------------------------------------------


def test_char_entropy_degenerate_and_mixed(spark):
    """Single-class text scores 0 bits (rejected); the 4-class uniform
    maximum is 2 bits (rejected as binary-ish); word text passes."""
    docs = _docs(
        spark,
        [
            (1, "aaaaaaaaaa"),          # one class -> 0 bits
            (2, "ab12 !% ab12 !% ab1"),  # mixed classes, high h
            (3, "normal words with letters and spaces"),
            (4, None),
            (5, "123456789012345"),      # digit dump -> 0 bits
        ],
    )
    out = {r["doc_id"]: r for r in textops.char_entropy_scores(docs).collect()}
    assert len(out) == 5  # one row per doc, nulls included
    assert out[1]["h_bits"] == 0.0 and not out[1]["char_ok"]
    assert out[5]["h_bits"] == 0.0 and not out[5]["char_ok"]
    assert out[4]["n_chars"] == 0 and not out[4]["char_ok"]
    assert out[3]["char_ok"]
    assert 0.0 < out[3]["h_bits"] < 1.0
    # 4-class mix approaches 2 bits and fails the upper gate
    assert out[2]["h_bits"] > 1.9 * 0.9


def test_char_entropy_zero_shuffle_plan(spark):
    """The gate is pure map-side: no Exchange in the plan."""
    docs = _docs(spark, [(1, "a b c")])
    plan = textops.char_entropy_scores(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- winnow_fingerprints ----------------------------------------------


def test_winnow_guarantee_shared_run(spark):
    """Two docs sharing a run of >= w+k-1 words share at least one
    selected fingerprint (the winnowing guarantee), even when the
    surrounding text differs completely."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
    docs = _docs(
        spark,
        [
            (1, "one two three " + shared + " four five six"),
            (2, "red green blue " + shared + " cyan magenta yellow"),
        ],
    )
    out = textops.winnow_fingerprints(docs).collect()
    fp1 = {r["fp"] for r in out if r["doc_id"] == 1}
    fp2 = {r["fp"] for r in out if r["doc_id"] == 2}
    assert fp1 & fp2, "shared w+k-1 run must share a fingerprint"


def test_winnow_disjoint_docs_share_nothing(spark):
    docs = _docs(
        spark,
        [
            (1, " ".join(f"a{i}" for i in range(20))),
            (2, " ".join(f"b{i}" for i in range(20))),
        ],
    )
    out = textops.winnow_fingerprints(docs).collect()
    fp1 = {r["fp"] for r in out if r["doc_id"] == 1}
    fp2 = {r["fp"] for r in out if r["doc_id"] == 2}
    assert fp1 and fp2 and not (fp1 & fp2)


def test_winnow_short_and_null_docs_emit_nothing(spark):
    docs = _docs(
        spark,
        [
            (1, None),
            (2, "too short"),
            (3, " ".join(f"w{i}" for i in range(7))),  # n = w+k-2
        ],
    )
    assert textops.winnow_fingerprints(docs).count() == 0


def test_winnow_matches_python_reference(spark):
    """Exact match against a direct Python implementation of
    rightmost-min winnowing on a random doc."""
    import hashlib
    import random

    rng = random.Random(11)
    toks = [f"t{rng.randint(0, 6)}" for _ in range(40)]
    k, w = 4, 5
    hs = []
    for i in range(len(toks) - k + 1):
        gram = " ".join(toks[i:i + k])
        hs.append(int(hashlib.md5(gram.encode()).hexdigest()[:15], 16))
    want = set()
    for j in range(len(hs) - w + 1):
        win = hs[j:j + w]
        mn = min(win)
        # rightmost occurrence of the min
        pos = j + max(i for i, v in enumerate(win) if v == mn)
        want.add((pos + 1, hs[pos]))  # operator is 1-based
    docs = _docs(spark, [(1, " ".join(toks))])
    got = {
        (r["pos"], r["fp"])
        for r in textops.winnow_fingerprints(docs, k=k, w=w).collect()
    }
    assert got == want


def test_winnow_density(spark):
    """Selected count is ~m/w, never more than m (distinct positions)."""
    import random

    rng = random.Random(3)
    toks = [f"x{rng.randint(0, 999)}" for _ in range(200)]
    docs = _docs(spark, [(1, " ".join(toks))])
    cnt = textops.winnow_fingerprints(docs).count()
    m = 200 - 4 + 1
    assert m // 10 <= cnt <= m


# --- bm25 index / search ----------------------------------------------


def test_bm25_index_roundtrip_matches_fused(spark, tmp_path):
    """bm25_search over the PERSISTED index tables reproduces
    bm25_topk's fused answer exactly (same corpus-derived queries),
    and the term filter reaches the postings parquet scan as a pushed
    filter on the term-sorted layout."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    postings, dictionary, docstats = textops.bm25_index(docs)
    idx = str(tmp_path / "txtidx")
    (
        postings.repartition(4, F.col("term"))
        .sortWithinPartitions("term", "doc_id")
        .write.parquet(f"{idx}/postings")
    )
    dictionary.write.parquet(f"{idx}/dictionary")
    docstats.write.parquet(f"{idx}/docstats")

    # replicate bm25_topk's corpus-derived queries from the dictionary
    dic = spark.read.parquet(f"{idx}/dictionary")
    top = dic.orderBy(F.desc("cf"), F.asc("term")).limit(12).collect()
    qrows = [(i // 3, r["term"]) for i, r in enumerate(top)]
    qterms = spark.createDataFrame(qrows, "query_id long, term string")
    term_list = sorted({t for _, t in qrows})

    posts = spark.read.parquet(f"{idx}/postings").filter(
        F.col("term").isin(term_list)
    )
    plan = posts._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term" in plan

    got = sorted(
        map(
            tuple,
            textops.bm25_search(
                qterms,
                posts,
                dic,
                spark.read.parquet(f"{idx}/docstats"),
            ).collect(),
        )
    )
    want = sorted(map(tuple, textops.bm25_topk(docs).collect()))
    assert got == want


# --- winnow_contamination ---------------------------------------------


def test_winnow_contamination_flags_quoters(spark):
    """A doc quoting >= w+k-1 contiguous benchmark words is flagged
    (the winnowing guarantee carried into the contamination check);
    clean docs are not; benchmark docs flag themselves."""
    quoted = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    rows = [
        (0, quoted + " and some benchmark only trailing words here"),
        (5, "innocent prose " + quoted + " copied straight in temper"),
        (7, " ".join(f"clean{i}" for i in range(20))),
    ]
    out = {
        r["doc_id"]: r
        for r in textops.winnow_contamination(
            _docs(spark, rows)
        ).collect()
    }
    assert out[0]["contaminated"]        # bench doc (id % 97 == 0): self
    assert out[5]["contaminated"]        # quoter
    assert not out[7]["contaminated"]    # clean
    assert out[7]["n_hits"] == 0 and out[7]["n_fps"] > 0


def test_winnow_contamination_explicit_bench_side(spark):
    """Passing an explicit benchmark table overrides the modulo
    default."""
    quoted = "one two three four five six seven eight"
    corpus = _docs(
        spark,
        [
            (1, "padding words " + quoted + " more padding words"),
            (2, " ".join(f"z{i}" for i in range(20))),
        ],
    )
    bench = _docs(spark, [(900, quoted + " benchmark tail words pad")])
    out = {
        r["doc_id"]: r["contaminated"]
        for r in textops.winnow_contamination(corpus, bench).collect()
    }
    assert out == {1: True, 2: False}


# --- lm2_surprisal ----------------------------------------------------


def test_lm2_word_order_matters(spark):
    """The bigram gate separates coherent from scrambled text built
    from the SAME unigram distribution — exactly what the unigram gate
    cannot do."""
    import random

    coherent = " ".join(["the cat sat on the mat"] * 20)
    words = coherent.split()
    # deterministic scramble with the same multiset of words (an
    # arithmetic permutation i*37 % n silently preserved the period-6
    # word order — 37 = 1 mod 6)
    rng = random.Random(5)
    shuffled = words[:]
    rng.shuffle(shuffled)
    scrambled = " ".join(shuffled)
    corpus = [(i, coherent) for i in range(10)] + [(100, scrambled)]
    # bigram_k=8 keeps only the coherent transitions in the LM (at the
    # default 4096 a 7-word vocab fits EVERY observed bigram, including
    # the scrambled doc's own — hit ratios would tie)
    out = {
        r["doc_id"]: r
        for r in textops.lm2_surprisal_scores(
            _docs(spark, corpus), bigram_k=8
        ).collect()
    }
    assert out[0]["bigram_hit_ratio"] > out[100]["bigram_hit_ratio"]
    assert out[0]["mean_surprisal"] < out[100]["mean_surprisal"]


def test_lm2_null_and_empty_contract(spark):
    """One row per doc; null text reports n_tokens=0 and fails."""
    rows = [(1, None), (2, "some words repeated some words repeated")]
    out = {
        r["doc_id"]: r
        for r in textops.lm2_surprisal_scores(_docs(spark, rows)).collect()
    }
    assert len(out) == 2
    assert out[1]["n_tokens"] == 0 and not out[1]["lm2_ok"]
    assert out[2]["n_tokens"] == 6


def test_lm2_first_token_unigram_no_penalty(spark):
    """A one-token doc is scored by the plain unigram bucket (no
    backoff penalty, no bigram path)."""
    rows = [(1, "hello")] + [(10 + i, "hello hello hello") for i in range(3)]
    out = {
        r["doc_id"]: r
        for r in textops.lm2_surprisal_scores(_docs(spark, rows)).collect()
    }
    # N=10 total 'hello' occurrences -> bucket = floor(log2(10//10))=0
    assert out[1]["bigram_hit_ratio"] == 0.0
    assert out[1]["mean_surprisal"] == 0.0


# --- tokenizer_fertility ----------------------------------------------


def test_tokenizer_fertility_per_lang(spark):
    """Merge-heavy words (the/th/in merges fire) yield lower fertility
    than merge-free words; zero-word and null-text docs report 0."""
    docs = spark.createDataFrame(
        [
            (1, "the the the the", "en"),      # 'the' -> 1 symbol each
            (2, "zzzz qqqq xxxx", "xx"),       # no merges: 4 chars each
            (3, None, "nn"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {
        r["lang"]: r
        for r in textops.tokenizer_fertility(docs).collect()
    }
    assert out["en"]["n_words"] == 4
    assert out["en"]["fertility"] == 1.0      # fully merged
    assert out["xx"]["fertility"] == 4.0      # 4 symbols per word
    assert out["nn"]["n_words"] == 0 and out["nn"]["fertility"] == 0.0
