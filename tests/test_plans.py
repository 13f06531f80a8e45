"""Physical-plan assertions: lock in the plan properties BENCH.md claims.

These don't execute the heavy queries — they compile each DataFrame and
inspect `explain("formatted")` output. Guards against regressions like an
accidental per-row Python UDF on the hot path, a lost broadcast hint, a
second shuffle in the extraction pipeline, or a scan that stops pruning
columns.
"""

from __future__ import annotations

import contextlib
import io
import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR),
    reason=f"plan fixture dir {SF_DIR} absent "
    "(set SPARK_GRAFT_PLAN_SF_DIR to a testdata sf directory)",
)


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def nodes_of(plan: str) -> list[str]:
    """Operator names from a formatted plan's detail headers
    ('(3) Exchange' -> 'Exchange') — one entry per physical node, so
    counting them is unambiguous (the tree rendering repeats names)."""
    import re

    return re.findall(r"^\(\d+\) (\S+)", plan, flags=re.MULTILINE)


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as m

    return m


def test_extract_pipeline_has_exactly_one_exchange(spark, small_corpus):
    from pyspark.sql import functions as F

    from dompa_spark import pipeline

    df = pipeline.read_input(spark, small_corpus)
    df = pipeline.with_part_id(df, light_parts=8, heavy_parts=2)
    df = df.repartition(10, F.col("part_id"))
    out = pipeline.extract_df(df, with_metrics=True)
    plan = plan_of(out)
    exchanges = [n for n in nodes_of(plan) if "Exchange" in n]
    assert exchanges == ["Exchange"], plan
    assert "hashpartitioning(part_id" in plan, plan


def test_extract_pipeline_prunes_scan_to_two_columns(spark, small_corpus):
    from dompa_spark import pipeline

    df = pipeline.read_input(spark, small_corpus)
    out = pipeline.extract_df(pipeline.with_part_id(df))
    plan = plan_of(out)
    # the parquet scan must read only doc_id + spans
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    assert "doc_id" in scan[0] and "spans" in scan[0], scan[0]


def test_no_row_at_a_time_python_anywhere(spark, entry_mod):
    """BatchEvalPython = per-row Python UDF — banned on every query.
    (ArrowEvalPython / MapInArrow / *InPandas are the vectorized paths.)"""
    for name, fn in entry_mod.queries().items():
        plan = plan_of(fn(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, f"{name} uses per-row Python"
    spark.catalog.clearCache()  # drop the loop's lazy cache marks


def test_no_unbounded_cartesian_products(spark, entry_mod):
    """CartesianProduct (both sides shuffled, all-pairs) must never
    appear. BroadcastNestedLoopJoin is tolerated only where the plan is
    deliberately brute-force over a broadcast side (ann_cosine_topk)."""
    # ann_cosine_topk: deliberate brute-force over a broadcast query side
    # tfidf_top_terms: corpus size N joins in as a broadcast SINGLE-ROW
    #   aggregate (the no-driver-count way to get a global scalar) — a
    #   1-row BNLJ is a constant, not an all-pairs join
    # ann_ivf_topk: the coarse-quantizer assignment joins every vector
    #   against the broadcast n_centroids-row (16) centroid table by
    #   construction — a bounded-constant fanout that collapses map-side
    #   (partial_min) before any shuffle, not an all-pairs join
    # ivf_list_sizes: same centroid-assignment subplan as ann_ivf_topk
    # ann_recall: composes ann_cosine_topk + ann_ivf_topk, so it
    #   inherits exactly their allowed broadcast nested loops
    # lm_surprisal: total token count N joins in as a broadcast 1-row
    #   aggregate (the tfidf pattern)
    # corpus_mixture: corpus token total joins in as a broadcast 1-row
    #   aggregate (same pattern)
    # dsir_weights: BOTH corpus token totals (raw and target) join in
    #   as broadcast 1-row aggregates (the lm_surprisal pattern twice)
    # sample_mixture: composes corpus_mixture, inheriting its 1-row
    #   corpus-total broadcast
    # bpe_train: each round applies the argmax merge via a broadcast
    #   1-row join (the no-collect training loop)
    # semdedup: same bounded 16-row centroid-assignment crossJoin as
    #   ann_ivf_topk (shared _ivf_cents training); the within-cluster
    #   scan itself is an equi-join on cid, never all-pairs
    # (pq_codes / ann_pq_topk need NO allowance: the fused sliced form
    #   joins the broadcast codebook on sub equality — hash joins
    #   throughout)
    # ann_ivfpq_topk: the coarse-quantizer assignment is the same
    #   bounded 16-row centroid crossJoin as ann_ivf_topk; the PQ side
    #   and the ADC scoring join are all equi-joins
    # cluster_topics: the same bounded 16-row centroid-assignment
    #   crossJoin as ann_ivf_topk (shared _ivf_cents training) plus the
    #   broadcast 1-row corpus-total join (the corpus_mixture pattern)
    # bm25_topk: collection stats (n_docs, n_tokens) join in as a
    #   broadcast 1-row aggregate (the tfidf pattern); query terms are
    #   a broadcast EQUI join on term
    # pmi_topk: the two corpus totals (n_bi, n_uni) join in as
    #   broadcast 1-row aggregates; the unigram joins are equi-joins
    # length_quantiles: the total-count 1-row aggregate plus the
    #   5-row literal quantile list both join broadcast — bounded by
    #   len(QUANTILE_BPS) x #bins (value-range-bounded), never data-sized
    # funnel_steps: each step's conversion ratio joins the previous
    #   step's user count as a broadcast 1-row aggregate (k tiny rows)
    # lm2_surprisal: corpus token total N joins in as a broadcast
    #   1-row aggregate (the lm_surprisal pattern); both LM tables are
    #   broadcast EQUI joins
    # bitext_mine: deliberate brute-force scoring over the broadcast
    #   bounded probe side (the ann_cosine_topk contract)
    # dedup_cluster_stats: the singleton-remainder row joins two 1-row
    #   aggregates (corpus total x in-cluster total) via broadcast —
    #   a constant, not an all-pairs join
    allowed_bnlj = {"ann_cosine_topk", "tfidf_top_terms", "ann_ivf_topk",
                    "ivf_list_sizes", "ann_recall", "lm_surprisal",
                    "corpus_mixture", "dsir_weights", "sample_mixture",
                    "bpe_train", "semdedup", "ann_ivfpq_topk",
                    "cluster_topics", "bm25_topk", "pmi_topk",
                    "length_quantiles", "lm2_surprisal", "funnel_steps",
                    "bitext_mine", "dedup_cluster_stats"}
    for name, fn in entry_mod.queries().items():
        plan = plan_of(fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, f"{name} has a cartesian join"
        if name not in allowed_bnlj:
            assert "BroadcastNestedLoopJoin" not in plan, (
                f"{name} has an all-pairs nested-loop join"
            )
    # building these plans registers operator-internal .cache() marks;
    # drop them so later plan tests see canonical (uncached) plans with
    # their PushedFilters/scan lines intact, as bench.py's loop does
    spark.catalog.clearCache()


def test_ann_cosine_broadcasts_queries_and_pushes_filter(spark, entry_mod):
    plan = plan_of(entry_mod.q_ann_cosine_topk(spark, SF_DIR))
    assert "BroadcastExchange" in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("vec_id" in ln for ln in pushed), plan
    # rank<=k is pushed below the final sort via WindowGroupLimit
    assert "WindowGroupLimit" in plan, plan


def test_ann_lsh_is_equi_join_on_bucket(spark, entry_mod):
    plan = plan_of(entry_mod.q_ann_lsh_topk(spark, SF_DIR))
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_minhash_lsh_joins_on_band_key(spark, entry_mod):
    plan = plan_of(entry_mod.q_dedup_minhash_lsh(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_simhash_dedup_joins_on_band_key_with_cached_sigs(spark, entry_mod):
    """The r01-flagged quadratic shape is gone: candidate join is an
    equi-join on (band, bkey) over the CACHED (doc_id, simhash)
    projection — the hash expression must not re-evaluate per side."""
    plan = plan_of(entry_mod.q_simhash_dedup(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "InMemoryTableScan" in plan, plan  # sig cache feeds both sides


def test_embedding_dedup_vectorized_bucketing(spark, entry_mod):
    """SRP bucketing must be the Arrow-vectorized kernel (ArrowEvalPython
    / scalar pandas_udf), never row-at-a-time Python, and the bucketed
    projection must be cached for its three consumers."""
    plan = plan_of(entry_mod.q_dedup_embedding_cosine(spark, SF_DIR))
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "InMemoryTableScan" in plan, plan


def test_scalar_queries_prune_unused_columns(spark, entry_mod):
    """token_stats touches only doc_id+text; the documents scan must not
    read lang/source/n_chars."""
    plan = plan_of(entry_mod.q_token_stats(spark, SF_DIR))
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scans, plan
    assert "text" in scans[0], scans[0]
    assert "lang" not in scans[0] and "source" not in scans[0], scans[0]
