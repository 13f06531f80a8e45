"""Count-min sketch: one-sided error, exactness without collisions,
overestimation under forced collisions, shard mergeability, and the
missing-bucket zero read.
"""

import pytest
from pyspark.sql import functions as F

from dompa_spark import textops


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _est_map(spark, docs, w, terms):
    sk = textops.cms_sketch(docs, w=w)
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    out = textops.cms_estimate(sk, tdf, w=w)
    return {r["term"]: r["cms_est"] for r in out.collect()}


def test_one_sided_error_every_term(spark):
    docs = _docs(
        spark,
        ["alpha beta gamma alpha", "beta beta delta", "gamma alpha zz"],
    )
    exact = {"alpha": 3, "beta": 3, "gamma": 2, "delta": 1, "zz": 1}
    # tiny width forces collisions; the estimate may only OVERcount
    est = _est_map(spark, docs, 4, list(exact))
    for t, c in exact.items():
        assert est[t] >= c, t


def test_exact_when_no_collisions(spark):
    docs = _docs(spark, ["alpha beta alpha", "beta gamma"])
    est = _est_map(spark, docs, 512, ["alpha", "beta", "gamma"])
    assert est == {"alpha": 2, "beta": 2, "gamma": 1}


def test_collisions_overestimate_somewhere(spark):
    # w=2: five distinct terms cannot avoid sharing buckets in every
    # row, so at least one estimate strictly exceeds its exact count.
    docs = _docs(spark, ["a b c d e"])
    est = _est_map(spark, docs, 2, list("abcde"))
    assert any(v > 1 for v in est.values())
    assert all(v >= 1 for v in est.values())


def test_shard_sketches_merge_by_sum(spark):
    a = _docs(spark, ["alpha beta", "gamma alpha"])
    b = _docs(spark, ["beta beta zz"])
    both = a.unionAll(b)
    merged = (
        textops.cms_sketch(a)
        .unionAll(textops.cms_sketch(b))
        .groupBy("r", "b")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    direct = textops.cms_sketch(both)
    sym = merged.exceptAll(direct).count() + direct.exceptAll(merged).count()
    assert sym == 0


def test_unseen_term_reads_zero(spark):
    docs = _docs(spark, ["aaa aaa"])
    est = _est_map(spark, docs, 512, ["zzz"])
    assert est["zzz"] == 0


def test_sketch_cardinality_bounded(spark):
    docs = _docs(spark, ["a b c d e f g h i j k l m n o p"])
    sk = textops.cms_sketch(docs, w=8)
    assert sk.count() <= textops.CMS_D * 8


def test_embedding_stats_hand_vectors(spark):
    """Exact per-dim stats on crafted vectors incl. a dead dimension
    and a negative mean."""
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.5, -0.25]),
            (2, [1.0, 0.3, -0.75]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["dim_idx"]: r.asDict()
           for r in textops.embedding_stats(emb).collect()}
    s = textops.EMB_STATS_SCALE
    # dim 0 is dead: min == max
    assert out[0]["min_fp"] == out[0]["max_fp"] == s
    assert out[0]["mean_fp"] == s
    assert out[0]["sumsq_fp"] == 2 * s * s
    # dim 1: mean of 5000, 3000 = 4000
    assert out[1]["mean_fp"] == 4000
    # dim 2: negative values — exact snap, truncating mean
    assert out[2]["min_fp"] == -7500 and out[2]["max_fp"] == -2500
    assert out[2]["mean_fp"] == (-2500 - 7500) // 2
    assert all(r["n_vecs"] == 2 for r in out.values())
