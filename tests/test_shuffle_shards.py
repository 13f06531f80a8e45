"""Deterministic training-order shuffle (textops.shuffle_shards)."""

import pytest

from dompa_spark import textops


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in range(2000)],
        "doc_id long, text string",
    )


def test_deterministic_across_partitioning(spark, docs):
    a = sorted(map(tuple, textops.shuffle_shards(docs, 8, 1).collect()))
    b = sorted(
        map(tuple, textops.shuffle_shards(docs.repartition(7), 8, 1).collect())
    )
    assert a == b


def test_pos_dense_per_shard(spark, docs):
    rows = textops.shuffle_shards(docs, 8, 1).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) == set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


def test_salt_reshuffles_same_doc_set(spark, docs):
    e0 = textops.shuffle_shards(docs, 8, 0).collect()
    e1 = textops.shuffle_shards(docs, 8, 1).collect()
    assert {r.doc_id for r in e0} == {r.doc_id for r in e1}
    # a fresh permutation: the (shard, pos) assignment moves for most docs
    m0 = {r.doc_id: (r.shard, r.pos) for r in e0}
    moved = sum(1 for r in e1 if m0[r.doc_id] != (r.shard, r.pos))
    assert moved > 1500


def test_shard_balance_is_hash_uniform(spark, docs):
    sizes = [
        r.n for r in textops.shuffle_shards(docs, 8, 1)
        .groupBy("shard").count().withColumnRenamed("count", "n").collect()
    ]
    assert max(sizes) / (sum(sizes) / len(sizes)) < 1.3


def test_plan_single_exchange(spark, docs):
    plan = (
        textops.shuffle_shards(docs, 8, 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan
