"""Product quantization (textops.pq_codebooks / pq_codes /
ann_pq_topk): code shape, determinism, ADC recall on an engineered
clustered corpus, and the broadcast-plan contract."""

import numpy as np
import pytest

from dompa_spark import textops

DIM = 16
M = 4
K = 8


@pytest.fixture(scope="module")
def clustered(spark):
    """8 well-separated clusters: centers ~N(0, 10), points = center +
    N(0, 0.1) noise — inter-cluster distance dominates quantization
    error, so ADC must keep neighbors in-cluster."""
    rng = np.random.default_rng(7)
    centers = rng.normal(0.0, 10.0, (8, DIM))
    rows = []
    for i in range(400):
        c = i % 8
        v = centers[c] + rng.normal(0.0, 0.1, DIM)
        rows.append((i, [float(x) for x in v], c))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    return df, {i: i % 8 for i in range(400)}


def test_codes_shape_and_range(spark, clustered):
    df, _ = clustered
    rows = textops.pq_codes(df, dim=DIM, m=M, k=K).collect()
    assert len(rows) == 400 * M
    assert all(0 <= r.code < K for r in rows)
    per_vec = {}
    for r in rows:
        per_vec.setdefault(r.vec_id, set()).add(r.sub)
    assert all(subs == set(range(M)) for subs in per_vec.values())


def test_codes_deterministic_across_partitioning(spark, clustered):
    df, _ = clustered
    a = sorted(map(tuple, textops.pq_codes(df, dim=DIM, m=M, k=K).collect()))
    b = sorted(
        map(
            tuple,
            textops.pq_codes(
                df.repartition(7), dim=DIM, m=M, k=K
            ).collect(),
        )
    )
    assert a == b


def test_same_cluster_shares_codes(spark, clustered):
    # tight clusters quantize to one codeword per subspace almost
    # always: the compression actually compresses
    df, label = clustered
    rows = textops.pq_codes(df, dim=DIM, m=M, k=K).collect()
    key = {}
    for r in rows:
        key.setdefault(r.vec_id, {})[r.sub] = r.code
    sigs = {}
    for vid, codes in key.items():
        sigs.setdefault(label[vid], set()).add(
            tuple(codes[s] for s in range(M))
        )
    # each cluster collapses to very few distinct code signatures
    assert all(len(s) <= 2 for s in sigs.values())


def test_adc_recall_stays_in_cluster(spark, clustered):
    df, label = clustered
    top = textops.ann_pq_topk(df, dim=DIM, m=M, k=K).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert set(by_q) == set(range(10))
    for q, neigh in by_q.items():
        in_cluster = sum(1 for n in neigh if label[n] == label[q])
        assert in_cluster >= 4, (q, neigh)


def test_adc_distance_monotone_and_dense_ranks(spark, clustered):
    df, _ = clustered
    rows = textops.ann_pq_topk(df, dim=DIM, m=M, k=K).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.adist))
    for pairs in by_q.values():
        pairs.sort()
        assert [p[0] for p in pairs] == [1, 2, 3, 4, 5]
        dists = [p[1] for p in pairs]
        assert dists == sorted(dists)


def test_plan_broadcast_only_no_cartesian(spark, clustered):
    df, _ = clustered
    plan = (
        textops.ann_pq_topk(df, dim=DIM, m=M, k=K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the ADC scoring join must be a broadcast hash join on (sub, code)
    assert "BroadcastHashJoin" in plan


def test_dim_not_divisible_raises(spark, clustered):
    df, _ = clustered
    with pytest.raises(ValueError):
        textops.pq_codebooks(textops._pq_emb(df), dim=DIM, m=3)


def test_ivfpq_recall_stays_in_cluster(spark, clustered):
    df, label = clustered
    top = textops.ann_ivfpq_topk(
        df, dim=DIM, m=M, k=K, n_centroids=8, n_probe=2
    ).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(10))
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        dists = [r.adist for r in rows]
        assert dists == sorted(dists)
        in_cluster = sum(1 for r in rows if label[r.neighbor_id] == label[q])
        assert in_cluster >= 4, (q, rows)


def test_ivfpq_candidates_only_from_probed_lists(spark, clustered):
    # every returned neighbor carries the list it was scanned from;
    # with n_probe=1 all five neighbors of a query share ONE list
    df, _ = clustered
    top = textops.ann_ivfpq_topk(
        df, dim=DIM, m=M, k=K, n_centroids=8, n_probe=1
    ).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r.query_id, set()).add(r.cid)
    assert all(len(cids) == 1 for cids in by_q.values())


def test_ivfpq_plan_scoring_is_hash_join(spark, clustered):
    df, _ = clustered
    plan = (
        textops.ann_ivfpq_topk(df, dim=DIM, m=M, k=K, n_centroids=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
