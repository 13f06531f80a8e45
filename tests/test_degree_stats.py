"""graphops.degree_stats: distinct-neighbor degrees + the reciprocity
spam signal, against a hand-computed graph."""

import pytest

from dompa_spark import graphops


def _stats(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = graphops.degree_stats(df)
    return {r["node"]: r.asDict() for r in out.collect()}


def test_degrees_reciprocity_hand_graph(spark):
    # 1->2, 2->1 (reciprocal pair); 1->3 (one-way); 3->3 (self-loop);
    # 1->2 duplicated (must collapse); 4 appears only as a source.
    st = _stats(
        spark,
        [(1, 2), (2, 1), (1, 3), (3, 3), (1, 2), (4, 1)],
    )
    assert st[1] == {
        "node": 1, "out_deg": 2, "in_deg": 2, "n_reciprocal": 1,
    }
    assert st[2] == {
        "node": 2, "out_deg": 1, "in_deg": 1, "n_reciprocal": 1,
    }
    # self-loop counts in both degrees but never as reciprocal
    assert st[3] == {
        "node": 3, "out_deg": 1, "in_deg": 2, "n_reciprocal": 0,
    }
    # pure source: in_deg 0 row still present
    assert st[4] == {
        "node": 4, "out_deg": 1, "in_deg": 0, "n_reciprocal": 0,
    }


def test_pure_sink_node_present(spark):
    st = _stats(spark, [(1, 2)])
    assert st[2] == {
        "node": 2, "out_deg": 0, "in_deg": 1, "n_reciprocal": 0,
    }


def test_link_farm_ring_fully_reciprocal(spark):
    # a 3-ring with both directions everywhere: every node reciprocates
    # with both neighbors — the link-exchange signature.
    ring = [(a, b) for a in range(3) for b in range(3) if a != b]
    st = _stats(spark, ring)
    for n in range(3):
        assert st[n]["n_reciprocal"] == 2
        assert st[n]["out_deg"] == 2
        assert st[n]["in_deg"] == 2


def test_cluster_size_stats_hand_graph(spark):
    """Histogram partitions the corpus: a 3-cluster + a 2-cluster +
    two singletons."""
    from pyspark.sql import functions as F

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)],
        "doc_id long, component long",
    )
    corpus = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long"
    )
    out = {r["size"]: r for r in graphops.cluster_size_stats(
        comps, corpus=corpus).collect()}
    assert out[3]["n_clusters"] == 1 and out[3]["n_docs"] == 3
    assert out[2]["n_clusters"] == 1 and out[2]["n_docs"] == 2
    assert out[1]["n_clusters"] == 2 and out[1]["n_docs"] == 2
    assert sum(r["n_docs"] for r in out.values()) == 7


def test_cluster_size_stats_no_singletons_no_filler_row(spark):
    """A corpus fully covered by clusters emits NO degenerate
    (size=1, 0, 0) row."""
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)],
        "doc_id long, component long",
    )
    corpus = spark.createDataFrame(
        [(i,) for i in range(1, 5)], "doc_id long"
    )
    out = graphops.cluster_size_stats(comps, corpus=corpus).collect()
    assert len(out) == 1
    assert (out[0]["size"], out[0]["n_clusters"],
            out[0]["n_docs"]) == (2, 2, 4)


def test_cluster_size_stats_merges_size1_components(spark):
    """Size-1 clusters already in the components input (self-loop
    edges) merge with the singleton count into ONE size=1 row — the
    histogram key stays unique."""
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5)],  # one pair + one self-loop island
        "doc_id long, component long",
    )
    corpus = spark.createDataFrame(
        [(i,) for i in range(1, 5)], "doc_id long"
    )
    out = {r["size"]: r for r in graphops.cluster_size_stats(
        comps, corpus=corpus).collect()}
    assert len(out) == 2
    # 1 self-loop island + (4 corpus - 3 in graph) = 2 size-1 rows
    assert out[1]["n_clusters"] == 2 and out[1]["n_docs"] == 2
    assert out[2]["n_clusters"] == 1 and out[2]["n_docs"] == 2


def test_cluster_size_stats_without_corpus_no_singleton_row(spark):
    comps = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, component long"
    )
    out = graphops.cluster_size_stats(comps).collect()
    assert len(out) == 1 and out[0]["size"] == 2
