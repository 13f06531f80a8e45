"""Connected-components / dedup-cluster operator (graphops.py)."""

from pyspark.sql import functions as F

from dompa_spark import graphops


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a long, doc_b long"
    )


def comps(df):
    return {(r.doc_id, r.component) for r in df.collect()}


def test_disjoint_components(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)])
    got = comps(graphops.connected_components(pairs))
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_long_chain_converges(spark):
    """A 60-node chain has diameter 59 — the loop must run until the
    fixpoint, not stop at some arbitrary iteration cap."""
    n = 60
    pairs = _pairs(spark, [(i, i + 1) for i in range(n - 1)])
    got = comps(graphops.connected_components(pairs))
    assert got == {(i, 0) for i in range(n)}


def test_star_and_direction_independence(spark):
    """Edge direction must not matter (the graph is undirected)."""
    star_out = _pairs(spark, [(5, 1), (5, 2), (5, 3)])
    star_in = _pairs(spark, [(1, 5), (2, 5), (3, 5)])
    want = {(1, 1), (2, 1), (3, 1), (5, 1)}
    assert comps(graphops.connected_components(star_out)) == want
    assert comps(graphops.connected_components(star_in)) == want


def test_dedup_components_canonical_flags(spark):
    pairs = _pairs(spark, [(7, 3), (3, 9), (100, 101)])
    rows = {r.doc_id: r for r in graphops.dedup_components(pairs).collect()}
    assert rows[3].component == 3 and rows[3].is_canonical
    assert rows[7].component == 3 and not rows[7].is_canonical
    assert rows[9].component == 3 and not rows[9].is_canonical
    assert rows[100].is_canonical and not rows[101].is_canonical


def test_components_match_pure_python_union_find(spark):
    """Randomized equivalence against a reference union-find."""
    import random

    rng = random.Random(42)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    verts = {v for e in edges for v in e}
    # canonical representative = min doc_id in the component
    rep = {}
    for v in verts:
        r = find(v)
        rep.setdefault(r, v)
        rep[r] = min(rep[r], v)
    want = {(v, rep[find(v)]) for v in verts}
    got = comps(
        graphops.connected_components(_pairs(spark, edges))
    )
    assert got == want
