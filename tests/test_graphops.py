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


# ---------------------------------------------------------------------------
# pagerank (exact integer fixed-point)
# ---------------------------------------------------------------------------

def _py_pagerank(edges, n_iter=3, scale=10**9, damping_pct=85):
    """Reference implementation: same integer recurrence, plain dicts."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    outdeg = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    base = (scale * (100 - damping_pct)) // 100
    rank = {v: scale for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0 for v in nodes}
        for u, v in e:
            contrib[v] += rank[u] // outdeg[u]
        rank = {v: base + (damping_pct * contrib[v]) // 100 for v in nodes}
    return rank


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )


def test_pagerank_hand_computed_two_node_cycle(spark):
    """1 <-> 2: by symmetry both ranks stay exactly `scale` forever
    (share = rank, contrib = rank, 0.15 + 0.85*1.0 = 1.0 in exact
    fixed point: 150000000 + 85*10^9 div 100 == 10^9)."""
    got = {
        r.node: r.rank_scaled
        for r in graphops.pagerank(_edges_df(spark, [(1, 2), (2, 1)])).collect()
    }
    assert got == {1: 10**9, 2: 10**9}


def test_pagerank_sink_collects_mass(spark):
    """Star into a sink: 3 sources -> 1 sink. After one iteration the
    sink holds base + 0.85*3.0, the sources (no in-links) hold base.
    Dangling mass (the sink has no outlinks) is dropped, so iteration 2
    gives the sources base again and the sink base + 0.85*(3*base)."""
    edges = [(1, 9), (2, 9), (3, 9)]
    got = {
        r.node: r.rank_scaled
        for r in graphops.pagerank(_edges_df(spark, edges), n_iter=2).collect()
    }
    assert got == _py_pagerank(edges, n_iter=2)
    base = 150_000_000
    assert got[1] == got[2] == got[3] == base
    assert got[9] == base + (85 * 3 * base) // 100


def test_pagerank_matches_python_reference_random_graph(spark):
    """Randomized differential test incl. duplicate edges (must
    collapse to one), self-loops, and dangling nodes."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(150)]
    edges += edges[:20]  # duplicates
    got = {
        r.node: r.rank_scaled
        for r in graphops.pagerank(
            _edges_df(spark, edges), n_iter=4
        ).collect()
    }
    assert got == _py_pagerank(edges, n_iter=4)


def test_pagerank_integer_exactness_no_drift(spark):
    """Chain graph ranks must be bit-identical to the reference after
    many iterations — the float form would accumulate rounding drift
    dependent on aggregation order; the integer form cannot."""
    edges = [(i, i + 1) for i in range(12)] + [(12, 0)]
    got = {
        r.node: r.rank_scaled
        for r in graphops.pagerank(
            _edges_df(spark, edges), n_iter=8
        ).collect()
    }
    assert got == _py_pagerank(edges, n_iter=8)
