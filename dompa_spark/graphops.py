"""Graph operators for dedup clustering.

Near-dup detectors (minhash/simhash/cosine) emit PAIRS; the decision a
training-data pipeline actually consumes is per-document: which cluster
does each doc belong to and which doc is the cluster's canonical
representative. That is connected components over the pair graph.

Implementation: iterative min-label propagation with pointer jumping.
Per iteration each vertex takes min(own label, neighbors' labels) (one
aggregate + two joins), then compresses paths with one label-to-label
join (label(u) <- min(label(u), label(label(u))) — every label is a
vertex id, so the lookup is total). The neighbor step moves information
one hop; the jump step halves every pointer chain — convergence is
O(log diameter) rounds instead of O(diameter), the property that makes
a 10^12-edge run's round count single-digit. All steps are
shuffle-on-key aggregates/joins (AQE-splittable, no windows). Each
iteration ends in localCheckpoint(eager) — truncating lineage is what
keeps the plan from growing with iterations — and a single count()
action reads the convergence flag (driver-side control flow is the
honest shape for an iterative algorithm; the data itself never leaves
the cluster). localCheckpoint trades fault tolerance for speed (executor
loss loses the materialization — the right call in local mode and for
short loops); a multi-hour 10^12-edge run would flip to reliable
`checkpoint()` against the cluster checkpoint dir, same call shape.

Safety argument for the jump step: labels only ever decrease, and every
new label is the id of a vertex already known to be in the same
component (a neighbor's label or a label's label), so the invariant
"label(u) is in u's component" holds throughout; the unique fixpoint
under the neighbor step is label = component minimum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, max_iter: int | None = None
) -> DataFrame:
    """(doc_a, doc_b) pair edges -> (doc_id, component) where component
    is the minimum doc_id reachable in the undirected pair graph.
    Vertices are the docs appearing in at least one pair. Runs until
    convergence (O(diameter) iterations) unless max_iter caps it."""
    # ONE pass over the pair pipeline: the two edge directions come
    # from an explode, not a self-union — a union's branches each
    # evaluate the (expensive: shingle+minhash+verify) pair plan, and
    # operator-internal caches only soften that to ~2x the join work.
    # The localCheckpoint then materializes the symmetric edge list so
    # the O(log d) iterations below never touch the pair plan again.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("src"),
                        F.col("doc_b").alias("dst"),
                    ),
                    F.struct(
                        F.col("doc_b").alias("src"),
                        F.col("doc_a").alias("dst"),
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # non-eager: the first round's convergence count materializes this
    # as part of its own job — an eager checkpoint here would spend a
    # whole extra job launch on a table the next action computes anyway
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=False)
    )
    it = 0
    while max_iter is None or it < max_iter:
        it += 1
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"),
                    F.col("label").alias("dst_label"),
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_label").alias("nbr_label"))
        )
        stepped = labels.join(
            nbr_min.select(F.col("src").alias("doc_id"), "nbr_label"),
            "doc_id",
            "left",
        ).select(
            "doc_id",
            F.col("label").alias("old_label"),
            F.least("label", F.coalesce("nbr_label", "label")).alias(
                "label"
            ),
        )
        # pointer jump: label(u) <- min(label(u), label(label(u)))
        ptr = stepped.select(
            F.col("doc_id").alias("ptr"), F.col("label").alias("ptr_label")
        )
        # non-eager checkpoint + count in ONE action: the count job
        # computes the round AND persists the truncated lineage — the
        # eager form launched a separate materialization job per round,
        # doubling the loop's fixed job-scheduling cost (which, not
        # data volume, dominates the iterative phase: each round moves
        # only (doc_id, label) rows)
        jumped = (
            stepped.join(ptr, stepped["label"] == ptr["ptr"], "left")
            .select(
                "doc_id",
                "old_label",
                F.least(
                    "label", F.coalesce("ptr_label", "label")
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        n_changed = jumped.filter("label < old_label").count()
        labels = jumped.drop("old_label")
        if n_changed == 0:
            break
    return labels.select("doc_id", F.col("label").alias("component"))


def dedup_components(
    pairs: DataFrame, max_iter: int | None = None
) -> DataFrame:
    """Pair edges -> per-doc dedup decision:
    (doc_id, component, is_canonical) — keep the canonical (minimum)
    doc per near-dup cluster, drop the rest."""
    cc = connected_components(pairs, max_iter)
    return cc.select(
        "doc_id",
        "component",
        (F.col("doc_id") == F.col("component")).alias("is_canonical"),
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    scale: int = 10**9,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed (src, dst) edge list in
    EXACT integer arithmetic — the web-frontier prioritization signal
    (which hosts to crawl first, which domains carry authority for
    quality weighting). Reference has no analogue; this serves the
    extraction tier's surrounding crawl pipeline.

    Returns (node, rank_scaled) for every vertex appearing in any edge,
    where rank_scaled is the rank after exactly `n_iter` power
    iterations, fixed-point-scaled by `scale`:

        rank_0(v)     = scale                       (i.e. 1.0 per node)
        share_t(u)    = rank_t(u) div outdeg(u)     (integer division)
        rank_{t+1}(v) = (scale * (100 - damping_pct)) div 100
                        + (damping_pct * sum_{u->v} share_t(u)) div 100

    Every step is BIGINT-exact, so ANY aggregation order — and a SQL
    engine unrolling the same iterations — reproduces the ranks
    bit-identically; a float PageRank's hash would flap with partial
    aggregation order. Ranks are unnormalized (no division by n at the
    end) and dangling-node mass is dropped, the standard simplification
    — both are deterministic and documented rather than approximated.

    Overflow bound: damping_pct * sum(shares into v) must stay under
    2^63. sum(shares) <= indeg(v) * scale, so scale=10^9 is safe to
    ~10^8 in-links on one node; a 10^12-edge crawl graph with true
    supernodes drops `scale` to 10^6 (still 6 significant digits).

    Scale shape: duplicate edges collapse in ONE distinct up front
    (checkpointed — the iterations never touch the raw edge source
    again); outdeg is a partial-aggregatable groupBy on the same
    checkpointed edges. Each iteration is edges ⋈ ranks on src (both
    shuffle on the key; ranks is the slim side and arrives
    hash-partitioned from the previous round's groupBy(dst)) followed
    by a partial-agg sum into dst — a supernode's in-links combine
    map-side, no window sorts anywhere. Non-eager localCheckpoint per
    round keeps the plan flat (the IVF training lesson: a lazily
    nested iterative plan pays O(depth) planning per consumer);
    fault-tolerance trade documented in the module header.
    """
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base = (scale * (100 - damping_pct)) // 100
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(n_iter):
        shares = (
            e.join(outdeg, "src")
            .join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .select(
                "dst", F.expr("rank div outdeg").alias("share")
            )
        )
        contrib = shares.groupBy("dst").agg(F.sum("share").alias("s"))
        ranks = (
            nodes.join(
                contrib.select(F.col("dst").alias("node"), "s"),
                "node",
                "left",
            )
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_pct} * coalesce(s, 0L)) div 100"
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.col("rank").alias("rank_scaled"))


def degree_stats(edges: DataFrame) -> DataFrame:
    """Link-graph degree + reciprocity per node — the frontier-policy
    telemetry next to pagerank: out-degree spikes mark link farms,
    in/out asymmetry marks scraped-content sinks, and RECIPROCAL links
    (A->B and B->A both present) are the classic link-exchange spam
    signal a rank alone hides (a farm ring can hold decent rank).
    Input: (src, dst) edges, duplicates tolerated. Output one row per
    node appearing anywhere: (node, out_deg, in_deg, n_reciprocal) —
    degrees count DISTINCT neighbors (duplicate edges collapse);
    self-loops count in both degrees but never as reciprocal (a
    self-loop trivially 'reciprocates' itself — excluded by contract).

    Scale shape: ONE distinct shuffle on (src, dst) feeds everything —
    out/in degrees are partial-aggregatable counts over the deduped
    edge table, and the reciprocity probe is a self equi-join of that
    same table on the reversed key (hash join on (src,dst) = (dst,src);
    both sides share the distinct's partitioning, so AQE reuses the
    exchange). No windows, no per-node iteration; a 10^8-outlink hub
    costs its tasks' map-side combines plus one reducer row per
    neighbor, the same bound as the distinct itself."""
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).distinct()
    out_deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("out_deg")
    )
    in_deg = e.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").cast("long").alias("in_deg")
    )
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    recip = (
        e.where(F.col("src") != F.col("dst"))
        .join(rev, ["src", "dst"])
        .groupBy(F.col("src").alias("node"))
        .agg(F.count("*").cast("long").alias("n_reciprocal"))
    )
    zero = F.lit(0).cast("long")
    return (
        out_deg.join(in_deg, "node", "full_outer")
        .join(recip, "node", "left")
        .select(
            "node",
            F.coalesce("out_deg", zero).alias("out_deg"),
            F.coalesce("in_deg", zero).alias("in_deg"),
            F.coalesce("n_reciprocal", zero).alias("n_reciprocal"),
        )
    )


def cluster_size_stats(
    components: DataFrame, corpus: DataFrame | None = None
) -> DataFrame:
    """Near-dup cluster-size histogram — the macro dedup telemetry
    next to the per-bucket LSH stats: ONE viral 10^6-doc cluster and
    10^6 pairs are indistinguishable in pair counts, and this is the
    table that tells them apart (what dedup actually deletes is
    sum((size-1)) over clusters). Input: dedup_components output (one
    row per doc that appears in the edge graph). Output one row per
    observed cluster size: (size, n_clusters, n_docs); when `corpus`
    is given, a size=1 row reports the singleton count (docs the pair
    graph never touched) so the histogram partitions the whole corpus.
    The histogram key is strictly unique and never degenerate: the
    singleton row merges (re-aggregated by size) with any size-1
    clusters the components input already holds (possible via
    self-loop edges), and a zero-singleton corpus emits NO size=1
    filler row rather than a (1, 0, 0) artifact.

    Scale shape: two partial-aggregatable groupBys — per-component
    sizes (key space = clusters), then per-size counts (key space =
    distinct sizes, tiny); the singleton row is two 1-row aggregates
    joined via a broadcast (never a real cartesian), and the merge
    re-aggregate runs on the already-tiny histogram. No windows."""
    sizes = components.groupBy("component").agg(
        F.count("*").cast("long").alias("size")
    )
    hist = sizes.groupBy("size").agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("size").cast("long").alias("n_docs"),
    )
    if corpus is None:
        return hist
    tot = corpus.agg(F.count("*").cast("long").alias("t"))
    inc = components.agg(F.count("*").cast("long").alias("c"))
    single = tot.crossJoin(F.broadcast(inc)).select(
        F.lit(1).cast("long").alias("size"),
        (F.col("t") - F.col("c")).alias("n_clusters"),
        (F.col("t") - F.col("c")).alias("n_docs"),
    )
    return (
        hist.unionByName(single)
        .groupBy("size")
        .agg(
            F.sum("n_clusters").cast("long").alias("n_clusters"),
            F.sum("n_docs").cast("long").alias("n_docs"),
        )
        .where(F.col("n_clusters") > 0)
    )
