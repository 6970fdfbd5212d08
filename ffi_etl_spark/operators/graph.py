"""Connected components over an edge list — the cluster step of corpus
deduplication.

Pair detection (operators/dedup.py) yields near-dup EDGES; to actually
deduplicate a corpus you need the transitive clusters ("doc A ~ B,
B ~ C" must collapse to one canonical document even when A ~ C was
never directly found).

Components are computed by alternating large-star/small-star edge
rewrites (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) — each pair of rounds contracts paths roughly
geometrically, so the round count is O(log n) even on chain-shaped
components, where plain min-label propagation needs O(diameter)
rounds. The fixpoint is a star per component centered on its minimum
vertex id, which doubles as the canonical-document id.

This is the engine's one genuinely iterative operator, so it shows the
loop pattern that keeps iteration safe at scale:

  * ``localCheckpoint(eager=True)`` each round — truncates the lineage
    (otherwise plan depth grows linearly and the optimizer revisits
    the whole history every action) and materializes the frontier;
  * convergence is an edge-set-stability probe: equal counts (free on
    the checkpointed frame) plus an ``exceptAll(...).limit(1).count()``
    that short-circuits on the first differing edge;
  * every shuffle in a round is keyed by vertex id, so the work
    distributes with the frontier; per-round ``distinct()`` keeps the
    rewritten edge multiset from ballooning on dense clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Components of the undirected graph given by (src, dst) pairs.

    Returns one row per vertex that appears in any edge:
    ``(vertex, component)`` where ``component`` is the minimum vertex
    id reachable from ``vertex`` — i.e. the cluster's canonical id.
    Vertices with no edges are by definition their own singleton
    component and are not emitted (callers union them in if needed).

    Alternating star rounds (each bounded by vertex-keyed shuffles):

    * **large-star** — per vertex ``u`` over the symmetrized edges, let
      ``m(u) = min(N(u) ∪ {u})``; every LARGER neighbor ``v > u``
      re-links to ``(v, m(u))``. Strictly-larger linking is what makes
      the rewrite a contraction (no two-cycles).
    * **small-star** — orient each edge toward its larger endpoint
      (``u = max``); per ``u``, all smaller neighbors plus ``u`` itself
      link to the smallest, ``(v, m)`` and ``(u, m)``.

    ``stats`` (optional dict) receives ``{"rounds": n}`` — exposed so
    the logarithmic-round contract is testable on crafted path graphs.
    """
    verts = (
        edges.select(F.col(src).alias("vertex"))
        .union(edges.select(F.col(dst).alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    rounds = 0
    stable = False
    prev_count = e.count()
    while rounds < max_iter and prev_count > 0:
        rounds += 1
        # large-star: v > u re-links to u's minimum
        sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(F.least(F.min("b"), F.col("a")).alias("m"))
        large = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star: orient toward the larger endpoint, link the
        # smaller neighborhood (and u itself) to its minimum
        ori = large.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        mins2 = ori.groupBy("u").agg(F.min("v").alias("m"))
        new_e = (
            ori.join(mins2, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(mins2.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_count = new_e.count()
        stable = (
            new_count == prev_count
            and new_e.exceptAll(e).limit(1).count() == 0
        )
        e, prev_count = new_e, new_count
        if stable:
            break

    converged = stable or prev_count == 0
    if not converged:
        # The loop's stability test compares consecutive edge sets, so a
        # run whose LAST permitted round first produced the fixpoint exits
        # with stable=False even though e is a valid star. Check the star
        # structure directly before failing: (a) no vertex has two
        # outgoing edges, (b) no edge target is itself a source (two-level
        # forest). With the b < a orientation every tree root is then its
        # component minimum, and contraction preserves connectivity, so
        # these two properties make the final labeling correct.
        multi_out = (
            e.groupBy("a").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") > 1)
        )
        chained = e.alias("x").join(
            e.alias("y"), F.col("x.b") == F.col("y.a"), "left_semi"
        )
        converged = (
            multi_out.limit(1).count() == 0 and chained.limit(1).count() == 0
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        # the final star-join below assumes one edge per non-root vertex;
        # a non-star edge set would silently emit duplicated / wrong
        # labels, so fail loudly instead (O(log n) contraction means 30
        # rounds covers ~2^30 vertices — hitting this is a bug or an
        # absurdly small max_iter, not a big graph)
        raise RuntimeError(
            f"connected_components did not reach the star fixpoint in "
            f"{max_iter} rounds ({prev_count} edges remain); raise max_iter"
        )

    # fixpoint is a star per component: every non-root vertex carries an
    # edge to the component minimum; roots (and self-loop-only vertices)
    # label themselves
    return verts.join(
        e.withColumnsRenamed({"a": "vertex", "b": "component"}), "vertex", "left"
    ).select(
        "vertex", F.coalesce("component", F.col("vertex")).alias("component")
    )


def triangle_enum(pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b") -> DataFrame:
    """Enumerate triangles in an undirected pair graph (edges given
    once with ``a < b``): rows (v1, v2, v3), v1 < v2 < v3 — the cluster
    -density probe for a near-dup graph (a triangle-rich component is a
    template family, not a chain of borderline matches).

    The a<b edge orientation makes each triangle match exactly one join
    pattern (wedge v1<v2<v3 closed by the (v1,v3) edge), so no
    post-dedup is needed. Orientation by id is the differential-
    testable choice; at 100 TB orient by DEGREE (lower-degree endpoint
    first) instead — id orientation lets one high-id hub vertex own
    O(deg²) wedges, degree orientation provably bounds per-vertex wedge
    work (arboricity bound), same triangles out."""
    e1 = pairs.select(F.col(a_col).alias("v1"), F.col(b_col).alias("v2"))
    e2 = pairs.select(F.col(a_col).alias("v2"), F.col(b_col).alias("v3"))
    e3 = pairs.select(F.col(a_col).alias("v1"), F.col(b_col).alias("v3"))
    return e1.join(e2, "v2").join(e3, ["v1", "v3"]).select("v1", "v2", "v3")


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    undirected: bool = False,
) -> DataFrame:
    """Power-iteration PageRank over an edge list — the second
    iterative operator beside ``connected_components``, sharing its
    loop discipline (``localCheckpoint`` per round to truncate lineage,
    cheapest-possible driver probe for convergence).

    Returns ``(vertex, rank)`` with ranks summing to 1. Dangling
    vertices (no out-edges) redistribute their mass uniformly — the
    standard stochastic-matrix repair — via a 1-row aggregate per
    round (same cost class as the convergence probe). ``undirected``
    symmetrizes the edge list first (near-dup graphs: rank becomes a
    centrality score for template families — high-rank docs sit in
    dense mirror clusters).

    Per round: one join of ranks onto edges (both sides partitioned by
    vertex id; the edge list's partitioning is reused every round
    because the checkpoint pins it), one dst-keyed partial+final agg,
    and ONE driver action — the convergence delta and the NEXT round's
    dangling mass ride the same 1-row aggregate (the old formulation
    collected them separately, doubling driver round-trips for no
    reason at any iteration count). Rows-only gate: iterative
    floating-point accumulation has no SQL oracle; the numpy
    power-iteration differential in
    tests/test_properties.py::test_pagerank_matches_numpy is the
    correctness check.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if undirected:
        sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=True)

    vertices = (
        sym.select(F.col("a").alias("vertex"))
        .union(sym.select(F.col("b").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = vertices.count()
    out_deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    # edges pre-joined with out-degree once: the loop never recomputes it
    contrib_edges = sym.join(out_deg, "a").localCheckpoint(eager=True)

    ranks = vertices.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    # initial dangling mass: every vertex holds 1/n, so it's just the
    # dangling-vertex count scaled — one upfront probe, after which the
    # per-round stats aggregate keeps it current
    dangling = (
        vertices.join(out_deg, vertices["vertex"] == out_deg["a"], "left_anti").count()
        * (1.0 / n)
    )
    for _ in range(max_iter):
        contribs = (
            contrib_edges.join(ranks, contrib_edges["a"] == ranks["vertex"])
            .select(F.col("b").alias("vertex"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("vertex")
            .agg(F.sum("c").alias("c"))
        )
        new_ranks = (
            vertices.join(contribs, "vertex", "left")
            .select(
                "vertex",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta, dangling = (
            ranks.withColumnsRenamed({"rank": "_old"})
            .join(new_ranks, "vertex")
            .join(out_deg, F.col("vertex") == out_deg["a"], "left")
            .agg(
                F.max(F.abs(F.col("rank") - F.col("_old"))).alias("delta"),
                F.coalesce(
                    F.sum(F.when(F.col("deg").isNull(), F.col("rank"))), F.lit(0.0)
                ).alias("dangling"),
            )
            .collect()[0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks


def label_propagation(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the undirected (src, dst) graph — the third graph
    operator beside ``connected_components`` (which merges everything
    reachable) and ``pagerank`` (which ranks within): LP splits a
    connected near-dup graph into densely-linked template FAMILIES,
    the granularity at which a curation team samples representatives.

    Determinism (vanilla LP is run-order-dependent): updates are
    synchronous, the new label is the most frequent neighbor label with
    ties broken toward the SMALLEST label, and iteration stops at the
    fixpoint or ``max_iter`` (synchronous LP can 2-cycle on bipartite
    structures; the cap is the standard remedy). Same loop discipline
    as the other iterative operators: localCheckpoint per round, ONE
    1-row driver action (changed-label count) per round.

    Per round: one join of labels onto the symmetrized edges (vertex
    keyed), one (vertex, label) count aggregate, one per-vertex
    arg-max window — all shuffles share the vertex key. Returns
    ``(vertex, community)``.
    """
    from pyspark.sql import Window

    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("label", F.col("vertex"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("a").orderBy(F.col("cnt").desc(), F.col("label"))
    for _ in range(max_iter):
        nbr_labels = sym.join(
            labels, sym["b"] == labels["vertex"]
        ).select("a", "label")
        counted = nbr_labels.groupBy("a", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        new_labels = (
            counted.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("a").alias("vertex"), "label")
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.withColumnsRenamed({"label": "_old"})
            .join(new_labels, "vertex")
            .filter(F.col("label") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.withColumnsRenamed({"label": "community"})
