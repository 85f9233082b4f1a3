"""Graph analytics on plain (src, dst) edge frames.

The engine's graph surface is deliberately DataFrame-native (no
GraphX/GraphFrames dependency — neither ships in this runtime): a
graph is a node frame plus an edge frame, and each algorithm is the
Pregel-on-DataFrame loop — per round, one src-keyed join of state
onto the edge list and one dst-keyed hash-aggregation, with
persist/materialize/unpersist per round capping lineage growth (the
discipline ``connected_components`` and the BPE learner established).

Fixed-point arithmetic throughout: scores are int64 at a caller-chosen
scale and every contribution is a floor division, so two runs — or
two ENGINES (see the unrolled SQL oracle of
``doc_pagerank_fixedpoint``) — produce bit-identical scores. Float
PageRank sums would depend on aggregation order; integer sums don't.

Reference parity: the reference engine has no graph operators (its
pipelines stop at relational recon, ``reporting_utils.py``); this
module is part of the training-data extension surface (link-graph
quality weighting a web-corpus curation pipeline needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import with_coalesced_cached_rounds

# Peel/h-index waves chained per persist+action materialization in
# k_core and coreness (r14 optimization, guide §1.2: the per-step
# persist + scalar action + AQE barriers dominate wall clock on small
# per-round frames, so fewer materializations with deeper
# single-reference chains win until codegen/analysis depth bites —
# 3 measured best on the registered link graph; 2 was the r13 value).
# The convergence tests stay EXACT at step granularity for ANY depth:
# both loops' measures (edge count / estimate sum) are monotone
# non-increasing per inner wave, so "unchanged across a step" still
# means every inner wave was a no-op, i.e. the fixed point; at worst
# _WAVES_PER_STEP - 1 redundant waves run after convergence.
# max_iter contract (unchanged in kind from the r13 double-step): the
# loop runs ceil(max_iter/_WAVES_PER_STEP) steps, so up to
# _WAVES_PER_STEP - 1 extra waves may execute before the bound
# raises — a safety valve, not an exact budget; estimates/edge sets
# only shrink, so extra waves only land closer to the fixed point.
_WAVES_PER_STEP = 3

__all__ = [
    "neighborhood_growth",
    "pagerank_fixedpoint",
    "connected_components",
    "star_connected_components",
    "pointer_jump_components",
    "triangle_count",
    "k_core",
    "coreness",
]

# Pointer-jump rounds chained per persist+action materialization in
# pointer_jump_components (r15, guide §1.2 — same cadence trick as
# _WAVES_PER_STEP below: per-step persist + scalar action + AQE
# barriers dominate on small per-round frames, and every round
# references its input exactly once, so a chained pair is a depth-2
# single-reference plan with linear Catalyst analysis). Convergence
# stays exact at step granularity: labels are non-increasing per node,
# so "sum unchanged across a step" still means both inner rounds were
# no-ops, i.e. the fixed point; at worst one redundant (cheap,
# label-sized) round runs after convergence.
_JUMPS_PER_STEP = 2


@with_coalesced_cached_rounds
def pagerank_fixedpoint(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    iters: int = 5,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
    seed_nodes: DataFrame | None = None,
) -> DataFrame:
    """Power-iteration PageRank in int64 fixed-point.

    ``nodes``: one column ``node``. ``edges``: columns ``src``,
    ``dst`` (deduplicated here; self-loops allowed). Every node
    starts at ``scale``; each round a node keeps
    ``scale * (damp_den - damp_num) // damp_den`` as base mass and
    receives ``damp_num/damp_den`` of its in-neighbors'
    ``score // outdeg`` contributions (floor divisions — the
    bit-stability contract). Dangling-node mass is dropped, the
    simplified formulation, identically on any engine that mirrors
    the arithmetic.

    Scale shape: O(edges) per round — one join, one hash-agg — times
    a fixed ``iters``; no driver-side data movement (only the loop
    counter lives on the driver). Because the iteration count is
    FIXED and each round references the previous scores exactly once,
    the rounds compose into ONE lazily-built linear plan executed as
    a single job at the end (r12: the per-round persist+count
    barriers added ~5 scheduling round-trips per run and ~0.5 s at
    sf0.1 without bounding anything — a fixed-depth single-reference
    chain needs no materialization; convergence-driven loops like
    ``coreness`` still materialize per round because each round's
    ACTION is the stopping test). The returned frame is the final
    scores persisted and materialized once; the caller owns its
    lifetime.

    ``seed_nodes`` (one column ``node``) switches to PERSONALIZED
    PageRank: initial mass and the per-round restart base go ONLY to
    the seed set (non-seeds start at 0 and receive no base), so the
    stationary mass measures proximity to the seeds — the
    seed-expansion signal for growing a curated corpus from a
    hand-picked nucleus. Same fixed-point arithmetic, same plan
    shape; the seed roster joins in as a left-semi-derived indicator
    (one extra bounded hash join per round input build).
    """
    base = (scale * (damp_den - damp_num)) // damp_den
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_deg = e.join(deg, "src").persist()
    edges_deg.count()
    if seed_nodes is None:
        marked = nodes.select("node").withColumn("_s", F.lit(True))
    else:
        seeds = seed_nodes.select("node").distinct()
        marked = (
            nodes.select("node")
            .join(
                seeds.withColumn("_s", F.lit(True)), "node", "left"
            )
            .select(
                "node", F.coalesce("_s", F.lit(False)).alias("_s")
            )
        )
    zero64 = F.lit(0).cast("bigint")
    base_col = F.when(
        F.col("_s"), F.lit(base).cast("bigint")
    ).otherwise(zero64)
    scores = marked.select(
        "node",
        F.when(F.col("_s"), F.lit(scale).cast("bigint"))
        .otherwise(zero64)
        .alias("score"),
    )
    try:
        for _ in range(iters):
            contrib = (
                edges_deg.join(scores, edges_deg["src"] == scores["node"])
                .select("dst", F.expr("score div outdeg").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
            scores = (
                marked
                .join(contrib, F.col("node") == F.col("dst"), "left")
                .select(
                    "node",
                    "_s",
                    (
                        base_col
                        + F.expr(
                            f"{damp_num} * coalesce(s, 0)"
                            f" div {damp_den}"
                        )
                    )
                    .cast("bigint")
                    .alias("score"),
                )
            )
        scores = scores.select("node", "score").persist()
        scores.count()
        return scores
    finally:
        edges_deg.unpersist()


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
    algo: str = "star",
) -> DataFrame:
    """Weakly connected components: every node labeled with the
    smallest node id reachable over the (undirected) edge set.
    Returns ``(node_col, component)``; singletons keep their own id.

    Implementation (upgraded round 11, second batch): the default
    delegate is ``star_connected_components`` below — alternating
    large-star / small-star contraction, O(log n) rounds — after the
    entity-resolution edit graph at sf0.1 exposed the prior
    smallest-label-propagation delegate as a rounds-=-diameter
    latent scale-killer (diameter 50 there; unbounded on a web
    graph). ``algo="pointer_jump"`` selects
    ``pointer_jump_components`` instead (integral ids only) — the
    FastSV-style hooking/doubling loop whose rounds shuffle
    label-sized frames instead of the edge multiset. The r15
    same-session A/B (min-of-5, sf0.1): on the diameter-50 ER edit
    graph star wins (4.20 vs 5.23 s — every catalog graph is SPARSE,
    m ≈ |V|, so pointer-jump's smaller per-round shuffle volume buys
    nothing and its extra per-round stages cost); on the shallow
    doc-link chain graph pointer-jump wins (2.28 vs 2.66 s — fewer,
    cheaper rounds at diameter ≤ 7). Callers pick by measurement;
    label SEMANTICS are identical across all delegates (component =
    smallest reachable id; oracle hashes unchanged, equivalence
    pinned by test_r15_optimizations). ``max_iter`` bounds
    contraction/jump rounds (logarithmic), not diameter. The dedup
    module keeps its own NULL-tolerant min-label loop for the shallow
    near-dup clusters it was built for (``operators/dedup.py``).
    """
    if algo == "pointer_jump":
        return pointer_jump_components(
            nodes,
            edges,
            node_col=node_col,
            src_col=src_col,
            dst_col=dst_col,
            max_iter=max_iter,
        )
    if algo != "star":
        raise ValueError(f"unknown algo {algo!r}")
    return star_connected_components(
        nodes,
        edges,
        node_col=node_col,
        src_col=src_col,
        dst_col=dst_col,
        max_iter=max_iter,
    )


def triangle_count(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact per-node triangle participation counts over an
    undirected graph. Returns ``(node_col, n_triangles bigint)`` —
    one row per input node, zero for triangle-free nodes.

    Algorithm (round 11): the DEGREE-ORDERED orientation — the
    standard exact triangle algorithm that scales. Canonicalize the
    edge set (undirected, deduplicated, self-loops dropped), then
    orient every edge from its lower endpoint under the total order
    ``(degree, id)``. Each triangle now has exactly one vertex with
    two OUT-edges — its lowest-order corner — so enumerating wedges
    ``(a→b, a→c)`` with ``(deg_b, b) < (deg_c, c)`` and semi-joining
    the closing edge ``b→c`` against the oriented set counts every
    triangle exactly once, with no post-hoc deduplication.

    Why this is the 100 TB shape: wedge generation is
    Σ_a C(outdeg(a), 2), and degree-ordering bounds every out-degree
    by O(√m) on any graph (a node keeps only edges to HIGHER-ordered
    neighbors, and fewer than √m nodes can have degree above √m) —
    the naive orientation-by-id explodes on one high-degree hub,
    this one cannot. Total work is O(m^1.5) worst case, the known
    lower bound for exact listing. Plan: two hash-aggs (degrees,
    per-node counts), the self-join co-located on the wedge apex
    ``a``, and one ``left_semi`` shuffled on the closing pair — no
    window, no driver-side graph, no all-pairs anything. The
    oriented edge set is persisted for its two consumers (wedge
    build + closing probe) and released before return.

    Reference parity: the reference engine has no graph operators
    (its pipelines stop at relational recon, ``reporting_utils.py``);
    this completes the graph surface beside ``pagerank_fixedpoint``
    and ``connected_components`` — triangle density is the standard
    link-spam / community-structure signal a web-corpus curation
    pipeline weighs alongside PageRank.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    with_deg = e.join(
        deg.select(F.col("x").alias("u"), F.col("d").alias("du")), "u"
    ).join(
        deg.select(F.col("x").alias("v"), F.col("d").alias("dv")), "v"
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).persist()
    oriented.count()
    try:
        e1 = oriented.select(
            F.col("a"), F.col("b"), F.col("db")
        )
        e2 = oriented.select(
            F.col("a"), F.col("b").alias("c"), F.col("db").alias("dc")
        )
        wedges = e1.join(e2, "a").where(
            (F.col("db") < F.col("dc"))
            | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
        )
        tri = wedges.join(
            oriented.select(
                F.col("a").alias("b"), F.col("b").alias("c")
            ),
            ["b", "c"],
            "left_semi",
        )
        roles = (
            tri.select(F.col("a").alias(node_col))
            .unionAll(tri.select(F.col("b").alias(node_col)))
            .unionAll(tri.select(F.col("c").alias(node_col)))
        )
        counts = roles.groupBy(node_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_triangles")
        )
        out = (
            nodes.select(node_col)
            .join(counts, node_col, "left")
            .select(
                node_col,
                F.coalesce(
                    F.col("n_triangles"), F.lit(0).cast("bigint")
                ).alias("n_triangles"),
            )
        )
        out = out.persist()
        out.count()
        return out
    finally:
        oriented.unpersist()


@with_coalesced_cached_rounds
def star_connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 60,
) -> DataFrame:
    """Weakly connected components by ALTERNATING STAR CONTRACTION
    (the large-star / small-star algorithm of Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — converges in
    O(log n) rounds instead of the O(diameter) rounds smallest-label
    propagation needs. Returns ``(node_col, component)`` with
    component = smallest node id in the component; singletons keep
    their own id. Node ids must be non-NULL and totally ordered
    (ints/strings).

    Why this exists (round 11): the entity-resolution edit graph at
    sf0.1 has diameter 50 — min-label propagation needs 50+ rounds
    (each with a persist/materialize barrier), while star contraction
    closes it in ~10. At 100 TB a web-graph component's effective
    diameter is unbounded; a rounds-=-diameter loop is a latent
    scale-killer, a log-rounds loop is not.

    Each round references the previous round's persisted frame a
    CONSTANT number of times, so the logical plan grows LINEARLY
    (the dedup-loop lesson: persist caches execution, but Catalyst
    re-analyzes the whole tree — a per-round self-union doubles it
    and 2^rounds analysis eats the driver). Symmetrization and the
    two-sided small-star emit are EXPLODE of a 2-struct array — one
    reference each, no self-union — and the per-u neighborhood
    minimum is a window over the high-cardinality node key, not a
    groupBy+join back:

    - large-star(u): every neighbor v > u re-attaches to
      m = min(Γ(u) ∪ {u}) — long tails fold onto local minima.
    - small-star(u): u and its smaller neighbors re-attach to
      min(Γ⁻(u) ∪ {u}) — stars re-center on the true minimum.

    Convergence = the canonical edge set is the fixed point of both
    ops, checked exactly (carried equal counts gate a one-sided
    left_anti emptiness probe — multiset equality over distinct
    sets, and the expensive job runs only once counts agree); at the fixed
    point every edge is a star spoke (component-min, member) and
    labels read directly off it. Per-round persist/materialize/
    unpersist; raises after ``max_iter`` rounds rather than
    returning half-merged components (60 ≫ log₂ of any conceivable
    node count). Per-round work is O(edges); the edge count never
    exceeds the input's (large-star emits one edge per undirected
    edge; small-star one per edge plus one per star center, minus
    the self-spokes both drop).
    """
    from pyspark.sql.window import Window

    n = nodes.select(F.col(node_col).alias("_n"))
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    canon.count()

    def _sym(df: DataFrame) -> DataFrame:
        # both directions from ONE reference (explode, not union)
        return df.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("a").alias("u"), F.col("b").alias("v")
                    ),
                    F.struct(
                        F.col("b").alias("u"), F.col("a").alias("v")
                    ),
                )
            ).alias("e")
        ).select("e.u", "e.v")

    w_u = Window.partitionBy("u")
    prev = canon
    n_prev = canon.count()
    try:
        for _ in range(max_iter):
            # large-star: one single-reference chain over prev
            sym = _sym(prev).withColumn(
                "m", F.least(F.min("v").over(w_u), F.col("u"))
            )
            # large-star output is deliberately NOT distinct-ified
            # (r14 optimization, guide §2.4): each directed row with
            # v > u emits exactly ONE edge, so the multiset is never
            # larger than the input edge set — no explosion is
            # possible — and small-star is duplicate-insensitive (its
            # window min and per-row emit are unchanged by copies;
            # its own trailing distinct restores the set). Dropping
            # the intermediate distinct removes one Exchange from
            # every contraction round.
            large = (
                sym.where(F.col("v") > F.col("u"))
                .select(
                    F.least("v", "m").alias("a"),
                    F.greatest("v", "m").alias("b"),
                )
                .where(F.col("a") != F.col("b"))
            )
            # small-star: one single-reference chain over large
            sm = (
                _sym(large)
                .where(F.col("v") < F.col("u"))
                .withColumn("m", F.min("v").over(w_u))
            )
            small = (
                sm.select(
                    F.explode(
                        F.array(
                            F.struct(
                                F.col("v").alias("x"),
                                F.col("m").alias("y"),
                            ),
                            F.struct(
                                F.col("u").alias("x"),
                                F.col("m").alias("y"),
                            ),
                        )
                    ).alias("e")
                )
                .select("e.x", "e.y")
                .where(F.col("x") != F.col("y"))
                .select(
                    F.least("x", "y").alias("a"),
                    F.greatest("x", "y").alias("b"),
                )
                .distinct()
                .persist()
            )
            n_small = small.count()
            # equal counts is carried from the last materialization
            # (no recount job); the set-equality proof (left_anti on
            # distinct sets + equal counts => multiset equality) runs
            # ONLY when counts already match — near convergence, the
            # cheap signal gates the expensive one
            converged = n_small == n_prev and (
                small.join(prev, ["a", "b"], "left_anti")
                .limit(1)
                .count()
                == 0
            )
            if prev is not canon:
                prev.unpersist()
            prev = small
            n_prev = n_small
            if converged:
                break
        else:
            raise RuntimeError(
                f"star_connected_components did not converge in "
                f"{max_iter} rounds"
            )
        # fixed point: edges are stars (component-min, member)
        labels = prev.select(
            F.col("b").alias("_n"), F.col("a").alias("component")
        )
        out = (
            n.join(labels, "_n", "left")
            .select(
                F.col("_n").alias(node_col),
                F.coalesce("component", F.col("_n")).alias(
                    "component"
                ),
            )
        )
        out = out.persist()
        out.count()
        return out
    finally:
        if prev is not canon:
            prev.unpersist()
        canon.unpersist()


@with_coalesced_cached_rounds
def pointer_jump_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 60,
) -> DataFrame:
    """Weakly connected components by HOOKING + POINTER DOUBLING — the
    Shiloach–Vishkin family as simplified by FastSV (Zhang, Azad,
    Buluç, "FastSV: A Distributed-Memory Connected Component
    Algorithm with Fast Convergence", 2020): every node keeps a label
    ``f`` (initially the minimum over its closed neighborhood) and
    each round lowers it to

        f'(x) = min( min_{y ∈ Γ(x) ∪ {x}} f(f(y)),      # hooking on
                                                        # grandparents;
                                                        # y = x is the
                                                        # shortcut
                     min_{u : f(u) = x} min_{y ∈ Γ+(u)} f(f(y)) )
                                                        # stochastic
                                                        # hooking onto
                                                        # the parent

    Labels are non-increasing, never leave the component, and the
    fixed point is exactly "every node labeled with its component's
    minimum id" (stars + label equality across every edge), i.e. the
    same output contract as ``star_connected_components``; singletons
    keep their own id. Requires integral non-NULL node ids (the exact
    decimal label-sum is the convergence test); ``connected_components``
    routes string ids to the star-contraction twin instead.

    Why this replaces star contraction on the hot paths (r15, guide
    §2.2/§2.4): star contraction re-shuffles the whole EDGE multiset
    three times per round (two windows + a distinct). Here the edge
    frame is canonicalized, exploded to directed rows with one SELF
    row per node, hash-partitioned on the probe key and persisted
    ONCE — every round then shuffles only label-sized frames (|V|
    rows): one explode+window to evaluate f∘f with a single reference
    to the evolving frame (ask rows keyed f(v) meet the value row
    keyed v — the star-contraction explode trick, so the logical plan
    grows LINEARLY per round instead of 2^rounds, the round-11
    lineage law), one join against the static directed frame whose
    cached exchange is reused, and two hash-aggs whose map-side
    partial aggregation collapses the edge-sized join output to
    label-sized exchanges. Round count is O(log n) — pointer doubling
    covers distance ~2^r and stochastic hooking writes a newly found
    minimum straight onto a star root (without it, an adversarial id
    layout degrades to O(diameter) label crawling).

    Convergence is ONE scalar action per step (labels non-increasing
    ⟹ the exact DECIMAL(38,0) label sum strictly decreases until the
    fixed point), doubling as the step's persist materialization;
    ``_JUMPS_PER_STEP`` rounds chain per step (header note). Raises
    after ``max_iter`` rounds rather than returning half-merged
    components."""
    from pyspark.sql.window import Window

    n = nodes.select(F.col(node_col).alias("_n"))
    id_type = dict(n.dtypes)["_n"]
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            "pointer_jump_components needs integral node ids for the "
            f"exact label-sum convergence test; got {id_type}. Use "
            "star_connected_components for string ids."
        )
    canon = edges.select(
        F.least(F.col(src_col), F.col(dst_col)).alias("a"),
        F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
    ).where(F.col("a") != F.col("b")).distinct()
    directed = canon.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("x"), F.col("b").alias("y")),
                F.struct(F.col("b").alias("x"), F.col("a").alias("y")),
            )
        ).alias("r")
    ).select("r.x", "r.y")
    # one SELF row per edged node: the round's single label join then
    # delivers own-grandparent (the shortcut) and neighbor-grandparents
    # together, and the self row doubles as the f(x) carrier for the
    # stochastic-hooking emit. Persisted HASH-PARTITIONED ON THE JOIN
    # KEY so every round's join reuses the cached exchange and only
    # the label-sized frame moves (the coreness layout).
    directed_all = (
        directed.unionByName(
            directed.select("x").distinct().withColumn("y", F.col("x"))
        )
        .repartition(F.col("y"))
        .persist()
    )
    directed_all.count()

    w_k = Window.partitionBy("_k")
    null_id = F.lit(None).cast(id_type)

    def one_jump(lbl: DataFrame) -> DataFrame:
        # f∘f with ONE reference to lbl: each state row (v, f) emits
        # an ASK row keyed f (asker = v) and a VALUE row keyed v
        # (val = f); the per-key window max (exactly one non-NULL
        # value row per key, keys are node ids with state rows)
        # hands every asker g = f(f(v)), plus its own f for the
        # stochastic emit below.
        sym = lbl.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("f").alias("_k"),
                        F.col("v").alias("_asker"),
                        null_id.alias("_val"),
                    ),
                    F.struct(
                        F.col("v").alias("_k"),
                        null_id.alias("_asker"),
                        F.col("f").alias("_val"),
                    ),
                )
            ).alias("e")
        ).select("e._k", "e._asker", "e._val")
        g = (
            sym.withColumn("_g", F.max("_val").over(w_k))
            .where(F.col("_asker").isNotNull())
            .select(
                F.col("_asker").alias("_v"),
                F.col("_k").alias("_f"),
                "_g",
            )
        )
        # per node x: m1 = min grandparent over the closed
        # neighborhood (covers hooking AND the shortcut; the keep
        # term is redundant because g(x) <= f(x)), and fx = f(x)
        # recovered from the self row. Stochastic hooking re-emits
        # m1 keyed at the parent fx; the second agg folds both
        # candidate streams.
        agg1 = (
            directed_all.join(g, directed_all["y"] == g["_v"])
            .groupBy("x")
            .agg(
                F.min("_g").alias("_m1"),
                F.max(
                    F.when(F.col("x") == F.col("y"), F.col("_f"))
                ).alias("_fx"),
            )
        )
        return (
            agg1.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("x").alias("_c"),
                            F.col("_m1").alias("_cand"),
                        ),
                        F.struct(
                            F.col("_fx").alias("_c"),
                            F.col("_m1").alias("_cand"),
                        ),
                    )
                ).alias("e")
            )
            .select("e._c", "e._cand")
            .groupBy("_c")
            .agg(F.min("_cand").alias("f"))
            .select(F.col("_c").alias("v"), "f")
        )

    est = (
        directed_all.groupBy("x")
        .agg(F.min("y").alias("f"))
        .select(F.col("x").alias("v"), "f")
        .persist()
    )
    prev_sum = est.agg(
        F.sum(F.col("f").cast("decimal(38,0)"))
    ).collect()[0][0]
    try:
        for _ in range(max(1, -(-max_iter // _JUMPS_PER_STEP))):
            chained = est
            for _j in range(_JUMPS_PER_STEP):
                chained = one_jump(chained)
            nxt = chained.persist()
            cur_sum = nxt.agg(
                F.sum(F.col("f").cast("decimal(38,0)"))
            ).collect()[0][0]
            est.unpersist()
            est = nxt
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        else:
            raise RuntimeError(
                f"pointer_jump_components did not converge in "
                f"{max_iter} rounds"
            )
        out = (
            n.join(
                est.select(
                    F.col("v").alias("_n"), F.col("f").alias("component")
                ),
                "_n",
                "left",
            )
            .select(
                F.col("_n").alias(node_col),
                F.coalesce("component", F.col("_n")).alias("component"),
            )
        )
        out = out.persist()
        out.count()
        return out
    finally:
        est.unpersist()
        directed_all.unpersist()


@with_coalesced_cached_rounds
def k_core(
    nodes: DataFrame,
    edges: DataFrame,
    k: int,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """Membership of the k-CORE — the maximal subgraph in which every
    node has degree ≥ k — by iterative peeling: repeatedly delete
    nodes whose CURRENT degree is below k until none remain (the
    deletions cascade, which is the whole point — a node can be
    k-degreed in the input yet fall out once its support peels away).
    Returns ``(node_col, in_core boolean)`` for every input node.

    Per round: ONE single-reference chain over the surviving edge
    list (explode to directed rows, per-endpoint degree via a window
    over the node key, regroup to canonical edges keeping those whose
    smaller endpoint-degree is still ≥ k) — O(edges) work, the edge
    list only ever shrinks, and the Catalyst-analyzed plan grows
    LINEARLY with wave count (the star-contraction lesson: a wave
    that references the previous frame three times re-analyzes a
    3^waves tree). Convergence is a carried
    edge count (strictly decreasing until the fixed point, so count
    equality IS the proof here — unlike star contraction, a peel
    round that removes nothing changes nothing). Round count = peel
    DEPTH of the graph (how many cascade waves), which is the known
    cost of exact k-core: bounded by the longest chain of
    dependent deletions, NOT the diameter — for the registered
    link-graph query it is ≤ the id-bucket width. A pathological
    path graph peels O(n/2) waves at k=2+; for such graphs at 100 TB
    use the (approximate) truss/degeneracy sketches instead — this
    operator is the exact reference.

    Reference parity: no graph operators in the reference engine;
    completes the graph module beside PageRank / WCC / triangles —
    core number is the standard spam-farm / boilerplate-hub signal
    (link farms are high-core, organic link tails are 1-core).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    n_prev = e.count()
    prev = e
    from pyspark.sql.window import Window

    w_x = Window.partitionBy("x")

    def _directed(df: DataFrame) -> DataFrame:
        # both directions from ONE reference (explode, not union)
        return df.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("a").alias("x"), F.col("b").alias("y")
                    ),
                    F.struct(
                        F.col("b").alias("x"), F.col("a").alias("y")
                    ),
                )
            ).alias("r")
        ).select("r.x", "r.y")

    def one_wave(df: DataFrame) -> DataFrame:
        # edge survives iff BOTH endpoint degrees are >= k: min of
        # the degree over the edge's two directed rows
        return (
            _directed(df)
            .withColumn("d", F.count(F.lit(1)).over(w_x))
            .groupBy(
                F.least("x", "y").alias("a"),
                F.greatest("x", "y").alias("b"),
            )
            .agg(F.min("d").alias("md"))
            .where(F.col("md") >= k)
            .select("a", "b")
        )

    # TWO peel waves per materialization (the coreness r13 trick).
    # max_iter contract: the loop runs ceil(max_iter/2) double
    # steps, so an ODD max_iter admits at most one extra wave
    # (max_iter+1 total) before raising — the bound is a safety
    # valve, not an exact budget, and estimates only shrink, so the
    # extra wave can only land closer to the fixed point:
    # each wave references its input once, so the chained pair is a
    # depth-2 single-reference plan — analysis stays linear — while
    # the per-step persist + count + AQE barriers halve. The count
    # test stays exact at step granularity: the edge list only
    # shrinks, so an unchanged count across a double step means both
    # inner waves removed nothing (at worst one redundant wave runs).
    try:
        for _ in range(max(1, -(-max_iter // _WAVES_PER_STEP))):
            chained = prev
            for _w in range(_WAVES_PER_STEP):
                chained = one_wave(chained)
            nxt = chained.persist()
            n_nxt = nxt.count()
            if prev is not e:
                prev.unpersist()
            prev = nxt
            if n_nxt == n_prev:
                break
            n_prev = n_nxt
        else:
            raise RuntimeError(
                f"k_core did not stabilize in {max_iter} peel rounds"
            )
        # at the fixed point every incident endpoint holds degree >= k
        survivors = _directed(prev).select("x").distinct()
        out = (
            nodes.select(F.col(node_col).alias("_n"))
            .join(
                survivors.select(
                    F.col("x").alias("_n"), F.lit(True).alias("in_core")
                ),
                "_n",
                "left",
            )
            .select(
                F.col("_n").alias(node_col),
                F.coalesce("in_core", F.lit(False)).alias("in_core"),
            )
        )
        out = out.persist()
        out.count()
        return out
    finally:
        if prev is not e:
            prev.unpersist()
        e.unpersist()


@with_coalesced_cached_rounds
def coreness(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 200,
) -> DataFrame:
    """FULL core decomposition — every node's core NUMBER (the largest
    k such that the node survives the k-core peel) in one loop, via
    the distributed h-index fixed point (Montresor, De Pellegrini,
    Miorandi, "Distributed k-Core Decomposition", 2011): initialize
    each node's estimate to its degree, then repeatedly lower it to

        c'(v) = min(c(v), H({c(u) : u ∈ Γ(v)}))

    where H is the h-index (the largest h with ≥ h neighbors whose
    estimate is ≥ h). Estimates are non-increasing and converge
    EXACTLY to the core number. Returns ``(node_col, coreness)`` with
    coreness 0 for edge-less nodes. This subsumes ``k_core`` (member
    of the k-core ⟺ coreness ≥ k) and answers every k at once — the
    standard graph signal a curation pipeline reads next to PageRank
    and triangle count (link farms are high-core; organic tails are
    1-core).

    SINGLE-REFERENCE rounds (the engine-wide iterative-loop law —
    this repo bans ``localCheckpoint``, and a round that references
    the previous frame twice re-analyzes a 2^rounds logical tree):
    the estimate frame is referenced ONCE per round, joined onto a
    static directed edge list that carries one SELF row per node, so
    a node's own estimate arrives through the same join as its
    neighbors' (separated by a ``_self`` flag inside the one
    hash-agg; no join-back). Per round: one O(m) join and ONE
    hash-agg — the h-index folds from a sorted degree-length array
    per node, so no round ever sorts the m-row join output (the r12
    window formulation did, and that exchange+sort was over half the
    round cost). Convergence is ONE scalar action per round — estimates
    are non-increasing non-negative integers, so the exact bigint sum
    is strictly decreasing until the fixed point (sum unchanged ⟺ no
    estimate changed), and that sum doubles as the round's persist
    materialization.

    Round count: bounded by the longest chain of dependent estimate
    drops — O(bucket width) on the registered link graph, small on
    real web graphs (estimates start at degree and crash fast); the
    pathological path graph needs O(n) rounds, same caveat and same
    truss/degeneracy escape hatch as ``k_core``'s peel."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    directed = e.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("x"), F.col("b").alias("y")),
                F.struct(F.col("b").alias("x"), F.col("a").alias("y")),
            )
        ).alias("r")
    ).select("r.x", "r.y")
    # one SELF row per edged node: the round's single est join then
    # delivers own-estimate and neighbor-estimates together. The
    # static frame persists HASH-PARTITIONED ON THE JOIN KEY, so
    # every round's join reuses the cached exchange and only the
    # (much smaller, vocabulary-sized) estimate frame shuffles.
    directed_all = (
        directed.unionByName(
            directed.select("x").distinct().withColumn(
                "y", F.col("x")
            )
        )
        .repartition(F.col("y"))
        .persist()
    )
    directed_all.count()
    e.unpersist()

    est = (
        directed_all.where(F.col("x") != F.col("y"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(F.col("x").alias("v"), "c")
        .persist()
    )
    prev_sum = est.agg(F.sum("c")).collect()[0][0]

    # h-index per node as ONE hash aggregation (r12 shipped this as a
    # row_number window; the window's exchange+SORT of all m rows per
    # round was over half the round cost — a hash-agg collect_list
    # needs the same exchange but no m-row sort, and the per-node
    # array work stays whole-stage codegen): collect neighbor
    # estimates, array_sort ascending, then h = max_i min(arr[i],
    # d−i) — at ascending position i (0-based), d−i neighbors have an
    # estimate ≥ arr[i]. Per-group memory is one degree-sized int64
    # array; the sorted window needed the same rows resident in its
    # sort buffer, so hub-node skew is no worse than before.
    _arr = F.array_sort(
        F.collect_list(F.when(~F.col("_self"), F.col("cy")))
    )
    _h = F.aggregate(
        F.zip_with(
            _arr,
            F.sequence(F.size(_arr).cast("bigint"), F.lit(1).cast("bigint")),
            lambda v, r: F.least(v, r),
        ),
        F.lit(0).cast("bigint"),
        lambda a, x: F.greatest(a, x),
    )
    def one_round(frame):
        joined = directed_all.join(
            frame, directed_all["y"] == frame["v"]
        ).select(
            "x",
            (F.col("x") == F.col("y")).alias("_self"),
            F.col("c").alias("cy"),
        )
        return (
            joined.groupBy("x")
            .agg(
                F.least(
                    F.max(F.when(F.col("_self"), F.col("cy"))),
                    _h,
                ).alias("c")
            )
            .select(F.col("x").alias("v"), "c")
        )

    # TWO h-index rounds per materialization (max_iter contract:
    # ceil(max_iter/2) double steps, so an ODD max_iter admits at
    # most one extra round before raising — safety valve, not an
    # exact budget; estimates are non-increasing so the extra round
    # only moves closer to the fixed point): each round still
    # references its input exactly once, so a 2-round chain is a
    # depth-2 single-reference plan — analysis stays linear — while
    # the driver pays HALF the per-step sync cost (persist + scalar
    # action + AQE stage barriers dominate wall clock on small
    # graphs; the arithmetic is the same either way). The sum test
    # stays exact at step granularity: estimates are non-increasing,
    # so "sum unchanged across a step" still ⟺ both inner rounds
    # were no-ops ⟺ fixed point (at worst one redundant round runs).
    try:
        for _ in range(max(1, -(-max_iter // _WAVES_PER_STEP))):
            chained = est
            for _w in range(_WAVES_PER_STEP):
                chained = one_round(chained)
            nxt = chained.persist()
            cur_sum = nxt.agg(F.sum("c")).collect()[0][0]
            est.unpersist()
            est = nxt
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        else:
            raise RuntimeError(
                f"coreness did not stabilize in {max_iter} rounds"
            )
        out = (
            nodes.select(F.col(node_col).alias("_n"))
            .join(
                est.select(
                    F.col("v").alias("_n"),
                    F.col("c").alias("coreness"),
                ),
                "_n",
                "left",
            )
            .select(
                F.col("_n").alias(node_col),
                F.coalesce("coreness", F.lit(0))
                .cast("bigint")
                .alias("coreness"),
            )
        )
        out = out.persist()
        out.count()
        return out
    finally:
        est.unpersist()
        directed_all.unpersist()


def neighborhood_growth(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    hot_degree_cap: int | None = None,
) -> DataFrame:
    """Exact 1- and 2-hop ball sizes per node over the undirected
    graph: ``n1`` = |Γ(v)|, ``n2`` = |{u : dist(v,u) ≤ 2}| (self
    excluded). The growth ratio n2/n1 is the classic neighborhood-
    expansion signal — link farms and tight spam cliques expand
    slowly (their 2-hop ball re-enters itself), organic hub pages
    explode — the cheap exact cousin of HyperBall's sketched ball
    series, kept to radius 2 precisely so it stays exact and
    value-checkable.

    Scale shape: one distinct-edge canonicalization, one O(m)
    wedge join co-partitioned on the middle vertex, one distinct +
    hash-agg. Wedge volume is Σ_v deg(v)² — the same budget as
    triangle counting's un-oriented step. On hub-heavy (power-law)
    graphs pass ``hot_degree_cap``: wedges whose MIDDLE vertex has
    degree > cap are skipped, bounding the budget to
    Σ_v min(deg(v), cap)² — the same hot-key cap contract as the
    LSH bucket caps and linkage hard blocks. The capped result is
    provably a SUBSET of the truth per node: n1 is unaffected
    (hubs still count as neighbors), and every 2-hop pair dropped
    really did route only through a hub, so capped ``n2`` is a
    lower bound that never invents reachability; for the exact
    series past that, move to sketched balls (HyperBall). Radius
    > 2 multiplies another degree factor per hop: that is
    BFS-by-joins and wants the sketch, not this."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    und = e.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("x"), F.col("b").alias("y")),
                F.struct(F.col("b").alias("x"), F.col("a").alias("y")),
            )
        ).alias("r")
    ).select("r.x", "r.y").persist()
    try:
        n1 = und.groupBy("x").agg(
            F.count(F.lit(1)).cast("bigint").alias("n1")
        )
        mid = und
        if hot_degree_cap is not None:
            # drop hub MIDDLE vertices before the wedge join: the
            # wedge fan-out of vertex m is deg(m)², so a left-semi
            # against the under-cap roster bounds the join budget
            # while leaving n1 (and hub rows' own output) intact.
            ok = n1.where(
                F.col("n1") <= F.lit(int(hot_degree_cap))
            ).select(F.col("x").alias("m_ok"))
            # ok is vertex-count-sized (SF-linear): un-hinted, AQE
            # broadcasts it while small (_BROADCAST_RULE).
            mid = und.join(ok, und.x == F.col("m_ok"), "left_semi")
        l = mid.select(F.col("x").alias("m"), F.col("y").alias("v"))
        r = mid.select(F.col("x").alias("m"), F.col("y").alias("w"))
        two_hop = (
            l.join(r, "m")
            .where(F.col("w") != F.col("v"))
            .select("v", "w")
        )
        ball2 = (
            two_hop.unionByName(
                und.select(
                    F.col("x").alias("v"), F.col("y").alias("w")
                )
            )
            .distinct()
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
        )
        out = (
            nodes.select(F.col(node_col).alias("_n"))
            .join(
                n1.select(F.col("x").alias("_n"), "n1"), "_n", "left"
            )
            .join(
                ball2.select(F.col("v").alias("_n"), "n2"),
                "_n",
                "left",
            )
            .select(
                F.col("_n").alias(node_col),
                F.coalesce("n1", F.lit(0)).cast("bigint").alias("n1"),
                F.coalesce("n2", F.lit(0)).cast("bigint").alias("n2"),
            )
        )
        out = out.persist()
        out.count()
        return out
    finally:
        und.unpersist()
