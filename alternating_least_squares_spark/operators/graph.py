"""Iterative graph analytics — PageRank in exact integer arithmetic.

Complements the dedup suite's connected components
(``functions/dedup.py``) with the other canonical iterative graph
workload. Spark-first shape: each iteration is ONE equi-join (rank →
out-edges) plus ONE keyed aggregation (contributions → destination),
the Pregel message-passing pattern expressed as DataFrames; per-round
``localCheckpoint`` keeps lineage flat so iteration N doesn't replay
iterations 1..N-1.

Determinism contract (oracle-ready, the a17 micro-unit idea taken all
the way): ranks live in integer micro-units and EVERY op is integer —
``contrib = pr DIV outdeg`` (truncating long division; operands are
nonnegative so it's floor), damping is ``(damping_pct · Σcontrib) DIV
100``. There is no floating point anywhere, so any engine computes
bit-identical ranks in any partition order. The classic float
formulation is order-dependent under parallel summation and can never
hash-match across engines.

Semantics notes: dangling nodes (no out-edges) leak their rank mass
(the common simplification — no uniform redistribution), and the
floor divisions shave at most ``outdeg`` µunits per node per round;
both are deterministic and documented rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from alternating_least_squares_spark.checkpoint import (
    local_checkpoint_owned,
    release_local_checkpoint as _release,
    rotate_local_checkpoint,
)

INIT_US = 1_000_000  # one unit of rank, in micro-units


def pagerank(
    edges: DataFrame,
    iterations: int = 2,
    damping_pct: int = 85,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge list.

    ``edges``: columns ``src``, ``dst`` (duplicates allowed — they are
    deduplicated; parallel edges would double-count contributions).
    Returns ``(id, pr_us)`` with ranks in micro-units.

    ``damping_pct``: integer percentage (85 = the classic 0.85). The
    per-node base term is ``(100 - damping_pct) · INIT_US DIV 100``.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be 0..100, got {damping_pct}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e, _own_e = local_checkpoint_owned(
        edges.select("src", "dst").distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    nodes, _own_n = local_checkpoint_owned(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    base = (100 - damping_pct) * INIT_US // 100
    pr = nodes.withColumn("pr", F.lit(INIT_US).cast("long"))
    _owned: set[int] | None = None
    for _ in range(iterations):
        contrib = (
            e.join(pr.withColumnRenamed("id", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("id"),
                F.expr("pr DIV deg").alias("c"),
            )
        )
        summed = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        pr = (
            nodes.join(summed, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(s, 0)) DIV 100"
                    )
                ).cast("long").alias("pr"),
            )
        )
        # rotate: release the previous round's checkpoint blocks
        pr, _owned = rotate_local_checkpoint(pr, _owned)
    # the final pr is materialized; the inputs are no longer read
    _release(pr, (_own_e or set()) | (_own_n or set()))
    return pr.select("id", F.col("pr").alias("pr_us"))


def vertex_degrees(edges: DataFrame) -> DataFrame:
    """Undirected degree per vertex of an oriented edge list
    (columns ``a``, ``b`` with a < b, distinct): one union + keyed
    count. This is also the drop-REPORT side of the triangle hub
    guard — ``vertex_degrees(e).filter(F.col("degree") > cap)`` is
    exactly the set :func:`triangle_counts` excludes, so a pipeline
    can persist/alert on what was capped instead of losing it
    silently."""
    return (
        edges.select(F.col("a").alias("vertex"))
        .unionAll(edges.select(F.col("b").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").alias("degree"))
    )


#: auto-gate for broadcasting the adjacency table in
#: :func:`triangle_counts`: broadcast when |E| (== total out-neighbor
#: array elements under the degree orientation) is at most this many.
#: 8M edges ≈ 64 MB of array longs + |V| row overhead — comfortably
#: inside executor/driver budgets at any cluster size, and ~7× the
#: sf0.1 co-purchase graph so the measured fast path still fires
#: locally. Above it the plan falls back to shuffled-hash joins.
BROADCAST_EDGE_LIMIT = 8_000_000


def _oriented_intersections(
    edges: DataFrame,
    max_degree: int | None,
    broadcast_adjacency: bool | None,
    owned_out: list[int] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared core of :func:`triangle_counts` and
    :func:`edge_neighborhood_scores`: hub-cap → degree-ordered
    orientation → out-adjacency arrays → per-base-edge common
    out-neighbor intersection. Returns ``(capped_edges, degrees,
    per_edge)`` where ``per_edge`` is ``(u, v, _ws)`` for every
    oriented edge whose endpoints share ≥1 common out-neighbor — each
    triangle {x ≺ y ≺ z} appears exactly once, at base edge (x, y)
    with z ∈ ``_ws``. See :func:`triangle_counts` for the scale
    contract (array width ≤ √(2|E|); size-gated broadcast vs
    shuffled-hash joins)."""
    if max_degree is not None:
        if max_degree < 2:
            raise ValueError(
                f"max_degree must be >= 2 (got {max_degree}); a "
                "degree-1 vertex can never close a triangle, so "
                "capping below 2 silently empties the result"
            )
        hubs = (
            vertex_degrees(edges)
            .filter(F.col("degree") > max_degree)
            .select("vertex")
        )
        edges = edges.join(
            hubs.withColumnRenamed("vertex", "a"), "a", "left_anti"
        ).join(hubs.withColumnRenamed("vertex", "b"), "b", "left_anti")
    # two consumers (degree count + orientation join) → materialize.
    # The blocks are read by the RETURNED plans, so they cannot be
    # released here; loop callers (ktruss) pass ``owned_out`` and
    # release each round's generation once its successor is
    # materialized — one-shot callers (gr03/gr04) leave them pinned
    # for the session, the same accepted cost as their final result.
    # |E| for the broadcast gate rides the checkpoint materialization
    # as an observe metric (r19, the kcore/ipf pattern) — no separate
    # count job.
    obs_e = Observation()
    e, _own_e = local_checkpoint_owned(
        edges.select("a", "b").observe(
            obs_e, F.count(F.lit(1)).alias("_n")
        )
    )
    if broadcast_adjacency is None:
        # |E| == total out-array elements, exactly the thing being
        # shipped
        broadcast_adjacency = obs_e.get["_n"] <= BROADCAST_EDGE_LIMIT
    deg = vertex_degrees(e)

    def _attach_deg(df: DataFrame, side: str) -> DataFrame:
        d = deg.select(
            F.col("vertex").alias(side), F.col("degree").alias(f"_d{side}")
        )
        d = F.broadcast(d) if broadcast_adjacency else d.hint("SHUFFLE_HASH")
        return df.join(d, side)

    # orient low-(degree, id) → high; a < b already, so ties keep a→b
    oriented = (
        _attach_deg(_attach_deg(e, "a"), "b")
        .select(
            F.when(F.col("_db") < F.col("_da"), F.col("b"))
            .otherwise(F.col("a"))
            .alias("u"),
            F.when(F.col("_db") < F.col("_da"), F.col("a"))
            .otherwise(F.col("b"))
            .alias("v"),
        )
    )
    # consumers: adj build + stream
    oriented, _own_o = local_checkpoint_owned(oriented)
    if owned_out is not None:
        owned_out.extend(_own_e)
        owned_out.extend(_own_o)
    adj = oriented.groupBy("u").agg(F.collect_list("v").alias("nbrs"))

    def _probe(side: str, out: str) -> DataFrame:
        a = adj.select(F.col("u").alias(side), F.col("nbrs").alias(out))
        return F.broadcast(a) if broadcast_adjacency else a.hint("SHUFFLE_HASH")

    per_edge = (
        oriented.join(_probe("u", "_nu"), "u")
        .join(_probe("v", "_nv"), "v")
        .select("u", "v", F.array_intersect("_nu", "_nv").alias("_ws"))
        .filter(F.size("_ws") > 0)
    )
    return e, deg, per_edge


def triangle_counts(
    edges: DataFrame,
    max_degree: int | None = None,
    broadcast_adjacency: bool | None = None,
) -> DataFrame:
    """Per-vertex triangle counts over an oriented edge list
    (columns ``a``, ``b``, a < b, distinct) → ``(part, n_triangles)``
    for every vertex in ≥1 triangle.

    Formulation: DEGREE-ORDERED per-edge common-neighbor intersection
    (the Latapy / "forward" algorithm, standard in distributed
    triangle counting). Orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one; build OUT-neighbor
    adjacency arrays (one groupBy); join each oriented edge (u, v) to
    both endpoints' out-arrays and score
    ``ws = N⁺(u) ∩ N⁺(v)`` with the codegen ``array_intersect``.
    Each triangle {x ≺ y ≺ z} is found exactly once — at its base
    edge (x, y) with z in the intersection — so the per-vertex count
    is exact without any ÷2: the base endpoints each gain |ws| and
    every w ∈ ws gains 1.

    Why degree ordering (VERDICT r8): under it every out-array is
    STRUCTURALLY bounded at √(2|E|) elements — an out-degree of d
    implies d neighbors of degree ≥ d, so d² ≤ 2|E| — with no cap
    needed, and the total intersect work drops from Σ deg² to
    Σ_{(u,v)∈E} min(deg u, deg v) ≤ O(|E|^1.5), the arboricity
    bound. The previous undirected-adjacency form relied on
    ``max_degree`` alone to bound array width, which bounded nothing
    at 10⁹ vertices.

    Join strategy is SIZE-GATED (``broadcast_adjacency=None`` = auto):
    the adjacency table broadcasts only while |E| ≤
    :data:`BROADCAST_EDGE_LIMIT` (both probes then run in one codegen
    stage and the arrays never serialize — measured 6 s vs 22 s at
    sf0.1 when AQE picked sort-merge instead). Beyond the gate both
    probes take a ``SHUFFLE_HASH`` hint: the adjacency side builds a
    hash map per partition and the edge stream hash-partitions WITHOUT
    sorting, so the array-carrying rows between the probes are never
    buffered through a sort — the specific failure mode of a
    sort-merge plan here. Nothing in the scale path is bounded by
    driver or single-executor memory.

    ``max_degree`` remains the hub SEMANTICS guard: vertices whose
    total degree exceeds the cap are dropped up front, bounding the
    quadratic intersect work at the capped-graph arboricity no matter
    how degenerate the graph (one celebrity SKU with degree 10⁶ alone
    costs 10¹² wedge-equivalents). Dropped hubs lose their triangle
    counts AND their neighbors lose triangles through them —
    deterministic, SQL-expressible semantics (the gr03 oracle
    replicates the cap), and the hub set is reportable via
    :func:`vertex_degrees`."""
    e, _deg, per_edge = _oriented_intersections(
        edges, max_degree, broadcast_adjacency
    )
    # r19 (guide §4.1): the contribution stage used to build
    # struct arrays with a higher-order ``transform`` — HOF lambdas
    # run INTERPRETED, so every triangle paid interpreted
    # struct-construction. Same attribution, HOF-free: explode the
    # intersection into one row per TRIANGLE (u, v, w), then explode
    # the plain 3-element vertex array — two codegen Generates, each
    # triangle contributes exactly +1 to each corner (endpoints'
    # previous +|ws| ≡ one +1 per member row), and the map-side
    # partial count collapses the rows before the single exchange.
    tri = per_edge.select("u", "v", F.explode("_ws").alias("w"))
    return (
        tri.select(F.explode(F.array("u", "v", "w")).alias("part"))
        .groupBy("part")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


def edge_neighborhood_scores(
    edges: DataFrame,
    max_degree: int | None = None,
    broadcast_adjacency: bool | None = None,
) -> DataFrame:
    """Per-EDGE neighborhood similarity over an oriented edge list
    (columns ``a``, ``b``, a < b, distinct) → ``(a, b, common,
    jaccard)`` for every edge: ``common = |N(a) ∩ N(b)|`` (the edge's
    embeddedness — how many triangles contain it) and ``jaccard =
    common / |N(a) ∪ N(b)|`` with ``|N(a) ∪ N(b)| = deg(a) + deg(b) −
    common`` (≥ 2 always: each endpoint is in the other's
    neighborhood, so the division is safe). This is the
    common-neighbors / Jaccard link score of the link-prediction and
    community-detection literature, scored on existing edges — tie
    strength for edge-pruning and cluster seeding.

    Shares :func:`triangle_counts`'s degree-ordered machinery (same
    √(2|E|) array bound, same size-gated broadcast / shuffled-hash
    strategy): each triangle found once at its base edge contributes
    +1 embeddedness to all THREE of its edges — the base edge gains
    |ws| and the two (endpoint, w) edges gain 1 — so common-neighbor
    counts come from the bounded out-arrays without ever joining full
    undirected neighborhoods. Edges in no triangle report common = 0
    via the left join back to the edge list. ``max_degree`` is the
    same hub-cap semantics as gr03 (dropped hubs vanish from edges,
    degrees, and neighborhoods alike)."""
    e, deg, per_edge = _oriented_intersections(
        edges, max_degree, broadcast_adjacency
    )
    cn = _edge_common_counts(per_edge)
    da = deg.select(F.col("vertex").alias("a"), F.col("degree").alias("_da"))
    db = deg.select(F.col("vertex").alias("b"), F.col("degree").alias("_db"))
    return (
        e.join(cn, ["a", "b"], "left")
        .join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            F.coalesce("common", F.lit(0)).cast("long").alias("common"),
            F.round(
                F.coalesce("common", F.lit(0))
                / (
                    F.col("_da") + F.col("_db")
                    - F.coalesce("common", F.lit(0))
                ),
                6,
            ).alias("jaccard"),
        )
    )


def _edge_common_counts(per_edge: DataFrame) -> DataFrame:
    """``(a, b, common)`` for every edge in ≥ 1 triangle, from the
    once-per-triangle base-edge stream of
    :func:`_oriented_intersections`: each triangle {x ≺ y ≺ z} found
    at base edge (u, v) with z ∈ ``_ws`` contributes +1 to all THREE
    of its edges — the base edge gains |ws| and the two (endpoint, w)
    edges gain 1 — so common-neighbor counts come from the bounded
    out-arrays without ever joining full undirected neighborhoods.
    Shared by :func:`edge_neighborhood_scores` (gr04) and
    :func:`edge_support` (the k-truss peel primitive)."""
    def _key(x, y):  # canonical (a, b) = (min, max) edge key
        return F.struct(
            F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
        )

    # r19 (guide §4.1): HOF-free twin of the old transform-built
    # struct stream (HOF lambdas run interpreted): one row per
    # TRIANGLE via a codegen explode, then each triangle contributes
    # +1 to its three edges through a plain 3-struct array — the base
    # edge's previous +|ws| is one +1 per member row, identical sum.
    tri = per_edge.select("u", "v", F.explode("_ws").alias("w"))
    contrib = tri.select(
        F.explode(
            F.array(
                _key(F.col("u"), F.col("v")),
                _key(F.col("u"), F.col("w")),
                _key(F.col("v"), F.col("w")),
            )
        ).alias("_c")
    )
    return (
        contrib.select("_c.a", "_c.b")
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("common"))
    )


def edge_support(
    edges: DataFrame,
    max_degree: int | None = None,
    broadcast_adjacency: bool | None = None,
    owned_out: list[int] | None = None,
) -> DataFrame:
    """Triangle SUPPORT per edge over an oriented edge list (columns
    ``a``, ``b``, a < b, distinct) → ``(a, b, support)`` for EVERY
    edge — how many triangles contain it, 0 for edges in none (the
    left join back to the edge list). This is the peel primitive of
    :func:`ktruss`; it rides the same degree-ordered machinery as
    :func:`triangle_counts` (√(2|E|) array bound, size-gated
    broadcast vs shuffled-hash, hub-cap semantics), and the same
    once-per-triangle attribution as :func:`edge_neighborhood_scores`
    minus the degree arithmetic. ``owned_out`` forwards to
    :func:`_oriented_intersections` so loop callers can release the
    two internal checkpoints each round."""
    e, _deg, per_edge = _oriented_intersections(
        edges, max_degree, broadcast_adjacency, owned_out
    )
    cn = _edge_common_counts(per_edge)
    return e.join(cn, ["a", "b"], "left").select(
        "a",
        "b",
        F.coalesce("common", F.lit(0)).cast("long").alias("support"),
    )


# Live fixpoint loops consult the data-derived runaway bound only
# after this many rounds: shallow fixpoints (the common case) never
# pay the extra count() job the bound costs, and a genuinely deep
# graph pays it once, long before |V| rounds of wasted actions.
_GUARD_CHECK_AT = 60


def ktruss(
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
    max_rounds: int | None = None,
    max_degree: int | None = None,
    broadcast_adjacency: bool | None = None,
) -> DataFrame:
    """k-truss decomposition by support peeling (Cohen 2008, the
    standard community-core refinement of k-core: every edge of the
    k-truss lies in ≥ k−2 triangles WITHIN the truss, so each
    surviving tie is socially reinforced by k−2 mutual contacts):
    repeatedly compute per-edge triangle support and drop every edge
    whose support is < k−2 until the edge set is stable. Input is an
    oriented undirected edge list (columns ``a``, ``b``, a < b;
    deduplicated here). Returns ``(a, b, support)`` — the surviving
    edges with their support INSIDE the surviving edge set.

    This is to :func:`edge_support` exactly what :func:`kcore` is to
    :func:`vertex_degrees` — same two modes, same guard discipline:

    - ``rounds=None`` (live): peel to the FIXPOINT, detected by the
      edge count not shrinking. ``max_rounds=None`` derives the
      runaway guard from the data — every non-terminal round removes
      ≥ 1 edge, so (surviving |E|)+1 further rounds is a structural
      upper bound — priced lazily after ``_GUARD_CHECK_AT`` rounds,
      and released-before-raise like every loop here.
    - ``rounds=N`` (fixed sweep): N peel rounds, well-defined whether
      or not the fixpoint has been reached — the gr01/ipf twin
      discipline that makes the registry entry hash-checkable against
      an unrolled oracle. Rounds after the fixpoint are SKIPPED: the
      peel only removes edges, so an unchanged edge count means the
      filter is a no-op from then on and the result is bit-identical
      to running all N rounds (which is exactly what the unrolled
      oracle states) — one cheap count() per round on checkpointed
      data buys up to N−1 saved support passes (sf0.001 converges in
      1 round; paying 8 passes there was pure waste).

    Scale shape: each round is one :func:`edge_support` pass over a
    SHRINKING edge set — the degree-ordered intersection bounds the
    round at O(|E|^1.5) work with √(2|E|)-bounded arrays, and rounds
    needed is the peel depth (single digits on real co-purchase
    data), so the whole decomposition is R bounded shuffle rounds
    with per-round rotating checkpoints (no lineage growth, ≤ 1
    superseded generation pinned at a time). ``max_degree`` is the
    gr03 hub-cap semantics, applied ONCE to the input (dropped hubs
    vanish from the graph before the first peel; the oracle
    replicates the cap)."""
    if k < 3:
        raise ValueError(
            f"k must be >= 3 (got {k}): a 2-truss is the whole graph "
            "(support >= 0 always holds), so smaller k silently "
            "degenerates to a no-op"
        )
    min_support = k - 2
    e = edges.select("a", "b").distinct()
    if max_degree is not None:
        hubs = (
            vertex_degrees(e)
            .filter(F.col("degree") > max_degree)
            .select("vertex")
        )
        e = e.join(
            hubs.withColumnRenamed("vertex", "a"), "a", "left_anti"
        ).join(hubs.withColumnRenamed("vertex", "b"), "b", "left_anti")
    e, _owned = local_checkpoint_owned(e)
    n_prev = e.count()
    limit = max_rounds
    r = 0
    while True:
        if rounds is not None and r >= rounds:
            break
        if rounds is None and limit is None and r >= _GUARD_CHECK_AT:
            # lazy structural bound: a non-terminal peel removes >= 1
            # edge, so |E|+1 further rounds is an upper bound
            limit = e.count() + r + 1
        if rounds is None and limit is not None and r >= limit:
            # release before raise (see kcore)
            _release(e, _owned)
            raise RuntimeError(
                f"ktruss: no fixpoint after {limit} rounds "
                f"(edges remaining: {n_prev})"
            )
        _own_round: list[int] = []
        sup = edge_support(e, None, broadcast_adjacency, _own_round)
        e, _owned = rotate_local_checkpoint(
            sup.filter(F.col("support") >= min_support).select("a", "b"),
            _owned,
        )
        # the new edge set is materialized; this round's internal
        # signature checkpoints (oriented edges + input copy) are no
        # longer read by anything
        _release(e, set(_own_round))
        r += 1
        n_new = e.count()
        if n_new == n_prev:
            # fixpoint: in live mode this is the exit; in fixed mode
            # the remaining rounds are no-ops (monotone peel), so the
            # result equals the full sweep bit for bit
            break
        n_prev = n_new
    # score the survivors within the truss; the final generation and
    # this last pass's internal checkpoints stay pinned — the
    # returned DataFrame reads them (the kcore/gr03 discipline)
    return edge_support(e, None, broadcast_adjacency)


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
    max_rounds: int | None = None,
) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983 /
    Batagelj–Zaveršnik, the degeneracy workhorse behind community
    cores, fraud-ring triage, and graph sparsification): repeatedly
    drop every vertex whose current degree is < ``k`` until the
    survivor set is stable. Input is an oriented undirected edge list
    (columns ``a``, ``b``, a < b; deduplicated here). Returns
    ``(vertex, core_degree)`` — the surviving vertices with their
    degree inside the surviving edge set.

    Two modes, the gr01/ipf twin discipline:

    - ``rounds=None`` (live): peel to the FIXPOINT, detected by the
      edge count not shrinking (no edge lost ⇔ every surviving vertex
      already has degree ≥ k). One ``count()`` action per round — the
      rc01 fixpoint pattern — and a loud RuntimeError instead of
      spinning when given an adversarial input. ``max_rounds=None``
      (the default) derives the guard from the DATA: every
      non-terminal peel round removes ≥ 1 vertex, so (surviving
      |V|)+1 further rounds is a structural upper bound and any
      overrun is a driver-side bug, never a legitimate deep graph
      (ADVICE r9: the old fixed default of 60 rejected e.g. a
      ~130-vertex path at k=2, which peels from both ends and
      legitimately needs >60 rounds). The bound is priced LAZILY —
      its count() job runs only if the loop passes
      ``_GUARD_CHECK_AT`` rounds, so shallow peels never pay it.
      Pass an int to cap cheaper when the peel depth is known.
    - ``rounds=R`` (fixed sweep): exactly R peels — the result is
      well-defined whether or not the fixpoint was reached, so an
      unrolled-SQL oracle can state it exactly (and when R ≥ the
      data's peel depth it IS the k-core). Peels after the fixpoint
      are SKIPPED (r18, mirroring ktruss's fixed mode): the peel is
      monotone (edges only leave), so an unchanged edge count means
      every remaining round is a no-op and the result equals the full
      sweep bit for bit. The per-round edge count rides the rotation
      checkpoint as an ``observe`` metric — no extra jobs in either
      mode (live mode's separate ``count()`` action folded in too).

    Distributed shape: each round is one union-degree aggregation
    plus two semi-joins on the vertex key — all hash-partitioned on
    vertex/edge keys, linear in |E|, no adjacency arrays, nothing
    broadcast, nothing quadratic (peeling needs no neighbor
    intersection, unlike gr03). Per-round ``localCheckpoint`` keeps
    lineage flat so round N never replays rounds 1..N-1 — at 100 TB
    the work is R bounded shuffles of a shrinking edge set.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # the initial edge count rides the input checkpoint's
    # materialization as an observe metric (r19, ADVICE r18: fixed
    # mode briefly paid this as a separate count() job) — zero count
    # actions in either mode now.
    obs0 = Observation()
    e, _owned = local_checkpoint_owned(
        edges.select("a", "b")
        .distinct()
        .observe(obs0, F.count(F.lit(1)).alias("_n"))
    )
    n_prev = obs0.get["_n"]
    limit = max_rounds
    r = 0
    while True:
        if rounds is not None and r >= rounds:
            break
        if rounds is None and limit is None and r >= _GUARD_CHECK_AT:
            # Derive the structural bound LAZILY: a non-terminal peel
            # removes >= 1 vertex, so |V|+1 rounds is an upper bound —
            # but the count() that prices it is only worth paying once
            # the loop has already run unusually long (shallow peels,
            # the common case, never reach here).
            limit = vertex_degrees(e).count() + r + 1
        if rounds is None and limit is not None and r >= limit:
            # release before raise: callers that catch the error must
            # not inherit this loop's pinned checkpoint generations
            _release(e, _owned)
            raise RuntimeError(
                f"kcore: no fixpoint after {limit} rounds "
                f"(edges remaining: {n_prev})"
            )
        deg = vertex_degrees(e)
        keep = deg.filter(F.col("degree") >= k).select("vertex")
        obs = Observation()
        e, _owned = rotate_local_checkpoint(
            e.join(
                keep.withColumnRenamed("vertex", "a"), "a", "left_semi"
            )
            .join(
                keep.withColumnRenamed("vertex", "b"), "b", "left_semi"
            )
            .observe(obs, F.count(F.lit(1)).alias("_n")),
            _owned,
        )
        r += 1
        n_new = obs.get["_n"]
        if n_new == n_prev:
            break  # fixpoint: no edge left this round, none ever will
        n_prev = n_new
    return vertex_degrees(e).select(
        "vertex", F.col("degree").cast("long").alias("core_degree")
    )


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int | None = None,
    max_rounds: int | None = None,
) -> DataFrame:
    """Multi-source BFS hop distances — "distance to the nearest
    seed", the level-synchronous frontier expansion behind
    reachability, influence radius, and distance-to-POI features.
    ``edges`` is an oriented undirected edge list (``a``, ``b``;
    symmetrized here), ``sources`` a DataFrame with a ``vertex``
    column. Returns ``(vertex, hops)`` for every vertex reached —
    unreached vertices are absent, not NULL-padded.

    Modes (the gr05/gr01/ipf twin discipline): ``rounds=None`` runs
    to frontier exhaustion (one count per round), with a loud
    runaway guard: ``max_rounds=None`` (default) derives the bound
    from the DATA — every continuing level reaches ≥ 1 new vertex,
    so |V|+1 levels is structural and any overrun is a driver bug,
    never a legitimately deep graph (ADVICE r9: the old fixed 60
    rejected seed eccentricity > 60, which is normal in large sparse
    graphs); the bound's count() is priced lazily, only once the
    loop passes ``_GUARD_CHECK_AT`` levels, so shallow expansions
    never pay it; ``rounds=R`` expands exactly R levels — well-defined
    at any R, equal to the fixpoint once R ≥ the graph's seed
    eccentricity, and exactly what an unrolled-SQL oracle states.
    Levels after frontier exhaustion are SKIPPED in fixed mode too
    (r18, the ktruss discipline: an empty frontier makes every
    remaining level a no-op, bit-identical result); the frontier size
    rides each level's checkpoint as an ``observe`` metric, so neither
    mode pays a separate count job.

    Distributed shape: each level is ONE frontier→edges equi-join +
    distinct + ONE anti-join against the visited set — all
    hash-partitioned on the vertex key, linear in the touched edges
    per level (never |V|·|E|); per-round ``localCheckpoint`` keeps
    lineage flat. Level-synchronous BFS is the standard scale
    formulation (Pregel/GraphX do exactly this); hop counts are
    integers, so results are bit-identical at any parallelism.
    """
    sym, _own_sym = local_checkpoint_owned(
        edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(
            edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        .distinct()
    )
    dist, _owned_d = local_checkpoint_owned(
        sources.select("vertex")
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
    )
    frontier = dist.select("vertex")
    limit = max_rounds
    _owned_f: set[int] | None = None
    r = 0
    while True:
        if rounds is not None and r >= rounds:
            break
        if rounds is None and limit is None and r >= _GUARD_CHECK_AT:
            # lazy structural bound: a continuing level reaches >= 1
            # new vertex, so |V|+1 total levels suffices; priced only
            # once the loop has run unusually long
            limit = sym.select("u").distinct().count() + 1
        if rounds is None and limit is not None and r >= limit:
            # release before raise (see kcore)
            _release(
                dist,
                (_own_sym or set())
                | (_owned_d or set())
                | (_owned_f or set()),
            )
            raise RuntimeError(
                f"bfs_distances: frontier alive after {limit} rounds"
            )
        obs = Observation()
        nxt, _owned_f = rotate_local_checkpoint(
            sym.join(
                frontier.withColumnRenamed("vertex", "u"), "u"
            )
            .select(F.col("v").alias("vertex"))
            .distinct()
            .join(dist.select("vertex"), "vertex", "left_anti")
            # frontier size rides the checkpoint materialization (r18:
            # replaces live mode's separate count() job and lets FIXED
            # mode stop at exhaustion too — an empty frontier makes
            # every remaining level a no-op, so the result equals the
            # full R-level sweep bit for bit)
            .observe(obs, F.count(F.lit(1)).alias("_n")),
            _owned_f,
        )
        r += 1
        if not obs.get["_n"]:
            break
        dist, _owned_d = rotate_local_checkpoint(
            dist.unionByName(
                nxt.withColumn("hops", F.lit(r).cast("long"))
            ),
            _owned_d,
        )
        frontier = nxt
    # dist is materialized; the graph and the last frontier are no
    # longer read by the returned result
    _release(dist, (_own_sym or set()) | (_owned_f or set()))
    return dist


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int | None = None,
    max_rounds: int | None = None,
) -> DataFrame:
    """Weighted multi-source single-source shortest paths by
    level-synchronous Bellman-Ford relaxation — :func:`bfs_distances`
    with an integer edge cost in place of the unit hop (the classic
    graph primitive the reachability/components/communities/cores/
    trusses family still lacked). ``edges`` is an oriented undirected
    edge list (``a``, ``b``, ``weight`` — positive integers, validated
    loudly: a non-positive weight breaks both Bellman-Ford's
    termination bound and the runaway guard); ``sources`` a DataFrame
    with a ``vertex`` column. Returns ``(vertex, dist)`` — the
    minimum total weight to the nearest seed — for every vertex
    reached; unreached vertices are absent, never NULL-padded.
    Parallel edges keep their cheapest weight (min on symmetrize).

    Modes (the gr05/gr06 twin discipline): ``rounds=None`` relaxes to
    the FIXPOINT, detected by a round improving or adding nothing
    (the improved-count rides each round's checkpoint as an
    ``observe`` metric — r18 folded away the former separate
    anti-join count job); with positive weights every non-terminal
    round finalizes ≥ 1 vertex, so the data-derived runaway bound is
    |V|+1 rounds, priced lazily after ``_GUARD_CHECK_AT``.
    ``rounds=R`` relaxes exactly R times — well-defined at any R,
    equal to the fixpoint once R ≥ the hop depth of the shortest-path
    forest (which can exceed the BFS eccentricity: a cheaper path may
    use more hops), and exactly what the unrolled-SQL oracle states;
    rounds past the fixpoint are SKIPPED (min-plus relaxation is
    idempotent there, so the result equals the full sweep bit for
    bit — the ktruss fixed-mode discipline).

    Distributed shape: each round is ONE frontier→edges equi-join +
    ONE min-groupBy on the vertex key — linear in touched edges, all
    hash-partitioned on vertex, never |V|·|E| (the relaxation is
    against the FULL dist table, so a round is a self-contained
    min-plus step; no visited-set anti-join is needed because min()
    is idempotent on already-final distances). Per-round rotating
    ``localCheckpoint`` keeps lineage flat and storage bounded."""
    # materialize the (possibly expensive) edge derivation ONCE: the
    # validation scan and the symmetrize both read this checkpoint,
    # not two executions of the caller's plan (review r16)
    e0, _own_e = local_checkpoint_owned(
        edges.select("a", "b", "weight")
    )
    if (
        e0.filter(
            F.col("weight").isNull()
            | (F.col("weight") <= 0)
            # a fractional weight would be silently truncated by the
            # long cast below — reject it with the same loudness
            | (F.col("weight") != F.col("weight").cast("long"))
        ).limit(1).count()
    ):
        _release(e0, _own_e)
        raise ValueError(
            "sssp requires positive non-NULL integer weights: a "
            "non-positive weight voids Bellman-Ford's termination "
            "bound and the |V|+1 runaway guard, and a fractional one "
            "would be silently truncated"
        )
    sym, _own_sym = local_checkpoint_owned(
        e0.select(
            F.col("a").alias("u"), F.col("b").alias("v"), "weight"
        )
        .unionAll(
            e0.select(
                F.col("b").alias("u"), F.col("a").alias("v"), "weight"
            )
        )
        .groupBy("u", "v")
        .agg(F.min("weight").cast("long").alias("w"))
    )
    _release(sym, _own_e)  # superseded by the symmetrized checkpoint
    dist, _own_d = local_checkpoint_owned(
        sources.select("vertex")
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
    )
    r = 0
    limit = max_rounds
    while True:
        if rounds is not None and r >= rounds:
            break
        if rounds is None and limit is None and r >= _GUARD_CHECK_AT:
            # lazy structural bound: every non-terminal relaxation
            # round finalizes >= 1 vertex under positive weights
            limit = sym.select("u").distinct().count() + 1
        if rounds is None and limit is not None and r >= limit:
            _release(dist, (_own_sym or set()) | (_own_d or set()))
            raise RuntimeError(
                f"sssp: still relaxing after {limit} rounds"
            )
        relaxed = sym.join(
            dist.withColumnRenamed("vertex", "u"), "u"
        ).select(
            F.col("v").alias("vertex"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        # tag the self rows so the min-aggregate also yields the
        # PREVIOUS distance: a row improved iff it is new (_prev NULL)
        # or strictly closer (distances only decrease). The improved
        # count rides the checkpoint as an ``observe`` metric (r18) —
        # replaces live mode's separate anti-join count job, and lets
        # FIXED mode skip post-fixpoint rounds (min-plus relaxation is
        # idempotent at the fixpoint, so the result equals the full
        # R-round sweep bit for bit — the unrolled oracle's statement).
        obs = Observation()
        nxt, _own_n = local_checkpoint_owned(
            dist.withColumn("_self", F.lit(True))
            .unionByName(relaxed.withColumn("_self", F.lit(False)))
            .groupBy("vertex")
            .agg(
                F.min("dist").alias("dist"),
                F.min(F.when(F.col("_self"), F.col("dist"))).alias(
                    "_prev"
                ),
            )
            .observe(
                obs,
                F.sum(
                    (
                        F.col("_prev").isNull()
                        | (F.col("dist") < F.col("_prev"))
                    ).cast("long")
                ).alias("_improved"),
            )
            .select("vertex", "dist")
        )
        r += 1
        improved = obs.get["_improved"]
        _release(dist, _own_d)
        dist, _own_d = nxt, _own_n
        if not improved:
            break
    # dist is materialized; the graph is no longer read by the result
    _release(dist, _own_sym or set())
    return dist


def clustering_coefficients(
    edges: DataFrame,
    max_degree: int | None = None,
    broadcast_adjacency: bool | None = None,
) -> DataFrame:
    """Local clustering coefficient per vertex — the triangle
    statistic communities are screened by: ``cc(v) = 2·tri(v) /
    (deg(v)·(deg(v)−1))`` for every vertex with degree ≥ 2 (cc is
    undefined below that), 0.0 for triangle-free vertices. Returns
    ``(vertex, degree, n_triangles, clustering_coeff)``.

    Rides :func:`_oriented_intersections` unchanged — same degree-
    ordered √(2|E|) array bound, same size-gated broadcast /
    shuffled-hash strategy, same ``max_degree`` hub-drop semantics
    (degrees here are POST-cap degrees, so the ratio stays
    consistent with the triangles that survived the cap) — plus one
    left join of the per-vertex triangle credits back onto the
    degree table."""
    e, deg, per_edge = _oriented_intersections(
        edges, max_degree, broadcast_adjacency
    )
    # r19: HOF-free contribution stream — see :func:`triangle_counts`
    # (one row per triangle, +1 per corner via a plain 3-array
    # explode; the old transform-built struct array ran interpreted).
    tri_rows = per_edge.select("u", "v", F.explode("_ws").alias("w"))
    tri = (
        tri_rows.select(
            F.explode(F.array("u", "v", "w")).alias("vertex")
        )
        .groupBy("vertex")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tri, "vertex", "left")
        .select(
            "vertex",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0))
            .cast("long")
            .alias("n_triangles"),
            F.round(
                2.0
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - F.lit(1))),
                6,
            ).alias("clustering_coeff"),
        )
    )


def components_fixed(edges: DataFrame, rounds: int) -> DataFrame:
    """Connected components by hash-min label propagation, run for
    EXACTLY ``rounds`` rounds — the gr01/gr05/gr06 fixed-sweep
    discipline: the result is well-defined whether or not the
    fixpoint has been reached, so an unrolled SQL oracle can state it
    bit for bit at any data regeneration; a pytest pins fixed-sweep ==
    the live convergence loop (functions/dedup.dedup_components, which
    owns the changed-count early exit and the loud non-convergence
    guard) at the test SFs, proving ``rounds`` ≥ the graph diameter
    there.

    ``edges``: columns ``a``, ``b`` (undirected; deduplicated here).
    Returns ``(vertex, component)`` with component = the minimum
    vertex id reachable within ``rounds`` hops.

    Rounds AFTER the fixpoint are SKIPPED (r18, the ktruss fixed-mode
    discipline): hash-min labels are monotone non-increasing and the
    round operator is idempotent at the fixpoint, so once a round
    changes no label every remaining round is a no-op and the result
    is bit-identical to running all ``rounds`` (exactly what the
    unrolled oracle states). The changed-count rides the round's own
    checkpoint materialization as an ``observe`` metric (the ipf_dense
    pattern) — zero extra jobs; at sf0.1 the gr08 support graph
    converges after 8 of its 10 budgeted rounds (instrumented
    changed-counts 3136, 757, 202, 69, 19, 3, 2, 0 — the last two
    rounds are skipped).

    Scale shape: per round ONE vertex-keyed equi-join (labels onto
    out-edges) + ONE groupBy-min — both shuffle on the vertex id, the
    Pregel-as-DataFrames pattern shared with pagerank/kcore/bfs;
    per-round localCheckpoint keeps lineage flat (round N never
    replays 1..N-1). Rounds needed = component diameter, NOT log |V|:
    hash-min moves the minimum one hop per round."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = edges.select("a", "b").distinct()
    e, _own_e = local_checkpoint_owned(
        e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
    )
    labels, _owned = local_checkpoint_owned(
        e.select(F.col("a").alias("vertex"))
        .distinct()
        .select("vertex", F.col("vertex").alias("component"))
    )
    for _ in range(rounds):
        neighbor = e.join(
            labels, e.a == labels.vertex
        ).select(F.col("b").alias("vertex"), "component")
        # tag the self row so the aggregate also yields the PREVIOUS
        # label; new < prev on any row == this round changed something
        # (labels only ever decrease). Every vertex has a self row, so
        # _prev is never NULL.
        merged = (
            labels.withColumn("_self", F.lit(True))
            .unionByName(neighbor.withColumn("_self", F.lit(False)))
            .groupBy("vertex")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("_self"), F.col("component"))).alias(
                    "_prev"
                ),
            )
        )
        obs = Observation()
        labels, _owned = rotate_local_checkpoint(
            merged.observe(
                obs,
                F.sum(
                    (F.col("component") < F.col("_prev")).cast("long")
                ).alias("_changed"),
            ).select("vertex", "component"),
            _owned,
        )
        if not obs.get["_changed"]:
            break  # fixpoint: the remaining rounds are identity
    # the final labels are materialized; the graph is no longer read
    _release(labels, _own_e)
    return labels


def label_propagation(
    edges: DataFrame,
    rounds: int | None = None,
    max_rounds: int | None = None,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007, the near-linear community baseline behind modularity
    seeding, spam-cluster triage, and catalog grouping): every vertex
    starts labeled with its own id and each round adopts the most
    frequent label among its neighbors' current labels PLUS its own —
    ties broken by the minimum label. The self-vote and the min
    tie-break make the update fully deterministic (classic LPA breaks
    ties randomly, which can never hash-match across engines) and damp
    the 2-cycle oscillation synchronous LPA is prone to on bipartite
    structures. Input is an undirected edge list (columns ``a``,
    ``b``; symmetrized and deduplicated here). Returns ``(vertex,
    community)`` — community = the converged (or round-``rounds``)
    label.

    Two modes, the gr01/ipf/kcore twin discipline:

    - ``rounds=None`` (live): iterate to the FIXPOINT, detected by a
      zero changed-label count — one count() action per round, the
      rc01 fixpoint pattern — with a loud RuntimeError instead of
      spinning on a (theoretically possible) oscillating input.
      ``max_rounds=None`` derives the guard lazily at
      ``_GUARD_CHECK_AT`` rounds from the vertex count (label
      propagation converges in O(diameter)-ish rounds on real graphs;
      |V|+1 spent rounds means oscillation, never a legitimate deep
      graph).
    - ``rounds=R`` (fixed sweep): exactly R rounds, NO count actions —
      well-defined whether or not the fixpoint was reached, so an
      unrolled-SQL oracle can state the result exactly (and when R ≥
      the data's convergence depth it IS the fixpoint; a pytest pins
      fixed == live at the test SFs).

    Distributed shape: per round ONE vertex-keyed equi-join (labels
    onto out-edges) + ONE (vertex, label) count + ONE vertex-keyed
    deterministic argmax (min of a (-count, label) struct — partial
    aggregation applies, unlike a row_number window which would sort),
    all hash-partitioned on vertex/edge keys, linear in |E|; no
    adjacency arrays, nothing broadcast. Per-round ``localCheckpoint``
    keeps lineage flat — at 100 TB the work is R bounded shuffles of a
    fixed-size label table.
    """
    e = edges.select("a", "b").distinct()
    e, _own_e = local_checkpoint_owned(
        e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
    )
    labels, _owned = local_checkpoint_owned(
        e.select(F.col("a").alias("vertex"))
        .distinct()
        .select("vertex", F.col("vertex").alias("label"))
    )
    limit = max_rounds
    r = 0
    while True:
        if rounds is not None and r >= rounds:
            break
        if rounds is None and limit is None and r >= _GUARD_CHECK_AT:
            limit = labels.count() + r + 1
        if rounds is None and limit is not None and r >= limit:
            # release before raise (see kcore)
            _release(labels, (_own_e or set()) | (_owned or set()))
            raise RuntimeError(
                f"label_propagation: no fixpoint after {limit} rounds "
                "(synchronous oscillation?)"
            )
        neighbor = e.join(
            labels, e.a == labels.vertex
        ).select(F.col("b").alias("vertex"), "label")
        new_labels, _owned_new = rotate_local_checkpoint(
            labels.unionByName(neighbor)  # self-vote + neighbor votes
            .groupBy("vertex", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("vertex")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("neg_cnt"),
                        F.col("label").alias("label"),
                    )
                ).alias("_best")
            )
            .select("vertex", F.col("_best.label").alias("label")),
            None,  # the old labels are still read by the changed-count
        )
        r += 1
        changed = (
            (
                new_labels.alias("n")
                .join(labels.alias("o"), "vertex")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            if rounds is None
            else None
        )
        # deferred release: the changed-count above still read the
        # old generation after the new checkpoint materialized
        _release(labels, _owned)
        labels, _owned = new_labels, _owned_new
        if changed == 0:
            break
    # the final labels are materialized; the graph is no longer read
    _release(labels, _own_e)
    return labels.select("vertex", F.col("label").alias("community"))
