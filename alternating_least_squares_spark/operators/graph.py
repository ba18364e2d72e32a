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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base = (100 - damping_pct) * INIT_US // 100
    pr = nodes.withColumn("pr", F.lit(INIT_US).cast("long"))
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
            .localCheckpoint(eager=True)
        )
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


def triangle_counts(
    edges: DataFrame, max_degree: int | None = None
) -> DataFrame:
    """Per-vertex triangle counts over an oriented edge list
    (columns ``a``, ``b``, a < b, distinct) → ``(part, n_triangles)``.

    Every triangle a<b<c is enumerated exactly once as path
    (a→b)(b→c) ∩ edge (a→c): two equi-joins, no pair dedup, no
    CartesianProduct. The wedge join's fan-out is Σ_b out(b)·in(b) —
    quadratic in per-vertex degree — so ``max_degree`` is the hub
    guard (the _cap_buckets idea from LSH dedup applied to graphs):
    vertices whose total degree exceeds the cap are dropped BEFORE
    the wedge join, bounding the fan-out at |V|·max_degree² no matter
    how degenerate the graph. At 100 TB a co-purchase graph always
    has celebrity SKUs; without the cap one such vertex with degree
    10⁶ alone fans into 10¹² wedges and dominates the job. Dropped
    hubs lose their triangle counts AND their neighbors lose
    triangles through them — deterministic, SQL-expressible
    semantics (the gr03 oracle replicates the cap), and the hub set
    is reportable via :func:`vertex_degrees`."""
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
    # one materialization: three consumers below (two join sides + the
    # closing edge probe)
    e = edges.select("a", "b").localCheckpoint(eager=True)
    paths = (
        e.alias("e1")
        .join(
            e.alias("e2").select(
                F.col("a").alias("b"), F.col("b").alias("c")
            ),
            "b",
        )
        .select("a", "b", "c")
    )
    tris = paths.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    ).select("a", "b", "c")
    verts = tris.select(F.explode(F.array("a", "b", "c")).alias("part"))
    return verts.groupBy("part").agg(F.count("*").alias("n_triangles"))
