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
