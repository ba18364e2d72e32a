"""Recursive / hierarchical queries over parent-child edge tables.

The one classic warehouse shape the h-suite doesn't cover (VERDICT r4
§next-round #6): a recursive CTE — subtree rollups and root/depth
resolution over an arbitrary-depth hierarchy. Spark has no
``WITH RECURSIVE``, so the closure is computed by ITERATIVE JOINS.

Scale design — exponential doubling, not level-by-level walking:
``closure_{2k} = distinct(closure_k ∪ closure_k ∘ closure_k)`` reaches
depth d in ⌈log₂ d⌉ rounds, so a depth-1000 hierarchy costs 10 keyed
shuffles instead of 1000. Each round is one equi-join (anc == desc
composition) plus one distinct — both plain keyed shuffles, no
cartesian anywhere (test_plan_lint covers the registry entries). Each
round is pinned with ``localCheckpoint`` so the lineage (and the
replayed join DAG) doesn't grow with depth; convergence is detected by
row-count fixpoint and a loud ``max_rounds`` guard raises on cycles
rather than spinning (a cycle makes the closure grow forever).

In a tree each (ancestor, descendant) pair has exactly ONE connecting
path, so ``dist`` is well-defined and ``distinct`` is exact — no
min-aggregation needed. For DAG inputs, pairs stay correct but dist
would need a min(); we document tree-only and assert acyclicity via
the rounds guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alternating_least_squares_spark.checkpoint import (
    rotate_local_checkpoint,
)

ANC, DESC, DIST, QTY = "anc", "desc", "dist", "qty"


def ancestor_closure(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = 20,
    weight_col: str | None = None,
) -> DataFrame:
    """All (ancestor, descendant, distance) pairs of a forest,
    INCLUDING the reflexive (n, n, 0) pairs.

    ``nodes``: one column ``id``. ``edges``: columns ``child``,
    ``parent`` — at most one parent per child (tree/forest).
    ``max_rounds`` bounds the doubling loop: it supports depth
    2^max_rounds, and hitting the bound without reaching a fixpoint
    raises (cycle or deeper-than-declared hierarchy) instead of
    silently truncating.

    ``weight_col``: optional integral per-edge multiplier on ``edges``
    (units of child per unit of parent — the BOM quantity). When set,
    the closure carries ``qty`` = the PRODUCT of edge weights along
    the path (1 on reflexive pairs). Multiplication is associative, so
    the doubling composition stays exact; in a tree the path per pair
    is unique, so ``distinct`` still deduplicates composed duplicates
    bit-exactly. Keep weights integral and depth·log₂(max weight)
    under 63 bits — products are exact longs, never doubles.
    """
    seed_cols = [
        F.col("id").alias(ANC),
        F.col("id").alias(DESC),
        F.lit(0).alias(DIST),
    ]
    edge_cols = [
        F.col("parent").alias(ANC),
        F.col("child").alias(DESC),
        F.lit(1).alias(DIST),
    ]
    if weight_col is not None:
        seed_cols.append(F.lit(1).cast("long").alias(QTY))
        edge_cols.append(F.col(weight_col).cast("long").alias(QTY))
    closure, _owned = rotate_local_checkpoint(
        nodes.select(*seed_cols).unionByName(edges.select(*edge_cols)),
        None,
    )
    n = closure.count()
    for _ in range(max_rounds):
        a, b = closure.alias("a"), closure.alias("b")
        out_cols = [
            F.col(f"a.{ANC}").alias(ANC),
            F.col(f"b.{DESC}").alias(DESC),
            (F.col(f"a.{DIST}") + F.col(f"b.{DIST}")).alias(DIST),
        ]
        if weight_col is not None:
            out_cols.append((F.col(f"a.{QTY}") * F.col(f"b.{QTY}")).alias(QTY))
        composed = a.join(b, F.col(f"a.{DESC}") == F.col(f"b.{ANC}")).select(
            *out_cols
        )
        closure, _owned = rotate_local_checkpoint(
            closure.unionByName(composed).distinct(), _owned
        )
        m = closure.count()
        if m == n:
            return closure
        n = m
    raise ValueError(
        f"ancestor_closure did not reach a fixpoint in {max_rounds} "
        f"doubling rounds (supports depth {2 ** max_rounds}) — cyclic "
        "edges or an unexpectedly deep hierarchy"
    )


def subtree_rollup(
    nodes: DataFrame,
    edges: DataFrame,
    values: DataFrame,
    max_rounds: int = 20,
) -> DataFrame:
    """Per ancestor: descendant count (self included) and the sum of an
    integral per-node value over its whole subtree.

    ``values``: columns ``id``, ``val`` (integral — the sums must be
    order-independent for oracle parity). A descendant MISSING from
    ``values`` still counts toward ``n_desc`` and contributes 0 to
    ``subtree_val`` (left join + coalesce) — an inner join would
    silently shrink the "descendant count (self included)" contract
    whenever coverage is partial (ADVICE r5). One closure build + one
    keyed aggregation; the closure size is Σ depth(n) ≈ n·avg_depth
    rows, the classic space/time trade of materialized-path rollups.
    """
    cl = ancestor_closure(nodes, edges, max_rounds)
    return (
        cl.join(values.withColumnRenamed("id", DESC), DESC, "left")
        .groupBy(F.col(ANC).alias("node"))
        .agg(
            F.count("*").alias("n_desc"),
            F.sum(F.coalesce(F.col("val"), F.lit(0))).alias("subtree_val"),
        )
    )


def node_depth(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = 20,
) -> DataFrame:
    """Per node: its root ancestor and its depth (root = depth 0).

    Derived from the closure: the pair whose ancestor is a root (has
    no parent edge) is unique per node in a forest.
    """
    cl = ancestor_closure(nodes, edges, max_rounds)
    roots = nodes.join(
        edges.select(F.col("child").alias("id")), "id", "left_anti"
    ).select(F.col("id").alias(ANC))
    return cl.join(roots, ANC).select(
        F.col(DESC).alias("node"),
        F.col(ANC).alias("root"),
        F.col(DIST).alias("depth"),
    )
