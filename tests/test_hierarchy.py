"""Recursive-hierarchy operator tests (rc-family, round 5).

Brute-force parity on a handmade forest, reflexive/dist semantics,
and the loud cycle guard — independent of the DuckDB oracle, which
covers the part-table entries (rc01/rc02).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alternating_least_squares_spark.operators import hierarchy as H

#        0        5
#       / \        \
#      1   2        6
#     / \   \
#    3   4   7
EDGES = [(1, 0), (2, 0), (3, 1), (4, 1), (7, 2), (6, 5)]
NODES = [0, 1, 2, 3, 4, 5, 6, 7]


def brute_closure():
    parent = dict(EDGES)
    out = set()
    for n in NODES:
        cur, d = n, 0
        out.add((n, n, 0))
        while cur in parent:
            cur, d = parent[cur], d + 1
            out.add((cur, n, d))
    return out


@pytest.fixture()
def forest(spark):
    nodes = spark.createDataFrame([(n,) for n in NODES], "id long")
    edges = spark.createDataFrame(EDGES, "child long, parent long")
    return nodes, edges


def test_closure_matches_brute_force(forest):
    nodes, edges = forest
    got = {
        (r["anc"], r["desc"], r["dist"])
        for r in H.ancestor_closure(nodes, edges).collect()
    }
    assert got == brute_closure()


def test_subtree_rollup_matches_brute_force(forest, spark):
    nodes, edges = forest
    values = spark.createDataFrame(
        [(n, n * 10 + 1) for n in NODES], "id long, val long"
    )
    got = {
        r["node"]: (r["n_desc"], r["subtree_val"])
        for r in H.subtree_rollup(nodes, edges, values).collect()
    }
    desc = {}
    for anc, d, _ in brute_closure():
        desc.setdefault(anc, []).append(d)
    want = {
        a: (len(ds), sum(d * 10 + 1 for d in ds)) for a, ds in desc.items()
    }
    assert got == want


def test_subtree_rollup_partial_value_coverage(forest, spark):
    """A descendant missing from ``values`` still counts in n_desc and
    adds 0 to subtree_val (ADVICE r5: the old inner join dropped it
    from BOTH, breaking the 'self included' contract)."""
    nodes, edges = forest
    # no rows for nodes 3 and 4 (leaves under 1)
    values = spark.createDataFrame(
        [(n, n * 10 + 1) for n in NODES if n not in (3, 4)],
        "id long, val long",
    )
    got = {
        r["node"]: (r["n_desc"], r["subtree_val"])
        for r in H.subtree_rollup(nodes, edges, values).collect()
    }
    # node 1's subtree = {1, 3, 4}: count stays 3, sum = only val(1)
    assert got[1] == (3, 11)
    # root 0's subtree = {0,1,2,3,4,7}: count 6, sum skips 3 and 4
    assert got[0] == (6, 1 + 11 + 21 + 71)
    # missing leaves still appear as their own (reflexive) subtree
    assert got[3] == (1, 0) and got[4] == (1, 0)


def test_node_depth_roots_and_depths(forest):
    nodes, edges = forest
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in H.node_depth(nodes, edges).collect()
    }
    assert got == {
        0: (0, 0), 1: (0, 1), 2: (0, 1), 3: (0, 2), 4: (0, 2),
        7: (0, 2), 5: (5, 0), 6: (5, 1),
    }


def test_cycle_raises_instead_of_spinning(spark):
    nodes = spark.createDataFrame([(1,), (2,)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 1)], "child long, parent long"
    )
    with pytest.raises(ValueError, match="fixpoint"):
        H.ancestor_closure(nodes, edges, max_rounds=4)


def test_deep_chain_converges_in_log_rounds(spark):
    # depth 40 must converge with max_rounds=7 (2^7 = 128 ≥ 40):
    # doubling, not level-by-level walking.
    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n + 1)], "id long")
    edges = spark.createDataFrame(
        [(i, i - 1) for i in range(1, n + 1)], "child long, parent long"
    )
    cl = H.ancestor_closure(nodes, edges, max_rounds=7)
    assert cl.count() == (n + 1) * (n + 2) // 2
    deepest = cl.agg(F.max("dist")).first()[0]
    assert deepest == n


def test_weighted_closure_products_match_brute_force(forest, spark):
    """BOM quantities: the closure's qty must be the PRODUCT of edge
    weights along the unique path, exact through doubling."""
    nodes, edges = forest
    wts = {(c, p): c + 2 for c, p in EDGES}  # deterministic weights
    wedges = spark.createDataFrame(
        [(c, p, wts[(c, p)]) for c, p in EDGES],
        "child long, parent long, qty long",
    )
    got = {
        (r["anc"], r["desc"]): r["qty"]
        for r in H.ancestor_closure(nodes, wedges, weight_col="qty").collect()
    }
    parent = dict(EDGES)
    want = {}
    for n in NODES:
        cur, q = n, 1
        want[(n, n)] = 1
        while cur in parent:
            q *= wts[(cur, parent[cur])]
            cur = parent[cur]
            want[(cur, n)] = q
    assert got == want


def test_star_forest_hot_ancestor_key(spark):
    """Skew shape: one root with 3000 direct children (the closure's
    compose join concentrates on the root's key). Results stay exact
    and the fixpoint lands in one compose round (depth 1)."""
    n = 3000
    nodes = spark.createDataFrame([(i,) for i in range(n + 1)], "id long")
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, n + 1)], "child long, parent long"
    )
    cl = H.ancestor_closure(nodes, edges, max_rounds=3)
    assert cl.count() == (n + 1) + n  # reflexive pairs + one edge each
    got = H.subtree_rollup(
        nodes,
        edges,
        spark.createDataFrame([(i, 1) for i in range(n + 1)],
                              "id long, val long"),
    )
    root = {r["node"]: (r["n_desc"], r["subtree_val"]) for r in got.collect()}
    assert root[0] == (n + 1, n + 1)
    assert root[1] == (1, 1)


def test_native_recursive_cte_agrees_with_doubling_closure(spark):
    """rc05 (Spark's native WITH RECURSIVE / UnionLoop) and rc02 (the
    doubling closure in operators/hierarchy.py) are two recursion
    strategies over the same forest — aggregating rc02's per-node
    (root, depth) rows must reproduce rc05's per-root tree profile
    exactly, and the executed rc05 plan must actually contain the
    native recursion operator."""
    from alternating_least_squares_spark import registry as R
    from tests.conftest import SF_SMALL

    rc05 = R.q_rc05_recursive_cte(spark, SF_SMALL)
    got = {
        r["root"]: (r["n_nodes"], r["max_depth"], r["tree_size"])
        for r in rc05.collect()
    }
    plan = rc05._jdf.queryExecution().executedPlan().toString()
    assert "UnionLoop" in plan, plan[:2000]

    part = R.load_table(spark, SF_SMALL, "part").select(
        F.col("p_partkey").alias("node"), "p_size"
    )
    want = {
        r["root"]: (r["n_nodes"], r["max_depth"], r["tree_size"])
        for r in R.q_rc02_node_depth(spark, SF_SMALL)
        .join(part, "node")
        .groupBy("root")
        .agg(
            F.count("*").alias("n_nodes"),
            F.max("depth").alias("max_depth"),
            F.sum("p_size").alias("tree_size"),
        )
        .collect()
    }
    assert got == want and len(got) == 10
