"""Sampling primitives: deterministic hash splits and stratified
sampling fractions."""

from __future__ import annotations

from pyspark.sql import functions as F

from alternating_least_squares_spark import registry
from alternating_least_squares_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_hash_split_is_deterministic_and_proportioned(spark):
    q = registry.queries()["x02_train_test_split"]
    a = {r["doc_id"]: r["split"] for r in q(spark, SF_SMALL).collect()}
    b = {r["doc_id"]: r["split"] for r in q(spark, SF_SMALL).collect()}
    assert a == b  # same content -> same split, forever
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    assert 0.7 <= train / n <= 0.9  # 80% nominal, hash noise allowed


def test_stratified_sample_respects_fractions(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    base = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    q = registry.queries()["x03_stratified_sample"]
    got = {
        r["lang"]: r["count"]
        for r in q(spark, SF_SMALL).groupBy("lang").count().collect()
    }
    # non-en strata kept whole; en downsampled to ~half
    for lang, cnt in base.items():
        if lang == "en":
            assert 0.25 <= got.get(lang, 0) / cnt <= 0.75
        else:
            assert got.get(lang, 0) == cnt
    # seeded sampler: deterministic across invocations
    again = {
        r["lang"]: r["count"]
        for r in q(spark, SF_SMALL).groupBy("lang").count().collect()
    }
    assert again == got


def test_engine_native_sampleby(spark):
    """The engine-native seeded sampler (``sampleBy``): per-stratum
    fractions hold and a fixed seed is deterministic across calls
    within a session."""
    docs = load_table(spark, SF_SMALL, "documents")
    fractions = {"en": 0.5, "zh": 1.0, "es": 1.0, "de": 1.0, "fr": 1.0}
    got = {
        r["lang"]: r["count"]
        for r in docs.sampleBy("lang", fractions, seed=42)
        .groupBy("lang")
        .count()
        .collect()
    }
    base = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert 0.25 <= got.get("en", 0) / base["en"] <= 0.75
    again = {
        r["lang"]: r["count"]
        for r in docs.sampleBy("lang", fractions, seed=42)
        .groupBy("lang")
        .count()
        .collect()
    }
    assert again == got


def test_sketches_within_error_bounds(spark):
    """HLL approx-distinct within its configured 2% rsd (allow 3x
    slack) of exact; t-digest median within 2% of the exact
    percentile."""
    q = registry.queries()["g04_sketches"]
    got = {r["l_returnflag"]: r for r in q(spark, SF_SMALL).collect()}
    li = load_table(spark, SF_SMALL, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("parts"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("median"),
        )
        .collect()
    }
    for flag, e in exact.items():
        g = got[flag]
        assert abs(g["approx_parts"] - e["parts"]) <= 0.06 * e["parts"] + 2
        assert abs(g["approx_median_price"] - e["median"]) <= 0.02 * e["median"]


def test_epoch_shuffle_orders_decorrelate(spark):
    """x19: each epoch must be a complete permutation of the corpus
    (dense 1..n positions per (epoch, shard)), the two epochs' global
    orders must actually DIFFER (the decorrelation reshuffling exists
    for), and epoch 0's order must be independent of whether epoch 1
    was materialized (restart reproducibility)."""
    from alternating_least_squares_spark.registry import queries

    rows = queries()["x19_epoch_shuffle"](spark, SF_SMALL).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(
            (r["shard"], r["pos"], r["doc_id"])
        )
    assert set(by_epoch) == {0, 1}
    n_docs = len(by_epoch[0])
    assert len(by_epoch[1]) == n_docs

    def global_order(entries):
        return [d for _, _, d in sorted((s, p, d) for s, p, d in entries)]

    def dense_per_shard(entries):
        shard_pos = {}
        for s, p, _ in entries:
            shard_pos.setdefault(s, set()).add(p)
        return all(
            ps == set(range(1, len(ps) + 1)) for ps in shard_pos.values()
        )

    assert dense_per_shard(by_epoch[0]) and dense_per_shard(by_epoch[1])
    o0, o1 = global_order(by_epoch[0]), global_order(by_epoch[1])
    assert sorted(o0) == sorted(o1)  # same corpus, both epochs
    assert o0 != o1  # decorrelated permutations


def test_x22_token_budget_matches_python_replay(spark):
    """x22 brute force: per source, sort docs by md5('budget:'||id)
    with doc_id tie-break, admit while tokens-before < budget. The
    Spark window pipeline must equal the sequential replay exactly,
    and every non-empty source must contribute at least one doc."""
    import hashlib

    from alternating_least_squares_spark.registry import (
        X22_BUDGET_TOKENS,
        q_x22_token_budget_mix,
    )
    from alternating_least_squares_spark.sources import load_table
    from tests.conftest import SF_SMALL

    got = {
        r["doc_id"]: (r["source"], r["n_tok"], r["cum_before"])
        for r in q_x22_token_budget_mix(spark, SF_SMALL).collect()
    }

    docs = [
        (r["doc_id"], r["source"], len(r["text"].split()))
        for r in load_table(spark, SF_SMALL, "documents")
        .filter("text IS NOT NULL")
        .select("doc_id", "source", "text")
        .collect()
    ]
    by_source: dict[str, list] = {}
    for doc_id, source, n_tok in docs:
        h = hashlib.md5(f"budget:{doc_id}".encode()).hexdigest()
        by_source.setdefault(source, []).append((h, doc_id, n_tok))
    want = {}
    for source, rows in by_source.items():
        cum = 0
        for h, doc_id, n_tok in sorted(rows):
            if cum >= X22_BUDGET_TOKENS:
                break
            want[doc_id] = (source, n_tok, cum)
            cum += n_tok
    assert got == want
    assert {s for s, _, _ in got.values()} == set(by_source)


def test_x23_weighted_sample_matches_brute_force_and_plan(spark):
    """x23: the deterministic ticket scheme equals a Python replay at
    sf0.001 (ranks, weights, and the k-smallest cut), the weight
    buckets are honored, and the physical plan is a per-partition
    top-k (TakeOrderedAndProject) with no Exchange — k rows move, the
    corpus does not."""
    import hashlib

    from alternating_least_squares_spark.registry import (
        X23_K,
        X23_MAX_W,
        q_x23_weighted_sample,
    )

    out = q_x23_weighted_sample(spark, SF_SMALL)
    got = [
        (r["doc_id"], r["w"], r["sample_key"]) for r in out.collect()
    ]

    docs = [
        (r["doc_id"], (r["text"] or "").split())
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    want = []
    for doc_id, toks in docs:
        w = 1 + min(X23_MAX_W - 1, len(toks) // 32)
        key = min(
            hashlib.md5(f"ws:{doc_id}:{j}".encode()).hexdigest()
            for j in range(1, w + 1)
        )
        want.append((key, doc_id, w))
    want.sort()
    want = [(d, w, k) for k, d, w in want[:X23_K]]
    assert got == want  # order included: the sample IS an ordering
    assert all(1 <= w <= X23_MAX_W for _, w, _ in got)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan and "Sort " not in plan
