"""Dedup pipeline on CONSTRUCTED corpora with known ground truth
(testdata near-dups only exercise the happy path; these pin the
semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from alternating_least_squares_spark.functions.dedup import (
    exact_dup_groups,
    keep_one_filter,
    near_dup_pairs,
)


def _corpus(spark):
    base = " ".join(f"tok{i}" for i in range(100))
    near = " ".join(f"tok{i}" if i % 20 else f"alt{i}" for i in range(100))
    other = " ".join(f"zzz{i}" for i in range(100))
    return spark.createDataFrame(
        [(0, base), (1, base), (2, near), (3, other)],
        "doc_id long, text string",
    )


def test_near_dup_pairs_finds_planted_pair(spark):
    docs = _corpus(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in near_dup_pairs(docs, threshold=0.5).collect()
    }
    # exact dup pair at jaccard 1.0
    assert pairs.get((0, 1)) == 1.0
    # planted near-dup: 5 of 100 tokens changed → 15 of 98 shingles
    # touched → true Jaccard ≈ (98-15)/(98+15) ≈ 0.73
    assert (0, 2) in pairs and 0.6 <= pairs[(0, 2)] <= 0.85
    assert (1, 2) in pairs
    # the unrelated doc pairs with nothing
    assert not any(3 in p for p in pairs)


def test_keep_one_filter_drops_higher_ids(spark):
    docs = _corpus(spark)
    pairs = near_dup_pairs(docs, threshold=0.5)
    kept = sorted(r["doc_id"] for r in keep_one_filter(docs, pairs).collect())
    # 1 and 2 lose to 0; 3 survives untouched
    assert kept == [0, 3]


def test_exact_dup_groups_counts(spark):
    docs = _corpus(spark)
    groups = {
        r["keep_id"]: r["n_docs"]
        for r in exact_dup_groups(docs, "doc_id", "text").collect()
    }
    assert groups[0] == 2  # docs 0 and 1 identical
    assert groups[2] == 1 and groups[3] == 1


def test_containment_literals_and_empty_convention(spark):
    """Containment is asymmetric (excerpt detection) and empty-A
    yields 0.0 by convention, mirroring the d08 oracle's CASE."""
    from alternating_least_squares_spark.functions.dedup import containment
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(["a", "b"], ["a", "b", "c", "d"]), ([], ["a"]), (["x"], [])],
        "a array<string>, b array<string>",
    )
    got = [
        (r["ab"], r["ba"])
        for r in df.select(
            F.round(containment(F.col("a"), F.col("b")), 6).alias("ab"),
            F.round(containment(F.col("b"), F.col("a")), 6).alias("ba"),
        ).collect()
    ]
    assert got == [(1.0, 0.5), (0.0, 0.0), (0.0, 0.0)]
