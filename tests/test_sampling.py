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
