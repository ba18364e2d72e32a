"""Model-based document filter (ml/classifier.py): the trained model
must RECOVER the planted linear rule on the held-out slice, and the
content-hash split must be disjoint and repartition-stable."""

from __future__ import annotations

from pyspark.sql import functions as F

from alternating_least_squares_spark.ml.classifier import (
    SPLIT_AT,
    _hash_bucket,
    doc_features,
    planted_label,
    train_and_score_filter,
)
from alternating_least_squares_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_holdout_recovers_planted_rule(spark):
    """The planted boundary is linear in the features, so logistic
    regression must recover it almost exactly — only regularization
    shrink near the boundary costs points. Floor 0.9; measured higher
    on this fixture."""
    scored = train_and_score_filter(spark, SF_SMALL).cache()
    n = scored.count()
    assert n > 0
    acc = scored.filter(F.col("label") == F.col("pred")).count() / n
    assert acc >= 0.9, f"holdout rule recovery {acc:.3f} below floor"
    # both classes must appear in the holdout for the floor to mean
    # anything
    assert scored.select("label").distinct().count() == 2


def test_planted_classes_are_balanced_enough(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    lab = doc_features(docs).withColumn("label", planted_label())
    frac = lab.filter(F.col("label") == 1).count() / lab.count()
    assert 0.2 <= frac <= 0.8, f"planted split degenerate: {frac:.2f}"


def test_split_is_disjoint_and_deterministic(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    b1 = {r["doc_id"]: r["b"] for r in docs.select(
        "doc_id", _hash_bucket(F.col("doc_id")).alias("b")).collect()}
    b2 = {r["doc_id"]: r["b"] for r in docs.repartition(7).select(
        "doc_id", _hash_bucket(F.col("doc_id")).alias("b")).collect()}
    assert b1 == b2  # content hash survives repartitioning
    n_train = sum(v < SPLIT_AT for v in b1.values())
    assert 0 < n_train < len(b1)  # both slices non-empty


def test_features_are_finite(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    feats = doc_features(docs)
    num_cols = [c for c in feats.columns if c not in ("doc_id", "lang")]
    bad = feats.filter(
        " OR ".join(
            f"({c} IS NULL OR isnan({c})) " for c in num_cols
        )
    ).count()
    assert bad == 0
