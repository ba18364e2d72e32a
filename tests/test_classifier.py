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


def test_pinned_scoring_matches_python_reference(spark):
    """m05 (the hash-certified twin of m03's scoring path): the
    codegen literal margin must equal a plain-Python dot product over
    the collected features, row for row — and the pinned intercept
    must split the holdout into BOTH pred classes, else the driver
    hash would be insensitive to the margin arithmetic."""
    from alternating_least_squares_spark.ml.classifier import (
        FEATURE_COLS,
        PINNED_COEFS,
        PINNED_INTERCEPT,
        pinned_score_filter,
    )

    scored = {r["doc_id"]: (r["label"], r["pred"])
              for r in pinned_score_filter(spark, SF_SMALL).collect()}
    assert scored
    docs = load_table(spark, SF_SMALL, "documents").filter(
        F.col("text").isNotNull()
    )
    feats = (
        doc_features(docs)
        .withColumn("label", planted_label())
        .withColumn("_bucket", _hash_bucket(F.col("doc_id")))
        .filter(F.col("_bucket") >= SPLIT_AT)
    ).collect()
    assert len(feats) == len(scored)
    for r in feats:
        margin = PINNED_INTERCEPT
        for name in FEATURE_COLS:
            margin += PINNED_COEFS[name] * r[name]
        assert scored[r["doc_id"]] == (int(r["label"]), int(margin > 0))
    preds = {p for _, p in scored.values()}
    labels = {l for l, _ in scored.values()}
    assert preds == {0, 1} and labels == {0, 1}


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
