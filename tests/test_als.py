"""ALS quality gate (VERDICT round-1 ask): training on the sf0.001
ratings projection must reach a fixed RMSE bound, and recommendations
must have the contracted shape."""

from __future__ import annotations

from alternating_least_squares_spark.ml.als import (
    evaluate_rmse,
    ratings_from_testdata,
    recommend_top_k,
    train_als,
)
from tests.conftest import SF_SMALL


def test_als_trains_below_rmse_bound(spark):
    ratings = ratings_from_testdata(spark, SF_SMALL)
    stddev = float(
        ratings.agg({"rating": "stddev"}).first()[0]
    )
    model = train_als(ratings, rank=8, max_iter=8, seed=42)
    rmse = evaluate_rmse(model, ratings)
    # Training-set RMSE must beat the constant-mean predictor (whose
    # RMSE is the rating stddev) by a clear margin — the ratings are
    # synthetic Σ-quantity values with little true low-rank structure,
    # so an absolute bound would just encode noise.
    assert rmse < 0.75 * stddev, f"ALS training RMSE {rmse} vs stddev {stddev}"


def test_als_recommend_shape(spark):
    ratings = ratings_from_testdata(spark, SF_SMALL)
    model = train_als(ratings, rank=4, max_iter=4, seed=42)
    recs = recommend_top_k(model, k=3)
    assert recs.columns == ["user", "item", "score"]
    counts = recs.groupBy("user").count().collect()
    assert counts and all(r["count"] <= 3 for r in counts)


def test_als_model_persistence_roundtrip(spark, tmp_path):
    """Model save/load must reproduce predictions exactly - the
    deploy-without-retraining contract (factor matrices are parquet
    under the hood, so the round-trip is lossless)."""
    from pyspark.ml.recommendation import ALSModel

    ratings = ratings_from_testdata(spark, SF_SMALL)
    model = train_als(ratings, rank=4, max_iter=4, seed=42)
    path = str(tmp_path / "als_model")
    model.write().overwrite().save(path)
    loaded = ALSModel.load(path)
    sample = ratings.limit(50)
    a = sorted(
        (r["user"], r["item"], round(float(r["prediction"]), 6))
        for r in model.transform(sample).collect()
    )
    b = sorted(
        (r["user"], r["item"], round(float(r["prediction"]), 6))
        for r in loaded.transform(sample).collect()
    )
    assert a == b


def test_als_implicit_separates_positives_from_negatives(spark):
    """Implicit-feedback ALS (Hu/Koren/Volinsky 2008) factorizes the
    preference matrix p = [r > 0] with confidence 1 + alpha*r. Quality
    gate: the model must score OBSERVED (user, item) pairs clearly
    above random unobserved pairs — an AUC-style separation floor that
    is robust on synthetic data where an absolute recall@k bound would
    encode noise."""
    from pyspark.sql import functions as F

    from alternating_least_squares_spark.ml.als import train_als_implicit

    ratings = ratings_from_testdata(spark, SF_SMALL).localCheckpoint()
    model = train_als_implicit(ratings, rank=8, max_iter=8, seed=42)

    pos = ratings.select("user", "item")
    # negative sample: random (user, item) pairs not observed together
    users = ratings.select("user").distinct()
    items = ratings.select("item").distinct()
    neg = (
        users.crossJoin(items)
        .withColumn("_r", F.rand(seed=7))
        .orderBy("_r")
        .limit(2000)
        .drop("_r")
        .join(pos, ["user", "item"], "left_anti")
    )
    mean_pos = float(
        model.transform(pos).agg(F.avg("prediction")).first()[0]
    )
    mean_neg = float(
        model.transform(neg).agg(F.avg("prediction")).first()[0]
    )
    assert mean_pos > mean_neg + 0.1, (mean_pos, mean_neg)


def test_als_implicit_recommend_shape(spark):
    from alternating_least_squares_spark.ml.als import train_als_implicit

    ratings = ratings_from_testdata(spark, SF_SMALL)
    model = train_als_implicit(ratings, rank=4, max_iter=4, seed=42)
    recs = recommend_top_k(model, k=3)
    assert recs.columns == ["user", "item", "score"]
    counts = recs.groupBy("user").count().collect()
    assert counts and all(r["count"] <= 3 for r in counts)
