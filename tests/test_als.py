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
