from alternating_least_squares_spark.ml.als import (  # noqa: F401
    evaluate_rmse,
    ratings_from_testdata,
    recommend_top_k,
    train_als,
)
