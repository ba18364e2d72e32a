"""Real Alternating Least Squares, via ``pyspark.ml.recommendation.ALS``.

The reference repo is *named* alternating-least-squares but implements
IPF instead ("Not really alternating least squares, but it was the
closest approximation", reference README.md:1). This module honors the
name with the actual algorithm (Koren/Bell/Volinsky 2009; Zhou et al.
2008 for the parallel formulation), using MLlib's battle-tested
implementation — block-partitioned normal equations, exactly the
100 TB-scale design we would otherwise hand-roll.

Ratings projection of the driver testdata: user = o_custkey,
item = l_partkey, rating = Σ l_quantity per (user, item) — an implicit
"how much of this part did this customer buy" preference signal.
"""

from __future__ import annotations

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.recommendation import ALS, ALSModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alternating_least_squares_spark.sources import load_table


def ratings_from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, item, rating) from orders ⋈ lineitem.

    The join shuffles on o_orderkey; the aggregate is a map-side
    partial + final on (user, item). Ratings are integral doubles.

    MLlib ALS requires int32 user/item ids, so the casts below are a
    hard 2^31 bound on the key domain (ANSI mode turns an overflow
    into a loud CAST_OVERFLOW, never a silent wrap). The driver
    testdata never approaches it; a deployment with wider keys must
    remap ids first (dense_rank over the distinct keys — one extra
    shuffle, done once), which is MLlib's documented pattern.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.sum("l_quantity").cast("float").alias("rating"))
    )


# ~ratings per ALS block: blocks beyond the data size just multiply
# block-pair bookkeeping (user_blocks x item_blocks grows quadratically
# in the recommend stage). Measured at sf0.1 (600k ratings): MLlib's
# static default of 10 blocks costs 8.1 s train+recommend, 4 blocks
# 2.9 s, 32 blocks 18 s.
RATINGS_PER_BLOCK = 150_000


def adaptive_num_blocks(ratings: DataFrame, n_ratings: int | None = None) -> int:
    """Size ALS block counts from the data, bounded by the cluster's
    parallelism — the knob MLlib leaves static (10) regardless of
    whether you hand it 60 k or 60 B ratings."""
    if n_ratings is None:
        n_ratings = ratings.count()
    parallelism = ratings.sparkSession.sparkContext.defaultParallelism
    # floor of 4 for block-level parallelism, but the cluster's
    # parallelism is the hard cap (max-then-min would exceed it on a
    # 2-core runner and over-split the factor blocks)
    return min(parallelism, max(4, -(-n_ratings // RATINGS_PER_BLOCK)))


def train_als(
    ratings: DataFrame,
    rank: int = 8,
    max_iter: int = 8,
    reg_param: float = 0.1,
    seed: int = 42,
    num_blocks: int | None = None,
) -> ALSModel:
    if num_blocks is None:
        num_blocks = adaptive_num_blocks(ratings)
    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        seed=seed,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
        nonnegative=True,
        numUserBlocks=num_blocks,
        numItemBlocks=num_blocks,
    )
    return als.fit(ratings)


def evaluate_rmse(model: ALSModel, ratings: DataFrame) -> float:
    preds = model.transform(ratings)
    evaluator = RegressionEvaluator(
        metricName="rmse", labelCol="rating", predictionCol="prediction"
    )
    return float(evaluator.evaluate(preds))


def recommend_top_k(model: ALSModel, k: int = 5) -> DataFrame:
    """Top-k item recommendations per user, exploded to flat rows
    (user, item, score)."""
    recs = model.recommendForAllUsers(k)
    return recs.select(
        "user", F.explode("recommendations").alias("rec")
    ).select(
        F.col("user").cast("long").alias("user"),
        F.col("rec.item").cast("long").alias("item"),
        F.round(F.col("rec.rating").cast("double"), 4).alias("score"),
    )


def train_als_implicit(
    ratings: DataFrame,
    rank: int = 8,
    max_iter: int = 8,
    reg_param: float = 0.1,
    alpha: float = 1.0,
    seed: int = 42,
    num_blocks: int | None = None,
) -> ALSModel:
    """Implicit-feedback ALS (Hu/Koren/Volinsky 2008, "Collaborative
    Filtering for Implicit Feedback Datasets") — the model the ratings
    projection actually calls for: Σ quantity is a *confidence* signal
    (how much was bought), not a rating on a preference scale.

    MLlib reformulates each rating r as preference p = [r > 0] with
    confidence 1 + alpha·r, and factorizes the preference matrix — so
    predictions live in [0, 1]-ish preference space, and the quality
    metric is a RANKING metric over held-out positives, not RMSE
    against the raw quantities (tests pin a recall floor; see
    tests/test_als.py)."""
    if num_blocks is None:
        num_blocks = adaptive_num_blocks(ratings)
    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        implicitPrefs=True,
        alpha=alpha,
        seed=seed,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
        nonnegative=True,
        numUserBlocks=num_blocks,
        numItemBlocks=num_blocks,
    )
    return als.fit(ratings)


def train_and_recommend(
    spark: SparkSession, sf_dir: str, rank: int = 8, max_iter: int = 8, k: int = 5
) -> DataFrame:
    """One-call pipeline for the driver registry (rows-only check —
    iterative ML, not SQL-expressible). Ratings are checkpointed once:
    the block-sizing count, the training iterations, and the factor
    blocks all read the materialized table instead of re-running the
    orders join."""
    ratings = ratings_from_testdata(spark, sf_dir).localCheckpoint(eager=True)
    model = train_als(ratings, rank=rank, max_iter=max_iter)
    return recommend_top_k(model, k)


def train_and_recommend_implicit(
    spark: SparkSession, sf_dir: str, rank: int = 8, max_iter: int = 8, k: int = 5
) -> DataFrame:
    """Implicit-feedback twin of :func:`train_and_recommend` for the
    driver registry (rows-only: iterative ML). Same plan shape — one
    ratings checkpoint feeds block sizing, training, and recommend."""
    ratings = ratings_from_testdata(spark, sf_dir).localCheckpoint(eager=True)
    model = train_als_implicit(ratings, rank=rank, max_iter=max_iter)
    return recommend_top_k(model, k)


# ---------------------------------------------------------------------------
# Pinned-factor twins (m06/m07): hash-certify everything but the fit
#
# The live ALS entries (m01 explicit, m02 implicit) are rows-only by
# design — factor values depend on MLlib's aggregation order. The
# VERDICT r11 ask (#3) is the m05/ipf_fixed twin discipline applied to
# the name-promise family: replace the ONE nondeterministic stage (the
# fit) with pinned exactly-representable factor matrices and run them
# through a shared scoring path, so the driver hash-certifies the
# ratings projection, the dot-product scoring expression, the top-k
# tie-breaking, and the ranking-evaluation machinery.

PINNED_RANK = 4
# Per-dimension (multiplier, offset) of the key->factor map: dim j of
# key x is ((x*p + q) mod 17) - 8, an integer in [-8, 8] standing for
# the dyadic rational n/8 — so a rank-4 dot product is an integer in
# [-256, 256] (units of 1/64), exact in both engines' BIGINTs and
# exactly representable when divided back to a double.
PINNED_DIMS = [(3, 1), (5, 2), (7, 3), (11, 5)]
# Bounded query side: score every 29th user, all items — the v02/v04
# candidate-scan discipline (the pinned twin certifies the scoring
# path; recommending for ALL users at scale is m01's job via MLlib's
# block-partitioned path).
PINNED_USER_STRIDE = 29


def _pinned_factor_array(key: "F.Column") -> "F.Column":
    """The pinned factor vector for an integer key, as array<double>
    of INTEGER values (units of 1/8) — exact, deterministic, and
    spelled identically in the oracle SQL."""
    return F.array(
        *[((key * p + q) % 17 - 8).cast("double") for p, q in PINNED_DIMS]
    )


def recommend_from_factors(
    user_factors: DataFrame, item_factors: DataFrame, k: int, rank: int
) -> DataFrame:
    """Top-k recommendations from explicit factor tables — the
    recommend stage of ALS as a declarative plan: score(u, i) =
    dot(features_u, features_i), ranked per user with a deterministic
    (score desc, item asc) tie-break. Shared by the pinned twins and
    the parity test that pins this expression to MLlib's own
    ``transform`` scoring, so the driver-hashed m06 certifies the
    scoring semantics m01/m02 execute.

    Inputs: (id long/int, features array<numeric>) on both sides; the
    user side is broadcast (the bounded-query-side contract — callers
    keep it small, the item side arbitrarily large). ``rank`` is the
    static factor width: the dot product is unrolled to per-index
    GetArrayItem multiplies, summed left-to-right — whole-stage
    codegen, fixed IEEE order. (The obvious F.aggregate-over-zip_with
    spelling runs the lambda INTERPRETED — measured 25 s vs <2 s at
    sf0.1 for the same 10M-pair scan, the t21/t24 lesson again.)"""
    from pyspark.sql import Window

    uf = user_factors.select(
        F.col("id").cast("long").alias("user_id"),
        F.col("features").alias("_uf"),
    )
    itf = item_factors.select(
        F.col("id").cast("long").alias("item_id"),
        F.col("features").alias("_if"),
    )
    # Spread the stream side BEFORE the broadcast cross join: the item
    # table is small (AQE coalesces it to ONE partition), but the join
    # fans it out |users|-fold, and the per-partition top-k prune +
    # sort would otherwise run single-threaded over every pair
    # (measured 24 s vs 3 s at sf0.1). An explicit partition count is
    # AQE-stable; the exchange moves only the narrow item factors.
    itf = itf.repartition(
        item_factors.sparkSession.sparkContext.defaultParallelism
    )
    dot = F.lit(0.0)
    for j in range(rank):
        dot = dot + (
            F.col("_uf")[j].cast("double") * F.col("_if")[j].cast("double")
        )
    w = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("item_id").asc()
    )
    return (
        itf.crossJoin(F.broadcast(uf))
        .select("user_id", "item_id", dot.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def pinned_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").cast("long").alias("id"))
        .filter(F.col("id") % PINNED_USER_STRIDE == 0)
        .distinct()
    )


def pinned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").cast("long").alias("id"))
        .distinct()
    )


def pinned_recommend(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """m06: the ALS recommend stage with pinned factors — every score
    is an exact integer in units of 1/64, so the top-k rows (including
    tie-breaks) are bit-stable cross-engine. Output (user_id, item_id,
    score_units long, score double-exact)."""
    uf = pinned_users(spark, sf_dir).select(
        "id", _pinned_factor_array(F.col("id")).alias("features")
    )
    itf = pinned_items(spark, sf_dir).select(
        "id", _pinned_factor_array(F.col("id")).alias("features")
    )
    recs = recommend_from_factors(uf, itf, k, rank=PINNED_RANK)
    return recs.select(
        "user_id",
        "item_id",
        F.col("score").cast("long").alias("score_units"),
        (F.col("score") / 64.0).alias("score"),
    )


def pinned_positive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed (user, item) positives for the scored user subset —
    the same orders ⋈ lineitem projection the live fits train on."""
    return (
        ratings_from_testdata(spark, sf_dir)
        .select(
            F.col("user").cast("long").alias("user_id"),
            F.col("item").cast("long").alias("item_id"),
        )
        .filter(F.col("user_id") % PINNED_USER_STRIDE == 0)
    )


def pinned_ranking_eval(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """m07: the implicit-ALS ranking-evaluation machinery (hits@k /
    recall against observed positives — the metric family m02's pytest
    floor uses), run over the pinned recommendations so every count is
    exact. Output (user_id, hits, npos, recall_ppm) — all integers;
    recall in parts-per-million via the floored exact-double divide."""
    recs = pinned_recommend(spark, sf_dir, k).select("user_id", "item_id")
    pos = pinned_positive_pairs(spark, sf_dir)
    npos = pos.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("npos")
    )
    hits = (
        recs.join(pos, ["user_id", "item_id"], "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    return (
        npos.join(hits, "user_id", "left")
        .select(
            "user_id",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            "npos",
            F.floor(
                (F.coalesce(F.col("hits"), F.lit(0)) * 1_000_000)
                .cast("double")
                / F.col("npos")
            )
            .cast("long")
            .alias("recall_ppm"),
        )
    )
