"""MLlib-backed LSH variants (``MinHashLSH`` /
``BucketedRandomProjectionLSH`` + ``approxSimilarityJoin``).

The hand-rolled paths (:mod:`.dedup`, :mod:`.similarity`) stay the
primary implementations — pure `F.*` exprs, reproducible hash
families, oracle-friendly. These wrappers exist because SURVEY §2.D
names the MLlib estimators as the composition path, and because
``approxSimilarityJoin`` is the API users migrating from MLlib
pipelines already hold; both paths coexist and agree (tested).

MLlib's MinHashLSH wants sparse binary feature vectors — we build
them with ``HashingTF`` over shingles (dimension = 2^18 to keep
collision noise below the Jaccard thresholds in play).
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alternating_least_squares_spark.functions.textfns import shingles

HASHING_DIM = 1 << 18


def mllib_minhash_near_dup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    k: int = 3,
    max_jaccard_distance: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via MLlib MinHashLSH.approxSimilarityJoin.
    Returns (id_a, id_b, jaccard_distance), id_a < id_b.

    Note: MLlib's distance here is Jaccard DISTANCE (1 − similarity).
    """
    feats = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles(F.col(text_col), k)).alias("_sh"),
    ).filter(F.size("_sh") > 0)
    tf = HashingTF(
        inputCol="_sh", outputCol="features", numFeatures=HASHING_DIM, binary=True
    )
    vec = tf.transform(feats)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=n_hashes, seed=seed
    ).fit(vec)
    pairs = model.approxSimilarityJoin(
        vec, vec, max_jaccard_distance, distCol="jaccard_distance"
    )
    return (
        pairs.filter(F.col("datasetA._id") < F.col("datasetB._id"))
        .select(
            F.col("datasetA._id").alias("id_a"),
            F.col("datasetB._id").alias("id_b"),
            F.round("jaccard_distance", 6).alias("jaccard_distance"),
        )
    )


def mllib_euclidean_neighbors(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 0.5,
    n_tables: int = 3,
    max_distance: float = 0.35,
    seed: int = 42,
) -> DataFrame:
    """Neighbor pairs under Euclidean distance via
    BucketedRandomProjectionLSH.approxSimilarityJoin.
    Returns (id_a, id_b, euclidean), id_a < id_b.

    The testdata embeddings are unit-normalized, so distances live on
    the chord scale ``√(2 − 2·cos)`` ∈ [0, 2]: cosine ≥ 0.95 ≈
    distance ≤ 0.32 — thresholds above 2 would accept every pair."""
    feats = emb.select(
        F.col(id_col).alias("_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=n_tables,
        seed=seed,
    ).fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, max_distance, distCol="euclidean"
    )
    return (
        pairs.filter(F.col("datasetA._id") < F.col("datasetB._id"))
        .select(
            F.col("datasetA._id").alias("id_a"),
            F.col("datasetB._id").alias("id_b"),
            F.round("euclidean", 6).alias("euclidean"),
        )
    )
