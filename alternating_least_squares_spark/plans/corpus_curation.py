"""End-to-end training-corpus curation plan — the LLM-data flagship.

Chains the pipeline a data team would actually run before training:

1. **exact dedup** — keep the min-id doc per md5(text) group;
2. **quality floor** — drop low quality-score docs;
3. **language filter** — keep docs whose marker-score says English;
4. **contamination screen** — drop docs containing probe strings;
5. **stats** — per-source corpus accounting (docs, tokens, quality).

Every stage is a native-expression operator already oracle-proven on
its own (t01–t08 family); this plan is their composition as ONE lazy
Catalyst plan: a single documents scan, one content-hash shuffle for
the dedup window, then pure per-row filters and one final
aggregation. Registered as ``p01_corpus_curation`` with a DuckDB
oracle of the whole chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from alternating_least_squares_spark.functions import textfns as TX
from alternating_least_squares_spark.sources import load_table

DEFAULT_PROBES = ("spark sql benchmark",)
QUALITY_FLOOR = 0.3


def curate(
    spark: SparkSession,
    sf_dir: str,
    quality_floor: float = QUALITY_FLOOR,
    probes: tuple[str, ...] = DEFAULT_PROBES,
) -> DataFrame:
    """The kept corpus: (doc_id, source, n_tokens, quality)."""
    docs = load_table(spark, sf_dir, "documents")

    # 1. exact dedup: survivor = min doc_id per content hash.
    # ONE shuffle on the content hash, no second scan and no
    # survivor-set broadcast (the survivor set is O(corpus);
    # broadcasting it cannot work at 100 TB). The shuffle is an
    # EXPLICIT repartition on the hash rather than the window's
    # implicit exchange: the window's partitioning requirement is then
    # already satisfied (no second exchange), and AQE honors
    # user-specified widths — its coalescer would otherwise squeeze a
    # small corpus to ONE partition and serialize all the regex-heavy
    # scoring below (everything downstream of this shuffle is narrow).
    n_parts = spark.sparkContext.defaultParallelism
    hashed = docs.withColumn(
        "_hash", F.md5(F.coalesce(F.col("text"), F.lit("")))
    ).repartition(n_parts, "_hash")
    w = Window.partitionBy("_hash").orderBy("doc_id")
    kept = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_hash")
    )

    # 2–3. quality floor + language filter (marker-score argmax == en)
    scores = TX.lang_scores(F.col("text"))
    en_wins = (
        (scores["en"] > scores["de"])
        & (scores["en"] > scores["es"])
        & (scores["en"] > scores["fr"])
    )
    kept = kept.withColumn("quality", TX.quality_score(F.col("text"))).filter(
        (F.col("quality") >= quality_floor) & en_wins
    )

    # 4. contamination screen — ONE filter over one lowered copy so
    # the lower(text) subtree is not re-inflated per probe by
    # filter pushdown (the lang_scores expression-size lesson)
    if probes:
        low = F.lower(F.col("text"))
        clean = F.lit(True)
        for probe in probes:
            clean = clean & ~F.contains(low, F.lit(probe))
        kept = kept.filter(clean)

    # 5. projection for accounting
    return kept.select(
        "doc_id",
        "source",
        TX.token_count(F.col("text")).cast("long").alias("n_tokens"),
        "quality",
    )


def corpus_stats(curated: DataFrame) -> DataFrame:
    """Per-source accounting of the kept corpus."""
    return curated.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            F.sum(F.col("quality").cast("decimal(38,10)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_quality"),
    )
