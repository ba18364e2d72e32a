"""Model-based document filtering — the learned-classifier stage of a
training-data pipeline (the role fastText/linear quality classifiers
play in public LLM data recipes, e.g. the CCNet/GPT-3 data work):
assemble cheap per-document features, train a linear model on a
labeled slice, score the corpus, filter on the score.

The reference has no ML surface (its whole scope is IPF raking,
``core.clj:99-119``); this extends the engine the same way `ml/als.py`
does, on public MLlib APIs only.

**Label honesty.** The sandbox corpus is synthetic noise relative to
its metadata: measured per-language/per-source feature means are
indistinguishable (lang/source are assigned independently of text), so
no natural label is text-predictable and reporting "accuracy" against
one would be meaningless. The demo therefore uses the standard
**planted-rule** construction: the label is a known linear rule over a
subset of the features plus a fixed threshold, and the test asserts
the trained model RECOVERS the rule on held-out documents. That
validates exactly what this module owns — feature assembly, the
content-hash split, distributed training, scan-speed scoring — with a
floor that actually means something. On a real corpus the label column
is simply replaced by human/weak-supervision labels; nothing else
changes.

Spark shape, designed for the 100 TB corpus:

* **features are one narrow projection** — the same codegen'd marker
  counts / ratio expressions the oracle-checked text queries use
  (:mod:`..functions.textfns`), normalized per token so length never
  leaks into the class signal. No UDFs, no second scan.
* **the split is a content hash** (md5 prefix, as x02/x03/x06): it
  survives repartitioning and reruns, so train/holdout membership is
  reproducible — the property that makes the scored output row-stable
  enough to register as a driver query.
* **training sees only the train slice**; scoring inlines the fitted
  coefficients as LITERALS in a codegen expression — not
  ``model.transform``, whose prediction ScalaUDF drags the model's
  training summary (and with it a non-serializable SparkSession
  reference — ObservationManager, populated by any ``observe`` query
  earlier in the session) into the task closure. A linear model's
  decision is ``dot(coef, x) + intercept > 0``: ten multiply-adds in
  whole-stage codegen, so scoring 100 TB costs one pass at scan speed
  with nothing broadcast at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alternating_least_squares_spark.functions import textfns as TX
from alternating_least_squares_spark.sources import load_table

# content-hash split: [0, 65536) buckets; < SPLIT_AT trains, rest holds out
SPLIT_AT = int(0.7 * 65536)

# planted rule: label = 1 iff 2*m_en + 0.1*avg_tok_len - 3*punct_ratio
# exceeds the threshold (≈ the corpus median of that score, measured
# once and frozen so the class split stays near-balanced and the rule
# is a fixed property of the text, not of the run)
PLANT_THRESHOLD = 0.51


def _hash_bucket(col):
    from alternating_least_squares_spark.functions.hashing import hex4_bucket

    return hex4_bucket(col)


def doc_features(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, features...) — per-language marker densities plus
    shape ratios, all deterministic codegen expressions."""
    n_tok = F.greatest(TX.token_count(F.col("text")).cast("double"), F.lit(1.0))
    n_chars = F.greatest(TX.char_count(F.col("text")).cast("double"), F.lit(1.0))
    cols = [
        F.col("doc_id"),
        F.col("lang"),
        (TX.punct_count(F.col("text")).cast("double") / n_chars).alias(
            "punct_ratio"
        ),
        TX.avg_token_length(F.col("text")).alias("avg_tok_len"),
        TX.quality_score(F.col("text")).alias("quality"),
    ]
    for lang, score in TX.lang_scores(F.col("text")).items():
        cols.append((score.cast("double") / n_tok).alias(f"m_{lang}"))
    return docs.select(*cols)


FEATURE_COLS = ["punct_ratio", "avg_tok_len", "quality"] + [
    f"m_{lang}" for lang in TX.LANG_MARKERS
]


def planted_label() -> F.Column:
    """The planted linear rule over feature columns (see module
    docstring) — a fixed, text-deterministic decision boundary the
    trained model must recover."""
    score = (
        2.0 * F.col("m_en")
        + 0.1 * F.col("avg_tok_len")
        - 3.0 * F.col("punct_ratio")
    )
    return (score > PLANT_THRESHOLD).cast("double")


def score_margin(coefs: dict[str, float], intercept: float) -> "F.Column":
    """The linear decision margin as ONE codegen expression over the
    :func:`doc_features` columns: ``intercept + Σ coef·feature``,
    accumulated left-to-right in ``FEATURE_COLS`` order. Shared by the
    fitted (m03) and pinned (m05) scoring paths so the driver-hashed
    m05 certifies byte-for-byte the expression shape m03 executes —
    IEEE addition is order-sensitive, so the oracle SQL spells out the
    same left-associated chain."""
    margin = F.lit(float(intercept))
    for name in FEATURE_COLS:
        margin = margin + F.lit(float(coefs[name])) * F.col(name)
    return margin


# m05's pinned model: coefficients over FEATURE_COLS chosen
# exactly-representable in binary (sums/differences of powers of two)
# so the Spark literals and the DuckDB SQL literals parse to the SAME
# double bit pattern; the intercept (-67/64) sits at the measured
# sf0.01 median of the un-intercepted score, so pred splits the
# holdout near 50/50 and the hash is sensitive to every feature.
PINNED_COEFS = {
    "punct_ratio": -3.0,
    "avg_tok_len": 0.125,
    "quality": 0.5,
    "m_en": 2.0,
    "m_de": -0.5,
    "m_es": -0.5,
    "m_fr": -0.5,
}
PINNED_INTERCEPT = -1.046875


def pinned_score_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m03's scoring path with the ONE nondeterministic stage removed
    (VERDICT r10 #3): identical feature assembly, content-hash
    holdout split, and literal-margin codegen scoring, but the
    coefficients are the PINNED constants above instead of an LBFGS
    fit — so the output is exactly SQL-expressible and the driver can
    hash-certify everything m03 owns except the MLlib optimizer
    (whose rule-recovery floor stays pinned in
    tests/test_classifier.py). The ipf_cost_per_visit_fixed /
    ipf_cost_per_visit twin discipline, applied to ML scoring."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    feats = (
        doc_features(docs)
        .withColumn("label", planted_label())
        .withColumn("_bucket", _hash_bucket(F.col("doc_id")))
    )
    holdout = feats.filter(F.col("_bucket") >= SPLIT_AT)
    margin = score_margin(PINNED_COEFS, PINNED_INTERCEPT)
    return holdout.select(
        "doc_id",
        F.col("label").cast("long").alias("label"),
        (margin > 0).cast("long").alias("pred"),
    )


def train_and_score_filter(
    spark: SparkSession,
    sf_dir: str,
    max_iter: int = 20,
) -> DataFrame:
    """Train a logistic-regression filter on the content-hash train
    slice against the planted label, score the HOLDOUT slice. Returns
    (doc_id, label, pred) — probabilities are model-internal and
    deliberately not surfaced (coefficients depend on LBFGS
    aggregation order; the argmax prediction is stable on separable
    data, the floating probabilities are not). Recovery floor pinned
    in tests/test_classifier.py."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    feats = (
        doc_features(docs)
        .withColumn("label", planted_label())
        .withColumn("_bucket", _hash_bucket(F.col("doc_id")))
    )
    train = VectorAssembler(
        inputCols=FEATURE_COLS, outputCol="features", handleInvalid="keep"
    ).transform(feats.filter(F.col("_bucket") < SPLIT_AT))
    model = LogisticRegression(
        maxIter=max_iter, regParam=0.01, featuresCol="features"
    ).fit(train)

    # score in codegen: the fitted decision boundary as a literal
    # expression (see module docstring for why NOT model.transform)
    margin = score_margin(
        dict(zip(FEATURE_COLS, (float(c) for c in model.coefficients))),
        float(model.intercept),
    )
    holdout = feats.filter(F.col("_bucket") >= SPLIT_AT)
    return holdout.select(
        "doc_id",
        F.col("label").cast("long").alias("label"),
        (margin > 0).cast("long").alias("pred"),
    )
