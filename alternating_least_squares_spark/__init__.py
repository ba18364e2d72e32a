"""alternating_least_squares_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
``cassandra-codes/alternating-least-squares`` (a Clojure IPF /
matrix-raking library + CSV cost-allocation ETL, see SURVEY.md) as an
idiomatic Spark DataFrame engine, extended with:

* real ALS collaborative filtering (``ml.als``, via ``pyspark.ml``),
* large-scale training-data pipeline operators (dedup, similarity
  search, text analysis, multimodal columns),
* a Structured Streaming surface for the ``events`` stream.

Design rules (enforced throughout):

* Everything is a DataFrame with an explicit schema; matrices live in
  **coordinate form** ``(r: long, c: long, v: double)`` so they scale
  to 100 TB — dense nested-array forms are only used driver-side for
  tiny fixtures.
* Operators are built from native ``pyspark.sql.functions`` column
  expressions (JVM-side, whole-stage-codegen friendly). Python UDFs
  are confined to the multimodal decode stubs, which are Arrow-batched
  ``mapInPandas`` and clearly marked.
* Small sides of joins (marginals, dimensions, centroids) are
  broadcast; everything else shuffles on its natural key exactly once.
"""

__version__ = "0.1.0"

from alternating_least_squares_spark.session import get_spark  # noqa: F401
