"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``alternating_least_squares_spark.registry``;
this module stays a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from alternating_least_squares_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's full
    E2+E3 cost-allocation pipeline (IPF-imputed part×hour cost matrix
    divided by the visit matrix → cost per visit)."""
    from alternating_least_squares_spark.plans.cost_allocation import cost_per_visit

    return cost_per_visit(
        spark, "/root/testdata/sf0.001", threshold=1e-9, max_iterations=20
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    LLM-pipeline extension surface). Column names are aligned with
    ``oracle_sql`` — the driver's compare is schema-sensitive."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query.
    Keys missing here (iterative/ML/streaming ops) take the driver's
    rows-only check by design."""
    return registry.oracle_sql()
