"""Declarative data-quality constraints (mini expectations runner).

``check(df, constraints)`` evaluates row-level predicates and
table-level uniqueness in ONE aggregation pass and returns a tidy
``(constraint, n_violations, passed)`` report — the validation gate a
training-data pipeline runs before shipping a corpus snapshot.

Row predicates compile to conditional counts inside a single
``agg`` (one scan, map-side partial aggregation); uniqueness checks
are ``count(*) − count(distinct key)``, which Spark plans as expand +
two-level aggregate in the same job. No Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null({col})", F.col(col).isNotNull())


def in_range(col: str, lo: float, hi: float) -> tuple[str, Column]:
    return (
        f"in_range({col},{lo},{hi})",
        F.col(col).isNotNull() & (F.col(col) >= lo) & (F.col(col) <= hi),
    )


def matches(col: str, regex: str) -> tuple[str, Column]:
    # the regex is part of the name: two regex constraints on the same
    # column must not collide on the agg alias (the report is keyed by
    # name, and a collision silently repeats the first count)
    return (
        f"matches({col},{regex})",
        F.col(col).isNotNull() & F.col(col).rlike(regex),
    )


def check(
    df: DataFrame,
    constraints: list[tuple[str, Column]],
    unique_keys: list[str] | None = None,
) -> DataFrame:
    """Evaluate all constraints in one aggregation.

    ``constraints``: (name, predicate-that-good-rows-satisfy) pairs —
    use the helpers above or any boolean Column. ``unique_keys``:
    columns that must be duplicate-free. Returns
    ``(constraint, n_violations, passed)``, one row per constraint.
    """
    # coalesce: a predicate that evaluates NULL (e.g. a raw comparison
    # against a NULL column) means the row does NOT satisfy the
    # constraint — count it as a violation rather than silently
    # skipping it (count_if counts only TRUE).
    aggs = [
        F.count_if(F.coalesce(~cond, F.lit(True))).cast("long").alias(name)
        for name, cond in constraints
    ]
    for key in unique_keys or []:
        # count over a struct: count()/count_distinct() on the bare
        # column both SKIP NULLs, so a table of duplicate NULL keys
        # would pass. struct(NULL) is itself non-NULL, so every row is
        # counted and NULL keys deduplicate like any other value.
        aggs.append(
            (
                F.count(F.struct(F.col(key)))
                - F.count_distinct(F.struct(F.col(key)))
            )
            .cast("long")
            .alias(f"unique({key})")
        )
    row = df.agg(*aggs)
    names = row.columns
    spark = df.sparkSession
    # one collected row → tiny report DataFrame (constraint count is
    # O(10), never data-sized)
    vals = row.first()
    return spark.createDataFrame(
        [(n, int(vals[n]), vals[n] == 0) for n in names],
        "constraint string, n_violations long, passed boolean",
    )


def foreign_key(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Cross-table referential-integrity check — the expectation q01's
    single-pass runner cannot express. Returns a one-row report in the
    same ``(constraint, n_violations, passed)`` shape as :func:`check`,
    so callers union them into one gate.

    SQL FK semantics: NULL child keys never violate (they're filtered
    before the anti-join). Plan: project both sides to the key,
    distinct the parent, LEFT ANTI join — one keyed shuffle each side,
    and Catalyst/AQE broadcasts the parent side when it's small (the
    usual dim-table case). Never a collect."""
    name = f"foreign_key({child_col}->{parent_col})"
    orphans = (
        child.select(F.col(child_col).alias("_fk"))
        .filter(F.col("_fk").isNotNull())
        .join(
            parent.select(F.col(parent_col).alias("_fk")).distinct(),
            "_fk",
            "left_anti",
        )
    )
    return orphans.agg(
        F.count("*").cast("long").alias("n_violations")
    ).select(
        F.lit(name).alias("constraint"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def observed(
    df: DataFrame,
    constraints: list[tuple[str, Column]],
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Piggyback the violation counts of :func:`check` onto whatever
    action the CALLER already runs — zero extra scans.

    ``check`` costs one dedicated aggregation job; in a production
    pipeline the same data is about to be written anyway, and
    ``df.observe`` collects metrics as a side effect of that write.
    Returns ``(instrumented_df, observation)``; after the caller's
    first action, ``observation.get`` holds ``{constraint_name:
    n_violations}``. At 100 TB this is the difference between "the
    quality gate is free" and "the quality gate doubles the job".
    """
    obs = Observation(name)
    metrics = [
        F.count_if(F.coalesce(~cond, F.lit(True))).cast("long").alias(n)
        for n, cond in constraints
    ]
    return df.observe(obs, *metrics), obs
