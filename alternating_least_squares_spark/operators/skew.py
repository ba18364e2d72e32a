"""Skew-mitigation operators for hot keys.

At 100 TB a handful of hot keys (the zero hour, a viral document, a
null-ish default id) can hold one reducer hostage while 999 executors
idle. Two standard remedies, both expressed declaratively:

* **AQE skew-join splitting** — on by default in
  :mod:`~alternating_least_squares_spark.session` (
  ``spark.sql.adaptive.skewJoin.enabled``); it splits oversized
  sort-merge join partitions at runtime. Prefer it; it needs no code.
* **Salting** — this module, for the cases AQE does not cover:
  a skewed **aggregation** (AQE never splits a single hot groupBy
  key) and a skewed join against a small-but-not-broadcastable side.

``salted_agg`` is two-phase aggregation: spray each key over
``n_salts`` sub-keys, partially aggregate, then aggregate the
``n_salts`` partials. Exact for any commutative+associative measure
set (sum/count/min/max); means must be derived as sum/count after the
second phase. Catalyst's own partial aggregation already does this
per-PARTITION; salting additionally splits a hot key ACROSS the
shuffle, which partial aggregation cannot (every partial for one key
still lands on one reducer).

``salted_join`` replicates the small side ``n_salts`` times instead of
broadcasting it: use when the build side exceeds driver/executor
broadcast limits but a hot probe key would overwhelm one reducer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = DEFAULT_SALTS,
    reaggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Two-phase aggregation with a random-ish salt on the shuffle key.

    ``aggs``: name → aggregate expression for phase 1 (per salted key).
    ``reaggs``: name → aggregate over the phase-1 column of that name
    for phase 2; defaults to ``F.sum(name)`` (correct for sum/count).
    Use e.g. ``F.min``/``F.max`` re-aggregates for min/max measures.

    Salt = ``pmod(monotonically_increasing_id(), n_salts)``: stable
    within a job, spreads each partition's rows round-robin. The salt
    distribution affects only load balance, never correctness."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1 (got {n_salts})")
    if "_salt" in df.columns:
        raise ValueError("salted_agg reserves the column name '_salt'; rename")
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).alias("_salt")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    if reaggs is None:
        reaggs = {name: F.sum(name) for name in aggs}
    return phase1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in reaggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys sprayed over ``n_salts``
    reducers and the small side replicated ``n_salts`` times.

    Equivalent to ``big.join(small, on, how)`` for row-level join
    semantics (each big row still matches each small row exactly
    once). Only ``inner`` and ``left`` make sense here; the replicated
    side must be the lookup side."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1 (got {n_salts})")
    if "_salt" in set(big.columns) | set(small.columns):
        raise ValueError("salted_join reserves the column name '_salt'; rename")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = list(on)
    big_salted = big.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    small_replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = big_salted.join(small_replicated, on + ["_salt"], how)
    return joined.drop("_salt")
