"""Shuffle-free IPF for matrices with a BOUNDED column domain.

The generic :mod:`~alternating_least_squares_spark.operators.ipf`
loop works on coordinate matrices of any shape — each sweep costs a
window shuffle per pass plus join shuffles for the loss. When one
dimension is small and bounded (the flagship's hour-of-day axis:
≤ 24 values; reference ``resources/hours.csv`` has exactly 24 rows),
there is a strictly better layout: **one array row per matrix row**,
``(r: long, x: double, vals: array<double>)``, with the y-marginal
held on the driver as plan literals.

Per sweep this layout costs:

* **row pass** — ``vals[p] * x / Σvals``: a narrow ``transform`` over
  the cached rows. No shuffle.
* **column pass** — column sums are one ``agg`` of ``n_cols`` partial
  sums (map-side combine, a single scalar-row collect), then
  ``vals[p] * y[p]/colsum[p]`` with literal factors. No shuffle.
* **loss** — ‖x − rowsums‖ folded into the next sweep's aggregate.

At 100 TB / 10⁹ rows this is the plan you want: the row dimension
stays partitioned and untouched across the whole loop, executors
exchange exactly ``n_cols`` doubles per sweep, and every expression is
native ``F.*`` inside codegen. The coordinate loop by contrast
re-shuffles the full matrix 4× per sweep.

Semantics are identical to :func:`ipf.converge` (both-marginal
post-step loss, same stop criteria); ``tests/test_ipf.py`` asserts the
two agree on literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alternating_least_squares_spark.operators import matrix as M
from alternating_least_squares_spark.operators.ipf import IPFResult

# Refuse to hold more than this many column-marginal entries on the
# driver; beyond it the coordinate-form `ipf.converge` is the right
# tool (its shuffles are unavoidable for two unbounded dimensions).
MAX_DRIVER_COLS = 100_000


def _array_sum(vals) -> F.Column:
    return F.aggregate(vals, F.lit(0.0), lambda acc, v: acc + v)


def to_row_arrays(matrix: DataFrame, col_ids: list[int]) -> DataFrame:
    """Coordinate ``(r, c, v)`` → ``(r, vals)`` with ``vals[p]`` the
    value at column ``col_ids[p]`` (missing cells = 0.0). One groupBy
    shuffle — paid once, not per sweep."""
    pos = F.map_from_arrays(
        F.array(*[F.lit(int(c)) for c in col_ids]),
        F.array(*[F.lit(p) for p in range(len(col_ids))]),
    )
    return (
        matrix.withColumn("_p", F.try_element_at(pos, F.col(M.C).cast("long")))
        .groupBy(M.R)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_p"), F.col(M.V)))
            ).alias("_m")
        )
        .select(
            M.R,
            F.transform(
                F.sequence(F.lit(0), F.lit(len(col_ids) - 1)),
                lambda p: F.coalesce(
                    F.try_element_at(F.col("_m"), p), F.lit(0.0)
                ),
            ).alias("vals"),
        )
    )


def from_row_arrays(rows: DataFrame, col_ids: list[int]) -> DataFrame:
    """``(r, vals)`` → coordinate ``(r, c, v)``. Narrow generator."""
    ids = F.array(*[F.lit(c) for c in col_ids])
    return rows.select(
        M.R, F.posexplode("vals").alias("_p", M.V)
    ).select(M.R, F.element_at(ids, F.col("_p") + 1).alias(M.C), M.V)


def converge_dense(
    x_marginal: DataFrame,
    y_marginal: DataFrame,
    seed: DataFrame,
    threshold: float = 1e-15,
    max_iterations: int = 1000,
    verbose: bool = False,
) -> IPFResult:
    """IPF with the column marginal as driver-side literals.

    Same contract as :func:`ipf.converge` (reference ``converge``,
    ``core.clj:99-119``, with the SURVEY §0.3 fixes: post-step loss,
    both marginals tracked). Requires the seed's column domain to be
    exactly the y-marginal's id set (the densify contract —
    :func:`plans.cost_allocation.smoothed_seed_from` guarantees it).
    """
    y_rows = y_marginal.select(M.ID, M.V).collect()
    if len(y_rows) > MAX_DRIVER_COLS:
        raise ValueError(
            f"y marginal has {len(y_rows)} entries (> {MAX_DRIVER_COLS}); "
            "use ipf.converge for unbounded column domains"
        )
    y_rows.sort(key=lambda row: row[M.ID])
    col_ids = [row[M.ID] for row in y_rows]
    y_vals = [float(row[M.V]) for row in y_rows]
    n = len(col_ids)

    x_total = x_marginal.agg(F.sum(M.V)).first()[0]
    y_total = sum(y_vals)
    scale = max(abs(x_total), abs(y_total), 1.0)
    if abs(x_total - y_total) / scale > 1e-6:
        raise ValueError(
            f"marginals must sum to the same total (x={x_total}, y={y_total}); "
            "see reference README:7"
        )

    # State carries the row sum as a MATERIALIZED column (`_rsum`).
    # Higher-order functions (transform/aggregate lambdas) are
    # interpreted, not codegen'd, and Catalyst inlines a projected
    # expression into every use site — so if the row sum stays an
    # expression it gets re-evaluated per array ELEMENT inside the
    # row-pass lambda (~n² interpreted ops per row per sweep).
    # Computing it once at checkpoint time makes each sweep O(n) per
    # row: measured 4 s/sweep → <1 s/sweep on the sf0.1 flagship.
    # Repartition by row id to the cluster's parallelism: AQE would
    # otherwise coalesce a small state to ONE partition and every
    # sweep's per-row work (interpreted transform/zip_with lambdas)
    # would run single-threaded. localCheckpoint pins this layout, and
    # all later sweeps are narrow, so the hash layout survives the
    # whole loop — this one shuffle is the loop's only one.
    spark = seed.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    state = (
        to_row_arrays(seed, col_ids)
        .join(x_marginal.select(F.col(M.ID).alias(M.R), F.col(M.V).alias("_x")), M.R)
        .select(M.R, "_x", "vals", _array_sum(F.col("vals")).alias("_rsum"))
        .repartition(n_parts, M.R)
        .localCheckpoint(eager=True)
    )

    # Two Spark jobs per sweep: (1) one fused aggregate over the
    # current state computing BOTH the column sums of the row-scaled
    # matrix (needed for this sweep's column pass) and the post-step
    # x-loss of the PREVIOUS sweep's matrix (needed for the stop
    # check) — the stop check therefore runs before any work on the
    # next sweep is done; (2) the eager checkpoint materializing the
    # new state.
    loss = float("inf")
    y_loss = float("inf")
    iteration = 0
    while True:
        # all-zero row guard: an unsmoothed seed row has rowsum 0 and
        # naive v*x/0 would flood the matrix with NaN; such a row can
        # receive no mass, so it stays zero (same convention as the
        # column factors below)
        rowsum = F.col("_rsum")
        row_scaled = F.when(
            rowsum != 0,
            F.transform(F.col("vals"), lambda v: v * F.col("_x") / rowsum),
        ).otherwise(F.col("vals"))
        # Project row_scaled ONCE per row, then aggregate element_at
        # reads of the materialized array. Aggregate-over-Project is
        # not collapsed by Catalyst, so the transform lambda runs once
        # per row instead of once per column-sum aggregate.
        agg_row = (
            state.select(
                F.pow(F.col("_x") - rowsum, F.lit(2)).alias("_xt"),
                row_scaled.alias("_rs"),
            )
            .agg(
                F.sqrt(F.sum("_xt")).alias("_xloss"),
                *[
                    F.sum(F.element_at(F.col("_rs"), p + 1)).alias(f"c{p}")
                    for p in range(n)
                ],
            )
            .first()
        )
        if iteration > 0:
            # agg_row["_xloss"] is the post-step loss of the matrix in
            # `state` (= sweep `iteration`'s result) — SURVEY §0.3 fix.
            new_loss = agg_row["_xloss"]
            plateaued = abs(loss - new_loss) < threshold
            loss = new_loss
            if verbose:
                print(
                    f"ipf-dense iteration={iteration} x_loss={loss} y_loss={y_loss}"
                )
            if loss < threshold or plateaued or iteration >= max_iterations:
                break
        colsums = [agg_row[f"c{p}"] for p in range(n)]
        factors = [
            y_vals[p] / colsums[p] if colsums[p] else 0.0 for p in range(n)
        ]
        # y-residual is exact arithmetic given the column sums: the
        # column pass lands each column on y[p] up to one multiply.
        y_loss = (
            sum((y_vals[p] - colsums[p] * factors[p]) ** 2 for p in range(n))
            ** 0.5
        )
        # Inject the factors as broadcast DATA, not literals: the plan
        # (and the generated whole-stage code) is then byte-identical
        # across sweeps, so Janino compiles the sweep stage once and
        # every later sweep hits the codegen cache. With literal
        # factors each sweep paid a fresh ~0.5 s compile.
        factors_df = state.sparkSession.createDataFrame(
            [(factors,)], "_f: array<double>"
        )
        col_scaled = F.zip_with(row_scaled, F.col("_f"), lambda v, f: v * f)
        # col_scaled is inlined twice here (vals + its row sum) — two
        # O(n) interpreted evals per row, paid once at checkpoint
        # materialization; the savings show up in the sweep aggregate.
        state = (
            state.crossJoin(F.broadcast(factors_df))
            .select(
                M.R,
                "_x",
                col_scaled.alias("vals"),
                _array_sum(col_scaled).alias("_rsum"),
            )
            .localCheckpoint(eager=True)
        )
        iteration += 1

    return IPFResult(
        matrix=from_row_arrays(state.select(M.R, "vals"), col_ids),
        loss=loss,
        y_loss=y_loss,
        iterations=iteration,
    )
