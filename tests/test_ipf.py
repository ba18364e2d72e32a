"""IPF property tests (SURVEY.md §5.2): the invariants that define
correct Iterative Proportional Fitting, independent of any oracle.

Reference: converge at core.clj:99-119 (with the §0.3 loss fix)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alternating_least_squares_spark.operators import matrix as M
from alternating_least_squares_spark.operators.ipf import converge, _marginal_losses
from tests.conftest import coo_to_nested, vec_to_list


def test_row_pass_row_sums_equal_marginal(make_matrix, make_vector):
    """The defining invariant of the row pass (A15): after fitting rows
    to the x-marginal, row sums equal the marginal exactly."""
    seed = make_matrix([[1, 2, 3], [4, 5, 6]])
    x = make_vector([10, 20])
    fitted = M.optimize_marginal(x, seed)
    sums = vec_to_list(M.sum_rows(fitted))
    assert all(abs(a - b) < 1e-9 for a, b in zip(sums, [10.0, 20.0]))


def test_converge_rank1_seed_one_iteration(make_matrix, make_vector):
    """A rank-1 seed is already proportional → IPF converges in exactly
    one sweep with both losses ≈ 0 (SURVEY §5.2)."""
    x, y = make_vector([2, 4]), make_vector([3, 3])
    seed = M.seed_matrix(x, y)  # rank-1 outer product
    res = converge(x, y, seed, threshold=1e-12, max_iterations=50)
    assert res.iterations == 1
    assert res.loss < 1e-12
    assert res.y_loss < 1e-9


def test_converge_conservation_and_both_losses(make_matrix, make_vector):
    """Σmatrix == Σmarginal after convergence (reference README:7
    precondition propagated), and BOTH marginal losses are below
    threshold (fixing the reference's x-only check, SURVEY §0.3)."""
    x = make_vector([6, 14])
    y = make_vector([8, 12])
    seed = make_matrix([[1, 3], [5, 2]])
    res = converge(x, y, seed, threshold=1e-10, max_iterations=200)
    assert res.loss < 1e-6 and res.y_loss < 1e-6
    total = res.matrix.agg(F.sum("v")).first()[0]
    assert abs(total - 20.0) < 1e-9
    rows = vec_to_list(M.sum_rows(res.matrix))
    cols = vec_to_list(M.sum_cols(res.matrix))
    assert all(abs(a - b) < 1e-6 for a, b in zip(rows, [6.0, 14.0]))
    assert all(abs(a - b) < 1e-6 for a, b in zip(cols, [8.0, 12.0]))


def test_converge_rejects_mismatched_totals(make_matrix, make_vector):
    # core.clj:105 precondition: both marginals share a grand total
    with pytest.raises(ValueError, match="same total"):
        converge(
            make_vector([1, 2]),
            make_vector([100, 200]),
            make_matrix([[1, 1], [1, 1]]),
        )


def test_marginal_losses_count_unserved_ids(spark, make_vector):
    """Full-outer loss join: a marginal id with no matrix row must
    contribute its full residual (round-1 defect, VERDICT #5)."""
    m = spark.createDataFrame([(0, 0, 1.0)], "r long, c long, v double")
    x = make_vector([1.0, 5.0])  # id 1 absent from the matrix
    y = make_vector([1.0])
    x_loss, y_loss = _marginal_losses(m, x, y)
    assert x_loss == 5.0
    assert y_loss == 0.0


def test_converge_max_iterations_cap(make_matrix, make_vector):
    res = converge(
        make_vector([6, 14]),
        make_vector([8, 12]),
        make_matrix([[1, 3], [5, 2]]),
        threshold=0.0,  # unreachable → must stop on the cap
        max_iterations=3,
    )
    assert res.iterations == 3


def test_converge_dense_matches_coordinate(make_matrix, make_vector):
    """The bounded-column-domain loop (ipf_dense.converge_dense) is a
    layout change, not a semantics change: same iterations, same loss,
    same matrix as the coordinate-form converge."""
    from alternating_least_squares_spark.operators.ipf_dense import (
        converge_dense,
        from_row_arrays,
        to_row_arrays,
    )

    x = make_vector([10, 20, 30])
    y = make_vector([25, 35])
    seed = make_matrix([[1, 2], [3, 4], [5, 6]])
    r1 = converge(x, y, seed, threshold=1e-12, max_iterations=50)
    r2 = converge_dense(x, y, seed, threshold=1e-12, max_iterations=50)
    assert r2.iterations == r1.iterations
    assert abs(r2.loss - r1.loss) < 1e-12
    a = {(r["r"], r["c"]): r["v"] for r in r1.matrix.collect()}
    b = {(r["r"], r["c"]): r["v"] for r in r2.matrix.collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-9 for k in a)
    # round-trip helpers preserve the matrix exactly
    rt = from_row_arrays(to_row_arrays(seed, [0, 1]), [0, 1])
    c = {(r["r"], r["c"]): r["v"] for r in rt.collect()}
    assert c == {(r["r"], r["c"]): r["v"] for r in seed.collect()}


def test_converge_dense_rejects_mismatched_totals(make_matrix, make_vector):
    from alternating_least_squares_spark.operators.ipf_dense import converge_dense

    with pytest.raises(ValueError, match="same total"):
        converge_dense(
            make_vector([1, 2]),
            make_vector([100, 200]),
            make_matrix([[1, 1], [1, 1]]),
        )


def test_converge_dense_zero_row_stays_zero(make_matrix, make_vector):
    """An all-zero seed row can receive no mass: it must stay zero (no
    NaN flood), and the loop still fits the remaining rows."""
    from alternating_least_squares_spark.operators.ipf_dense import converge_dense

    seed = make_matrix([[1.0, 2.0], [0.0, 0.0], [3.0, 1.0]])
    x = make_vector([10.0, 0.0, 20.0])
    y = make_vector([14.0, 16.0])
    res = converge_dense(x, y, seed, threshold=1e-10, max_iterations=100)
    vals = {(r["r"], r["c"]): r["v"] for r in res.matrix.collect()}
    assert vals[(1, 0)] == 0.0 and vals[(1, 1)] == 0.0
    import math

    assert all(not math.isnan(v) for v in vals.values())
    assert abs(sum(vals.values()) - 30.0) < 1e-6


def test_converge_dense_matches_coordinate_on_real_data(spark):
    """Layout equivalence on the actual flagship inputs (sf0.001
    marginals + smoothed seed), not just literals: same matrix to
    1e-6 relative after 3 sweeps."""
    from alternating_least_squares_spark.operators.ipf_dense import converge_dense
    from alternating_least_squares_spark.plans import cost_allocation as CA
    from tests.conftest import SF_SMALL
    from pyspark.sql import functions as F

    x = CA.part_cost_marginal(spark, SF_SMALL).localCheckpoint(eager=True)
    x_total = x.agg(F.sum("v")).first()[0]
    y = CA.hour_cost_marginal(spark, SF_SMALL, rescale_to=x_total).localCheckpoint(
        eager=True
    )
    seed = CA.smoothed_seed_from(CA.visit_matrix(spark, SF_SMALL), x, y)
    r1 = converge(x, y, seed, threshold=0.0, max_iterations=3)
    r2 = converge_dense(x, y, seed, threshold=0.0, max_iterations=3)
    a = {(r["r"], r["c"]): r["v"] for r in r1.matrix.collect()}
    b = {(r["r"], r["c"]): r["v"] for r in r2.matrix.collect()}
    assert a.keys() == b.keys() and len(a) > 1000
    worst = max(abs(a[k] - b[k]) / max(abs(a[k]), 1e-12) for k in a)
    assert worst < 1e-6, worst


def test_converge_dense_result_plan_is_shuffle_free(make_matrix, make_vector):
    """The dense loop's whole point: after the single setup shuffle is
    pinned by localCheckpoint, everything downstream — every sweep and
    the final coordinate expansion — is narrow. The result matrix's
    physical plan must therefore contain no Exchange."""
    from alternating_least_squares_spark.operators.ipf_dense import (
        converge_dense,
    )

    seed = make_matrix([[1.0, 2.0], [3.0, 4.0]])
    x = make_vector([3.0, 7.0])
    y = make_vector([4.0, 6.0])
    res = converge_dense(x, y, seed, threshold=1e-12, max_iterations=20)
    plan = res.matrix._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_converge_dense_ignores_out_of_domain_seed_columns(spark):
    """Seed cells whose column id is absent from the y-marginal are
    IGNORED per the documented contract — previously the NULL map
    position crashed the whole flagship with NULL_MAP_KEY whenever an
    hour had no event value (zero-value hours are filtered from y)."""
    from alternating_least_squares_spark.operators.ipf_dense import converge_dense

    x = spark.createDataFrame([(1, 6.0), (2, 6.0)], "id long, v double")
    y = spark.createDataFrame([(0, 8.0), (1, 4.0)], "id long, v double")
    # column 23 exists in the seed but not in y — must be dropped
    seed = spark.createDataFrame(
        [(1, 0, 1.0), (1, 1, 1.0), (1, 23, 99.0), (2, 0, 1.0), (2, 1, 1.0)],
        "r long, c long, v double",
    )
    res = converge_dense(x, y, seed, threshold=1e-12, max_iterations=50)
    cells = {(r["r"], r["c"]): r["v"] for r in res.matrix.collect()}
    assert set(c for _, c in cells) == {0, 1}
    assert abs(sum(cells.values()) - 12.0) < 1e-9


def test_converge_empty_marginal_raises_value_error(spark):
    """An empty marginal must raise the precondition ValueError, not
    TypeError from abs(None)."""
    import pytest
    from alternating_least_squares_spark.operators.ipf import converge
    from alternating_least_squares_spark.operators.ipf_dense import converge_dense

    empty = spark.createDataFrame([], "id long, v double")
    x = spark.createDataFrame([(1, 1.0)], "id long, v double")
    seed = spark.createDataFrame([(1, 0, 1.0)], "r long, c long, v double")
    with pytest.raises(ValueError, match="empty marginal"):
        converge(x, empty, seed)
    with pytest.raises(ValueError, match="empty marginal"):
        converge_dense(x, empty, seed)


def test_converge_threshold_zero_runs_exact_iteration_count(spark):
    """threshold=0 disables both data-dependent stop criteria (loss <
    threshold and plateau), so the loop runs exactly max_iterations —
    the determinism contract the a21 oracle entry relies on."""
    from alternating_least_squares_spark.operators.ipf import converge

    x = spark.createDataFrame([(0, 4.0), (1, 8.0)], "id long, v double")
    y = spark.createDataFrame([(0, 9.0), (1, 3.0)], "id long, v double")
    seed = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, 1.0), (1, 0, 2.0), (1, 1, 1.0)],
        "r long, c long, v double",
    )
    res = converge(x, y, seed, threshold=0.0, max_iterations=3)
    assert res.iterations == 3


def test_converge_single_cell_rows_fixed_point(spark):
    """The a21 fixture shape — one cell per row key — reaches its fixed
    point after one sweep: the row pass is (v/v)*x = x exactly, so
    sweep 2 reproduces sweep 1's output bit-for-bit."""
    from alternating_least_squares_spark.operators.ipf import converge

    x = spark.createDataFrame(
        [(1, 4.0), (2, 8.0), (3, 6.0)], "id long, v double"
    )
    y = spark.createDataFrame([(0, 11.0), (1, 7.0)], "id long, v double")
    # c = r % 2: one cell per row key
    seed = spark.createDataFrame(
        [(1, 1, 3.0), (2, 0, 5.0), (3, 1, 2.0)], "r long, c long, v double"
    )
    one = converge(x, y, seed, threshold=0.0, max_iterations=1)
    two = converge(x, y, seed, threshold=0.0, max_iterations=2)
    c1 = {(r["r"], r["c"]): r["v"] for r in one.matrix.collect()}
    c2 = {(r["r"], r["c"]): r["v"] for r in two.matrix.collect()}
    assert c1 == c2  # exact equality, not approx


def test_cost_per_visit_fixed_chain_invariants(spark):
    """The flagship's deterministic fixed-sweep twin (round-5 oracle
    entry): dense domain coverage, micro-unit conservation after the
    closing column pass, and the C10 zero-guard on the finale."""
    from alternating_least_squares_spark.plans import cost_allocation as CA
    from tests.conftest import SF_SMALL
    from pyspark.sql import functions as F

    df = CA.cost_per_visit_fixed(spark, SF_SMALL, sweeps=2).localCheckpoint()
    n_parts = df.select("part").distinct().count()
    n_hours = df.select("hour").distinct().count()
    assert df.count() == n_parts * n_hours  # dense x-parts × y-hours grid

    # conservation: the last half-sweep fits columns to the rescaled y
    # marginal, whose total is floor-rescaled to x_total. Every floor
    # loses < 1 µunit per cell, so Σcost is within (cells + hours) µ of
    # the x grand total.
    li = CA.load_table(spark, SF_SMALL, "lineitem")
    x_total = li.select(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6)
            )
        ).alias("t")
    ).first()["t"]
    got = df.agg(F.sum("cost_us")).first()[0]
    slack = df.count() + n_hours + 1
    assert abs(got - x_total) <= slack, (got, x_total, slack)

    # finale zero-guard + floor-division contract, all rows
    bad = df.filter(
        (
            (F.col("visits") == 0) & (F.col("cost_per_visit_us") != 0)
        )
        | (
            (F.col("visits") > 0)
            & (
                F.col("cost_per_visit_us")
                != F.floor(
                    F.col("cost_us").cast("double")
                    / F.col("visits").cast("double")
                )
            )
        )
    ).count()
    assert bad == 0


def test_rake3_matches_python_reference_and_converges(spark):
    """a22 (3-way raking): the distributed fixed-sweep rake must equal
    a sequential Python replay of the same micro-unit arithmetic cell
    for cell, and each full sweep must shrink the total marginal
    residual (IPF's defining property on a consistent marginal set)."""
    import math
    from collections import defaultdict

    from alternating_least_squares_spark import registry as R
    from alternating_least_squares_spark.registry import (
        RAKE3_AXES,
        RAKE3_SWEEPS,
    )
    from tests.conftest import SF_SMALL

    base = [
        (r["flag"], r["status"], r["ship_month"], r["qty"])
        for r in R.load_table(spark, SF_SMALL, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_linestatus").alias("status"),
            F.month("l_shipdate").cast("long").alias("ship_month"),
            F.col("l_quantity").alias("qty"),
        )
        .collect()
    ]
    cells: dict = defaultdict(int)
    marg: dict = {a: defaultdict(float) for a in RAKE3_AXES}
    for f, s, m, q in base:
        cells[(f, s, m)] += 1_000_000
        marg["flag"][f] += q
        marg["status"][s] += q
        marg["ship_month"][m] += q
    m_us = {
        a: {k: math.floor(v * 1e6) for k, v in marg[a].items()}
        for a in RAKE3_AXES
    }

    def resid(cc):
        tot = 0.0
        for i, a in enumerate(RAKE3_AXES):
            sums: dict = defaultdict(int)
            for key, v in cc.items():
                sums[key[i]] += v
            tot += sum(abs(sums[k] - m_us[a][k]) for k in m_us[a])
        return tot

    history = [resid(cells)]
    for _ in range(RAKE3_SWEEPS):
        for i, a in enumerate(RAKE3_AXES):
            sums = defaultdict(int)
            for key, v in cells.items():
                sums[key[i]] += v
            cells = {
                key: (
                    0 if sums[key[i]] == 0
                    else math.floor(v / sums[key[i]] * m_us[a][key[i]])
                )
                for key, v in cells.items()
            }
        history.append(resid(cells))

    got = {
        (r["flag"], r["status"], r["ship_month"]): r["v_us"]
        for r in R.q_a22_rake3(spark, SF_SMALL).collect()
    }
    assert got == dict(cells)
    # every full sweep strictly shrinks the summed |marginal residual|
    assert all(b < a for a, b in zip(history, history[1:])), history


from hypothesis import given, settings, strategies as st

_rake_cells = st.dictionaries(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=2),
    ),
    st.integers(min_value=0, max_value=50),
    min_size=1,
    max_size=12,
)
_rake_marg = st.lists(
    st.integers(min_value=0, max_value=500), min_size=9, max_size=9
)


@settings(max_examples=8, deadline=None)
@given(raw=_rake_cells, margs=_rake_marg, sweeps=st.integers(1, 3))
def test_rake_fixed_matches_sequential_replay(spark, raw, margs, sweeps):
    """Property test for the generic N-way raking operator: on ANY
    random 3-axis tensor (zero cells, zero slices, missing keys,
    inconsistent marginals — a fixed sweep is well-defined for all of
    them) the distributed result equals a sequential micro-unit
    replay, cell for cell."""
    import math
    from collections import defaultdict

    from alternating_least_squares_spark.operators.ipf import rake_fixed

    axes = ("a0", "a1", "a2")
    cells = {k: v * 1_000_000 for k, v in raw.items()}
    m_us = {
        ax: {k: margs[i * 3 + k] * 1_000_000 for k in range(3)}
        for i, ax in enumerate(axes)
    }

    want = dict(cells)
    for _ in range(sweeps):
        for i, ax in enumerate(axes):
            sums: dict = defaultdict(int)
            for key, v in want.items():
                sums[key[i]] += v
            want = {
                key: (
                    0 if sums[key[i]] == 0
                    else math.floor(v / sums[key[i]] * m_us[ax][key[i]])
                )
                for key, v in want.items()
            }

    cdf = spark.createDataFrame(
        [(k[0], k[1], k[2], v) for k, v in cells.items()],
        "a0 long, a1 long, a2 long, v_us long",
    )
    mdfs = [
        (
            ax,
            spark.createDataFrame(
                [(k, m_us[ax][k]) for k in range(3)],
                f"{ax} long, m_us long",
            ),
        )
        for ax in axes
    ]
    got = {
        (r["a0"], r["a1"], r["a2"]): r["v_us"]
        for r in rake_fixed(cdf, mdfs, sweeps).collect()
    }
    assert got == want


def test_rake_fixed_rejects_missing_or_mistyped_v_us(spark):
    """ADVICE r11: a cells frame without the required v_us long column
    must fail at the validation boundary with a ValueError naming the
    contract, not three joins deep with an AnalysisException."""
    import pytest

    from alternating_least_squares_spark.operators.ipf import rake_fixed

    m = spark.createDataFrame([(0, 10)], "ax: long, m_us: long")
    no_v = spark.createDataFrame([(0,)], "ax: long")
    with pytest.raises(ValueError, match="v_us"):
        rake_fixed(no_v, [("ax", m)], sweeps=1)
    bad_type = spark.createDataFrame([(0, 1.5)], "ax: long, v_us: double")
    with pytest.raises(ValueError, match="integral"):
        rake_fixed(bad_type, [("ax", m)], sweeps=1)
    # integer widths are interchangeable (repo type discipline) — an
    # int-typed mass column must NOT be rejected
    ok_int = spark.createDataFrame([(0, 5)], "ax: long, v_us: int")
    assert rake_fixed(ok_int, [("ax", m)], sweeps=1).count() == 1
