"""Property-based invariants (hypothesis) for the matrix operators:
algebraic laws that must hold for ANY input, not just the literal
fixtures. Example counts are kept small — each example is a real
Spark job."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from alternating_least_squares_spark.operators import matrix as M

SETTINGS = settings(max_examples=5, deadline=None)

pos_matrix = st.lists(
    st.lists(
        st.floats(min_value=0.1, max_value=100.0, allow_nan=False),
        min_size=2,
        max_size=4,
    ),
    min_size=2,
    max_size=4,
).filter(lambda rows: len({len(r) for r in rows}) == 1)


def _to_df(spark, rows):
    data = [
        (r, c, float(v)) for r, row in enumerate(rows) for c, v in enumerate(row)
    ]
    return spark.createDataFrame(data, "r long, c long, v double")


@SETTINGS
@given(rows=pos_matrix)
def test_transpose_is_involutive(spark, rows):
    m = _to_df(spark, rows)
    twice = M.transpose(M.transpose(m))
    assert {(r["r"], r["c"], r["v"]) for r in twice.collect()} == {
        (r["r"], r["c"], r["v"]) for r in m.collect()
    }


@SETTINGS
@given(rows=pos_matrix)
def test_weight_matrix_rows_sum_to_one(spark, rows):
    w = M.sum_rows(M.weight_matrix(_to_df(spark, rows)))
    assert all(abs(r["v"] - 1.0) < 1e-9 for r in w.collect())


@SETTINGS
@given(rows=pos_matrix)
def test_transpose_swaps_row_and_col_sums(spark, rows):
    m = _to_df(spark, rows)
    rs = {r["id"]: r["v"] for r in M.sum_rows(m).collect()}
    cs_t = {r["id"]: r["v"] for r in M.sum_cols(M.transpose(m)).collect()}
    assert rs == cs_t


@SETTINGS
@given(rows=pos_matrix)
def test_optimize_marginal_hits_target_rows(spark, rows):
    """The defining row-pass property for arbitrary positive matrices:
    after fitting, row sums equal the target marginal."""
    m = _to_df(spark, rows)
    target = [(i, float(10 + 3 * i)) for i in range(len(rows))]
    marg = spark.createDataFrame(target, "id long, v double")
    fitted = M.optimize_marginal(marg, m)
    got = {r["id"]: r["v"] for r in M.sum_rows(fitted).collect()}
    assert all(abs(got[i] - v) < 1e-8 for i, v in target)
