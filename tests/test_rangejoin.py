"""interval_overlap_join semantics: inclusive-end overlap, exactly-once
pair emission (the canonical-bin trick), and input validation."""

from __future__ import annotations

import pytest

from alternating_least_squares_spark.operators.rangejoin import (
    interval_overlap_join,
)


def _ivs(spark, rows, prefix):
    return spark.createDataFrame(
        rows, f"{prefix}_id long, {prefix}_start long, {prefix}_end long"
    )


def test_overlap_pairs_exact_and_emitted_once(spark):
    # touching endpoints (inclusive), containment, disjoint, and a
    # long interval spanning many bins (pair must appear ONCE even
    # though the sides share several bins)
    a = _ivs(spark, [(1, 0, 10), (2, 50, 60), (3, 100, 400)], "a")
    b = _ivs(
        spark,
        [(10, 10, 20), (11, 61, 70), (12, 150, 160), (13, 0, 500)],
        "b",
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            a, b, "a_start", "a_end", "b_start", "b_end", bin_width=7
        ).collect()
    )
    # brute-force truth: s_a <= e_b and s_b <= e_a
    assert got == [
        (1, 10),  # touch at 10 — inclusive
        (1, 13),
        (2, 13),
        (3, 12),  # containment
        (3, 13),  # long x long: shares ~50 bins, emitted once
    ]


def test_overlap_join_validates_inputs(spark):
    a = _ivs(spark, [(1, 0, 1)], "a")
    b = _ivs(spark, [(2, 0, 1)], "b")
    with pytest.raises(ValueError, match="bin_width"):
        interval_overlap_join(
            a, b, "a_start", "a_end", "b_start", "b_end", bin_width=0
        )
    with pytest.raises(ValueError, match="disjoint"):
        interval_overlap_join(
            a, a, "a_start", "a_end", "a_start", "a_end", bin_width=5
        )
    with pytest.raises(ValueError, match="_bin"):
        interval_overlap_join(
            a.withColumnRenamed("a_id", "_bin"),
            b,
            "a_start",
            "a_end",
            "b_start",
            "b_end",
            bin_width=5,
        )


def test_overlap_join_negative_domain(spark):
    """trunc-DIV binning must still generate the candidate when
    intervals straddle or sit below zero (monotone binning argument,
    pinned the way the pre-1970 parity tests pin time bucketing)."""
    a = _ivs(spark, [(1, -25, -10), (2, -5, 5)], "a")
    b = _ivs(spark, [(10, -12, -11), (11, 3, 30), (12, -100, -50)], "b")
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            a, b, "a_start", "a_end", "b_start", "b_end", bin_width=7
        ).collect()
    )
    assert got == [(1, 10), (2, 11)]


from hypothesis import given, settings, strategies as st

interval_set = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=8, deadline=None)
@given(a=interval_set, b=interval_set, w=st.integers(min_value=1, max_value=13))
def test_overlap_join_matches_brute_force(spark, a, b, w):
    """Any interval sets, any bin width: the binned join must produce
    EXACTLY the brute-force overlap pairs, each exactly once."""
    a_rows = [(i, s, s + d) for i, (s, d) in enumerate(a)]
    b_rows = [(i, s, s + d) for i, (s, d) in enumerate(b)]
    want = sorted(
        (ai, bi)
        for ai, as_, ae in a_rows
        for bi, bs, be in b_rows
        if as_ <= be and bs <= ae
    )
    adf = spark.createDataFrame(a_rows, "a_id long, a_start long, a_end long")
    bdf = spark.createDataFrame(b_rows, "b_id long, b_start long, b_end long")
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            adf, bdf, "a_start", "a_end", "b_start", "b_end", bin_width=w
        ).collect()
    )
    assert got == want
