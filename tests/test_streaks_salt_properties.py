"""Property tests (hypothesis): gaps-and-islands streaks vs a brute
force reconstruction, and the skew-salting operators' result
equivalence with their unsalted forms on arbitrary (including
degenerate single-key) data."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from alternating_least_squares_spark.operators.skew import (
    salted_agg,
    salted_join,
)

SETTINGS = settings(max_examples=8, deadline=None)

activity = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # user
        st.integers(min_value=-3, max_value=12),  # day (can be negative)
    ),
    min_size=1,
    max_size=20,
)


def _streaks_brute(pairs):
    out = {}
    for u in {u for u, _ in pairs}:
        days = sorted({d for uu, d in pairs if uu == u})
        runs, cur = [], 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        out[u] = (max(runs), len(runs), len(days))
    return out


@SETTINGS
@given(pairs=activity)
def test_streaks_match_brute_force(spark, pairs):
    df = spark.createDataFrame(pairs, "user_id long, day long").distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    got = {
        r["user_id"]: (r["longest"], r["n"], r["total"])
        for r in df.withColumn("_g", F.col("day") - F.row_number().over(w))
        .groupBy("user_id", "_g")
        .agg(F.count("*").alias("_len"))
        .groupBy("user_id")
        .agg(
            F.max("_len").alias("longest"),
            F.count("*").alias("n"),
            F.sum("_len").alias("total"),
        )
        .collect()
    }
    assert got == _streaks_brute(pairs)


skewed_rows = st.lists(
    st.tuples(
        # key 0 dominates: the hot-key shape salting exists for
        st.sampled_from([0, 0, 0, 0, 1, 2]),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(rows=skewed_rows, n_salts=st.integers(min_value=1, max_value=5))
def test_salted_agg_equals_plain_agg(spark, rows, n_salts):
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        (r["k"], r["s"], r["n"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {"s": F.sum("v"), "n": F.count("*"), "mx": F.max("v")},
            n_salts=n_salts,
            reaggs={"s": F.sum("s"), "n": F.sum("n"), "mx": F.max("mx")},
        ).collect()
    }
    want = {
        (r["k"], r["s"], r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"),
             F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


lookup_rows = st.lists(
    st.tuples(st.sampled_from([0, 1, 2, 3]), st.text(
        alphabet="xyz", min_size=1, max_size=2)),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],  # one row per key: the lookup contract
)


@SETTINGS
@given(big=skewed_rows, small=lookup_rows,
       n_salts=st.integers(min_value=1, max_value=4))
def test_salted_join_equals_plain_join(spark, big, small, n_salts):
    b = spark.createDataFrame(big, "k long, v long")
    s = spark.createDataFrame(small, "k long, tag string")
    got = sorted(
        (r["k"], r["v"], r["tag"])
        for r in salted_join(b, s, ["k"], n_salts=n_salts).collect()
    )
    want = sorted(
        (r["k"], r["v"], r["tag"]) for r in b.join(s, "k").collect()
    )
    assert got == want
