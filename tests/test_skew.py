"""Salting correctness: salted two-phase aggregation and salted joins
must be result-identical to their unsalted forms on skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alternating_least_squares_spark.operators.skew import salted_agg, salted_join


@pytest.fixture
def skewed(spark):
    # one hot key (90% of rows) + a tail
    hot = spark.range(900).select(
        F.lit(7).alias("k"), (F.col("id") % 10).cast("double").alias("v")
    )
    tail = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.lit(1.0).alias("v")
    )
    return hot.unionByName(tail)


def test_salted_agg_equals_plain_agg(spark, skewed):
    plain = {
        r["k"]: (r["s"], r["n"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["n"], r["mx"])
        for r in salted_agg(
            skewed,
            ["k"],
            {"s": F.sum("v"), "n": F.count("*"), "mx": F.max("v")},
            n_salts=8,
            reaggs={"s": F.sum("s"), "n": F.sum("n"), "mx": F.max("mx")},
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(10)], "k long, name string"
    )
    plain = sorted(
        (r["k"], r["v"], r["name"])
        for r in skewed.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["name"])
        for r in salted_join(skewed, dim, ["k"], n_salts=4).collect()
    )
    assert salted == plain


def test_salted_left_join_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([(7, "hot")], "k long, name string")
    out = salted_join(skewed, dim, ["k"], n_salts=4, how="left")
    got = out.groupBy("name").count().collect()
    m = {r["name"]: r["count"] for r in got}
    assert m.get("hot") == 900 and m.get(None) == 100


def test_salted_join_rejects_right(spark, skewed):
    dim = spark.createDataFrame([(7, "hot")], "k long, name string")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skewed, dim, ["k"], how="right")
