"""Property tests (hypothesis) for the round-4 window-algebra queries:
the SCD2 history build and OHLC bars must match brute-force Python
reconstructions on arbitrary change feeds / tick streams — same-ts
duplicates, single-row keys, all-equal values, the edges literal
fixtures miss."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

SETTINGS = settings(max_examples=8, deadline=None)

# (key, ts, attr) change events; small domains force collisions
feed = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=6),
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=1,
    max_size=14,
)


def _scd2_brute(rows):
    """rows: (key, ts, attr, seq) with seq the tie-break (higher
    wins within a ts). Returns {(key, attr, valid_from, valid_to,
    is_current)}."""
    out = set()
    for k in {r[0] for r in rows}:
        evs = [r for r in rows if r[0] == k]
        # latest seq per ts
        by_ts = {}
        for _, ts, attr, seq in evs:
            if ts not in by_ts or seq > by_ts[ts][1]:
                by_ts[ts] = (attr, seq)
        seq_rows = sorted((ts, attr) for ts, (attr, _) in by_ts.items())
        # collapse runs
        changes = [
            (ts, attr)
            for i, (ts, attr) in enumerate(seq_rows)
            if i == 0 or seq_rows[i - 1][1] != attr
        ]
        for i, (ts, attr) in enumerate(changes):
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            out.add((k, attr, ts, nxt, nxt is None))
    return out


@SETTINGS
@given(rows=feed)
def test_scd2_matches_brute_force(spark, rows):
    data = [(k, ts, attr, i) for i, (k, ts, attr) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "o_custkey long, o_orderdate long, o_orderpriority string, "
        "o_orderkey long"
    )
    # same algebra as q_c16_scd2, parameterized over this tiny frame
    w_day = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey")
    )
    latest = (
        df.withColumn("_rn", F.row_number().over(w_day))
        .filter(F.col("_rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderpriority")
    )
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    changes = latest.withColumn(
        "_prev", F.lag("o_orderpriority").over(w_seq)
    ).filter(
        F.col("_prev").isNull()
        | (F.col("_prev") != F.col("o_orderpriority"))
    )
    got = {
        (r["o_custkey"], r["o_orderpriority"], r["valid_from"],
         r["valid_to"], r["valid_to"] is None)
        for r in changes.select(
            "o_custkey",
            "o_orderpriority",
            F.col("o_orderdate").alias("valid_from"),
            F.lead("o_orderdate").over(w_seq).alias("valid_to"),
        ).collect()
    }
    assert got == _scd2_brute(data)


ticks = st.lists(
    st.tuples(
        # negative timestamps INCLUDED: the production bucketing is
        # _floor_div precisely because trunc-vs-floor diverges
        # pre-1970 — the test must be able to catch a trunc regression
        st.integers(min_value=-8, max_value=9),  # ts
        st.integers(min_value=-5, max_value=5),  # value
    ),
    min_size=1,
    max_size=16,
)


@SETTINGS
@given(rows=ticks, bucket=st.integers(min_value=1, max_value=4))
def test_ohlc_matches_brute_force(spark, rows, bucket):
    from alternating_least_squares_spark.registry import _floor_div

    data = [(i, ts, float(v)) for i, (ts, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "event_id long, ts long, value double")
    w_open = Window.partitionBy("b").orderBy(F.asc("ts"), F.asc("event_id"))
    w_close = Window.partitionBy("b").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = (
        # the SAME bucketing expression q_e08_ohlc_bars uses
        df.withColumn("b", F.expr(_floor_div("ts", bucket)))
        .withColumn("_o", F.row_number().over(w_open))
        .withColumn("_c", F.row_number().over(w_close))
    )
    got = {
        (r["b"], r["open"], r["high"], r["low"], r["close"], r["n"])
        for r in ranked.groupBy("b")
        .agg(
            F.max(F.when(F.col("_o") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("_c") == 1, F.col("value"))).alias("close"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    want = set()
    for b in {ts // bucket for _, ts, _ in data}:
        evs = sorted(
            (ts, i, v) for i, ts, v in data if ts // bucket == b
        )
        vals = [v for _, _, v in evs]
        want.add(
            (b, evs[0][2], max(vals), min(vals), evs[-1][2], len(evs))
        )
    assert got == want
