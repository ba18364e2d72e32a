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


# ---------------------------------------------------------------------------
# Hot-key behavior of the window-based operators (as-of join,
# sessionize, sequence packing). A window partitioned on a key puts
# EVERY row of a hot key into one reducer's sort — correctness never
# degrades (asserted here on 90-99% hot fixtures), but that one
# partition serializes. Mitigation recipe when a real hot key appears:
# pre-split the key with a salt on a coarser unit (salted_agg pattern
# above / operators/skew.py) or sub-partition the window by a bucketed
# time range, then merge. The operators' docstrings cross-reference
# this section.


def test_asof_join_correct_under_hot_key(spark):
    """99% of left rows share one key; results must equal the
    per-row latest-quote-at-or-before semantics computed directly."""
    from alternating_least_squares_spark.operators.asof import asof_join

    left = spark.range(990).select(
        F.lit(7).alias("k"), (F.col("id") * 10).alias("ts")
    ).unionByName(
        spark.range(10).select(
            (F.col("id") % 2).alias("k"), (F.col("id") * 100).alias("ts")
        )
    )
    # quotes every 1000 ticks for the hot key, one early quote for key 0
    right = spark.range(10).select(
        F.lit(7).alias("k"),
        (F.col("id") * 1000).alias("ts"),
        (F.col("id") * 1000).cast("double").alias("px"),
    ).unionByName(
        spark.createDataFrame([(0, 0, -1.0)], "k long, ts long, px double")
    )
    out = asof_join(left, right, key="k", ts="ts").collect()
    assert len(out) == 1000
    for r in out:
        if r["k"] == 7:
            assert r["px_asof"] == float(r["ts"] // 1000 * 1000), r
        elif r["k"] == 0:
            assert r["px_asof"] == -1.0, r
        else:  # k=1: no right rows at all
            assert r["px_asof"] is None, r


def _write_skewed_events(tmp_path) -> str:
    """events.parquet in the catalog layout: one hot user (95% of
    rows, 4 sessions split by >30-min gaps) + 5 tail users."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    eid = 0
    base = 1_700_000_000_000_000  # epoch micros
    for s in range(4):  # hot user: 4 sessions x 475 events, 60 s apart
        for i in range(475):
            # block spacing (40,000 s) > session span (475*60 s) + gap
            ts = base + s * 40_000_000_000 + i * 60_000_000
            rows.append((eid, ts, 7, "view", 1.0, "{}"))
            eid += 1
    for u in range(5):  # tail users: 20 events, one per hour => 20 sessions
        for i in range(20):
            rows.append((eid, base + i * 3_600_000_000, 100 + u, "view", 1.0, "{}"))
            eid += 1
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_sessionize_correct_under_hot_user(spark, tmp_path):
    """A user holding 95% of all events still sessionizes exactly:
    4 sessions of 475 events (60 s spacing, >30 min between groups),
    while tail users get one session per hourly event."""
    from alternating_least_squares_spark.registry import q_e03_sessionize

    sf_dir = _write_skewed_events(tmp_path)
    rows = q_e03_sessionize(spark, sf_dir).collect()
    hot = [r for r in rows if r["user_id"] == 7]
    assert len(hot) == 4
    assert all(r["n_events"] == 475 for r in hot)
    for u in range(5):
        tail = [r for r in rows if r["user_id"] == 100 + u]
        assert len(tail) == 20
        assert all(r["n_events"] == 1 for r in tail)


def test_sequence_packing_correct_under_hot_source(spark, tmp_path):
    """One source shard holding 95% of documents packs exactly like
    the python reference offset computation (shard-local cumsum in
    doc_id order, bin = offset // capacity)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from alternating_least_squares_spark.registry import (
        PACK_CTX,
        q_t13_sequence_packing,
    )

    docs = []
    for i in range(95):  # hot shard: ~700 tokens per doc
        docs.append((i, " ".join(["w"] * (700 + i % 13)), "en", "hot"))
    for i in range(5):
        docs.append((95 + i, " ".join(["w"] * 100), "en", "tail"))
    table = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array([d[2] for d in docs], pa.string()),
            "source": pa.array([d[3] for d in docs], pa.string()),
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: (r["source"], r["n_tokens"], r["offset"], r["bin_id"])
        for r in q_t13_sequence_packing(spark, str(tmp_path)).collect()
    }
    offsets = {"hot": 0, "tail": 0}
    for doc_id, text, _lang, source in docs:
        n = len(text.split())
        exp = (source, n, offsets[source], offsets[source] // PACK_CTX)
        assert got[doc_id] == exp, (doc_id, got[doc_id], exp)
        offsets[source] += n
