"""w08 bounded-horizon EWMA: hand-computed fixture (VERDICT r6 #2) and
the registry no-dead-query lint that would have caught w08's original
unregistered state."""

from __future__ import annotations

import datetime
import inspect
import re

import pytest
from pyspark.sql import functions as F

from alternating_least_squares_spark import registry


def _events_dir(spark, tmp_path, rows):
    """Write a tiny events.parquet in the testdata column layout."""
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    out = str(tmp_path / "w08_events")
    df.coalesce(1).write.parquet(out + "/events.parquet")
    return out


def test_w08_hand_computed(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: values 1, 2, 4 — α=0.5 renormalized over history
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + datetime.timedelta(seconds=1), 1, "view", 2.0, "{}"),
        (3, t0 + datetime.timedelta(seconds=2), 1, "view", 4.0, "{}"),
    ] + [
        # user 2: nine constant values — n_hist saturates at 8, ewma
        # stays exactly 1.0 (renormalization makes constants a fixed
        # point regardless of horizon truncation)
        (10 + k, t0 + datetime.timedelta(seconds=k), 2, "view", 1.0, "{}")
        for k in range(9)
    ]
    out = registry.q_w08_ewma(spark, _events_dir(spark, tmp_path, rows))
    got = {r["event_id"]: (r["n_hist"], r["ewma"]) for r in out.collect()}
    # user 1 by hand:
    #   e1: 1*0.5 / 0.5                          = 1.0
    #   e2: (2*0.5 + 1*0.25) / 0.75              = 1.666667
    #   e3: (4*0.5 + 2*0.25 + 1*0.125) / 0.875   = 3.0
    assert got[1] == (1, 1.0)
    assert got[2] == (2, pytest.approx(1.666667, abs=1e-6))
    assert got[3] == (3, 3.0)
    assert got[18] == (8, 1.0)  # 9th event: horizon caps history at 8
    assert [got[10 + k][0] for k in range(9)] == [1, 2, 3, 4, 5, 6, 7, 8, 8]


def test_w08_ties_broken_by_event_id(spark, tmp_path):
    """Two events at the SAME timestamp: the (ts_ns, event_id) total
    order decides which is the lag — both engines agree by contract."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (2, t0, 1, "view", 8.0, "{}"),
        (1, t0, 1, "view", 2.0, "{}"),
    ]
    out = registry.q_w08_ewma(spark, _events_dir(spark, tmp_path, rows))
    got = {r["event_id"]: (r["n_hist"], r["ewma"]) for r in out.collect()}
    assert got[1] == (1, 2.0)
    # event 2 sees event 1 as lag-1: (8*0.5 + 2*0.25) / 0.75 = 6.0
    assert got[2] == (2, 6.0)


def test_w08_nan_is_a_missing_observation(spark, tmp_path):
    """ADVICE r8: batch w08 must treat NaN exactly like NULL (one
    null domain shared with the st11 stream twin) — a NaN value
    contributes to neither num, den, nor n_hist."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0 + datetime.timedelta(seconds=1), 1, "view", float("nan"), "{}"),
        (2, t0 + datetime.timedelta(seconds=2), 1, "view", 4.0, "{}"),
    ]
    out = registry.q_w08_ewma(spark, _events_dir(spark, tmp_path, rows))
    got = {r["event_id"]: (r["n_hist"], r["ewma"]) for r in out.collect()}
    assert got[0] == (1, 1.0)
    # NaN row: only the lag-2 observation exists -> ewma = 1.0
    assert got[1] == (1, 1.0)
    # (4*0.5 + 1*0.125) / 0.625 = 3.4 — NaN slot skipped in num AND den
    assert got[2] == (2, 3.4)


def test_stream_ewma_nan_parity_with_batch(spark, tmp_path, monkeypatch):
    """The stream twin on the same NaN-bearing input must emit the
    identical (n_hist, ewma) rows as batch w08."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import alternating_least_squares_spark.registry as R
    from alternating_least_squares_spark.streaming import (
        ewma_stream,
        run_stream_to_batch,
    )

    t0 = datetime.datetime(2024, 1, 1)
    vals = [1.0, float("nan"), 4.0, float("nan"), 2.0]
    rows = [
        (k, t0 + datetime.timedelta(seconds=k), 1, "view", vals[k], "{}")
        for k in range(5)
    ]
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        str(src / "wave_0.parquet"),
    )
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .parquet(str(src))
        .select(
            "event_id", "user_id", "value",
            (F.unix_micros("ts") * 1000).alias("ts_ns"),
        )
    )
    out = run_stream_to_batch(ewma_stream(stream), output_mode="append")
    got = {
        r["event_id"]: (r["n_hist"], r["ewma"])
        for r in out.select(
            "event_id", "n_hist", F.round("ewma_raw", 6).alias("ewma")
        ).collect()
    }
    batch = spark.createDataFrame(rows, schema)
    real_load = R.load_table
    monkeypatch.setattr(
        R, "load_table",
        lambda sp, sf, name: batch.withColumn(
            "ts_ns", F.unix_micros("ts") * 1000
        ) if name == "events" else real_load(sp, sf, name),
    )
    want = {
        r["event_id"]: (r["n_hist"], r["ewma"])
        for r in R.q_w08_ewma(spark, "ignored").collect()
    }
    assert got == want
    assert got[1] == (1, 1.0)  # NaN row scored on history only


def test_stream_ewma_rejects_out_of_order_across_batches(spark, tmp_path):
    """ADVICE r8: a later micro-batch delivering an event OLDER than
    the newest consumed one for its key must fail the query loudly
    (ValueError inside the state function), never score it against
    the stale deque."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from alternating_least_squares_spark.streaming import (
        ewma_stream,
        run_stream_to_batch,
    )

    t0 = datetime.datetime(2024, 1, 1)
    waves = [
        [(0, t0 + datetime.timedelta(seconds=10), 1, 1.0)],
        [(1, t0 + datetime.timedelta(seconds=1), 1, 2.0)],  # late!
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(waves):
        path = str(src / f"wave_{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "value": pa.array([r[3] for r in rows], pa.float64()),
                }
            ),
            path,
        )
        os.utime(path, (1_000_000 + i, 1_000_000 + i))
    schema = "event_id long, ts timestamp, user_id long, value double"
    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .select(
            "event_id", "user_id", "value",
            (F.unix_micros("ts") * 1000).alias("ts_ns"),
        )
    )
    with pytest.raises(Exception, match="out-of-order"):
        run_stream_to_batch(ewma_stream(stream), output_mode="append")


def test_stream_ewma_drops_exact_redelivery_of_boundary_row(
    spark, tmp_path
):
    """ADVICE r9 (the r10 verdict's one "weak" grade): an at-least-once
    source that redelivers already-consumed rows — here a whole
    replayed file suffix, the common failure shape — must NOT
    double-score them: every (ts_ns, event_id) still in the retained
    deque is dropped, so the emitted rows match an exactly-once
    delivery of events 0,1,2."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from alternating_least_squares_spark.streaming import (
        ewma_stream,
        run_stream_to_batch,
    )

    t0 = datetime.datetime(2024, 1, 1)
    waves = [
        [
            (0, t0 + datetime.timedelta(seconds=1), 1, 1.0),
            (1, t0 + datetime.timedelta(seconds=2), 1, 4.0),
        ],
        [
            # a replayed SUFFIX: both rows of wave 0 redelivered
            # (the common at-least-once failure is a whole file) ...
            (0, t0 + datetime.timedelta(seconds=1), 1, 1.0),
            (1, t0 + datetime.timedelta(seconds=2), 1, 4.0),
            # ... followed by genuinely new work
            (2, t0 + datetime.timedelta(seconds=3), 1, 2.0),
        ],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(waves):
        path = str(src / f"wave_{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "value": pa.array([r[3] for r in rows], pa.float64()),
                }
            ),
            path,
        )
        os.utime(path, (1_000_000 + i, 1_000_000 + i))
    schema = "event_id long, ts timestamp, user_id long, value double"
    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .select(
            "event_id", "user_id", "value",
            (F.unix_micros("ts") * 1000).alias("ts_ns"),
        )
    )
    out = run_stream_to_batch(ewma_stream(stream), output_mode="append")
    got = sorted(
        (r["event_id"], r["n_hist"], r["ewma"])
        for r in out.select(
            "event_id", "n_hist", F.round("ewma_raw", 6).alias("ewma")
        ).collect()
    )
    # exactly one emitted row per distinct event; event 1 scored once:
    # ewma(2) over hist [2.0, 4.0, 1.0] = (2*.5 + 4*.25 + 1*.125)/.875
    assert got == [
        (0, 1, 1.0),
        (1, 2, round((4 * 0.5 + 1 * 0.25) / 0.75, 6)),
        (2, 3, round((2 * 0.5 + 4 * 0.25 + 1 * 0.125) / 0.875, 6)),
    ]


def test_stream_ewma_redelivery_only_batch_keeps_state(spark, tmp_path):
    """A micro-batch consisting ONLY of a redelivered boundary row must
    emit nothing and leave the deque intact for the batch after it."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from alternating_least_squares_spark.streaming import (
        ewma_stream,
        run_stream_to_batch,
    )

    t0 = datetime.datetime(2024, 1, 1)
    waves = [
        [(0, t0 + datetime.timedelta(seconds=1), 1, 1.0)],
        [(0, t0 + datetime.timedelta(seconds=1), 1, 1.0)],  # replay only
        [(1, t0 + datetime.timedelta(seconds=2), 1, 3.0)],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(waves):
        path = str(src / f"wave_{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "value": pa.array([r[3] for r in rows], pa.float64()),
                }
            ),
            path,
        )
        os.utime(path, (1_000_000 + i, 1_000_000 + i))
    schema = "event_id long, ts timestamp, user_id long, value double"
    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .select(
            "event_id", "user_id", "value",
            (F.unix_micros("ts") * 1000).alias("ts_ns"),
        )
    )
    out = run_stream_to_batch(ewma_stream(stream), output_mode="append")
    got = sorted(
        (r["event_id"], r["n_hist"], r["ewma"])
        for r in out.select(
            "event_id", "n_hist", F.round("ewma_raw", 6).alias("ewma")
        ).collect()
    )
    assert got == [
        (0, 1, 1.0),
        (1, 2, round((3 * 0.5 + 1 * 0.25) / 0.75, 6)),
    ]


def test_stream_ewma_dedups_intra_batch_duplicate(spark, tmp_path):
    """ADVICE r11: an exact (ts_ns, event_id) twin delivered twice
    WITHIN one micro-batch never reaches the cross-batch deque check
    (state is read once at batch entry), so it used to be scored
    twice. It must now be scored exactly once — one emitted row per
    distinct event, histories unaffected by the duplicate copy."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from alternating_least_squares_spark.streaming import (
        ewma_stream,
        run_stream_to_batch,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (0, t0 + datetime.timedelta(seconds=1), 1, 1.0),
        # the same event delivered twice inside the one micro-batch
        (1, t0 + datetime.timedelta(seconds=2), 1, 4.0),
        (1, t0 + datetime.timedelta(seconds=2), 1, 4.0),
        (2, t0 + datetime.timedelta(seconds=3), 1, 2.0),
    ]
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        str(src / "wave_0.parquet"),
    )
    schema = "event_id long, ts timestamp, user_id long, value double"
    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .parquet(str(src))
        .select(
            "event_id", "user_id", "value",
            (F.unix_micros("ts") * 1000).alias("ts_ns"),
        )
    )
    out = run_stream_to_batch(ewma_stream(stream), output_mode="append")
    got = sorted(
        (r["event_id"], r["n_hist"], r["ewma"])
        for r in out.select(
            "event_id", "n_hist", F.round("ewma_raw", 6).alias("ewma")
        ).collect()
    )
    assert got == [
        (0, 1, 1.0),
        (1, 2, round((4 * 0.5 + 1 * 0.25) / 0.75, 6)),
        (2, 3, round((2 * 0.5 + 4 * 0.25 + 1 * 0.125) / 0.875, 6)),
    ]


def test_registry_has_no_dead_query_functions():
    """Every module-level ``q_*`` in registry.py must be reachable via
    REGISTRY — w08_ewma shipped unregistered in round 6 (dead code,
    zero coverage) and this lint makes that state a test failure."""
    src = inspect.getsource(registry)
    defined = set(re.findall(r"^def (q_\w+)", src, re.M))
    registered = {fn.__name__ for fn, _ in registry.REGISTRY.values()}
    assert defined <= registered, sorted(defined - registered)


def test_st11_stream_ewma_matches_batch_across_two_microbatches(
    spark, tmp_path, monkeypatch
):
    """The streaming EWMA twin with state carried ACROSS a micro-batch
    boundary: 12 events for user 1 split 6/6 into two time-ordered
    source files (so the last-7 deque must survive the batch seam and
    trim correctly), plus a user only in file 2. maxFilesPerTrigger=1
    forces two batches; the replay must equal batch w08 exactly."""
    import os

    import alternating_least_squares_spark.registry as R
    from alternating_least_squares_spark.streaming import (
        ewma_stream,
        run_stream_to_batch,
    )

    t0 = datetime.datetime(2024, 1, 1)
    vals = [1.0, 3.0, 2.0, 7.0, 5.0, 0.5, 4.0, 6.0, 2.5, 8.0, 1.25, 9.0]
    all_rows = [
        (k, t0 + datetime.timedelta(seconds=k), 1, "view", vals[k], "{}")
        for k in range(12)
    ] + [
        (100 + k, t0 + datetime.timedelta(seconds=6 + k), 2, "view",
         float(2 ** k), "{}")
        for k in range(3)
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    src = tmp_path / "src"
    src.mkdir()
    first = [r for r in all_rows if r[1] < t0 + datetime.timedelta(seconds=6)]
    second = [r for r in all_rows if r not in first]
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i, rows in enumerate([first, second]):
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        )
        path = str(src / f"wave_{i}.parquet")
        pq.write_table(t, path)
        # distinct mtimes pin the file-source processing order
        os.utime(path, (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .select(
            "event_id", "user_id", "value",
            (F.unix_micros("ts") * 1000).alias("ts_ns"),
        )
    )
    out = run_stream_to_batch(ewma_stream(stream), output_mode="append")
    got = {
        r["event_id"]: (r["n_hist"], r["ewma"])
        for r in out.select(
            "event_id", "n_hist", F.round("ewma_raw", 6).alias("ewma")
        ).collect()
    }

    batch = spark.createDataFrame(all_rows, schema)
    real_load = R.load_table
    monkeypatch.setattr(
        R, "load_table",
        lambda sp, sf, name: batch.withColumn(
            "ts_ns", F.unix_micros("ts") * 1000
        ) if name == "events" else real_load(sp, sf, name),
    )
    want = {
        r["event_id"]: (r["n_hist"], r["ewma"])
        for r in R.q_w08_ewma(spark, "ignored").collect()
    }
    assert got == want
    assert len(got) == 15 and got[11][0] == 8  # deque saturated past seam


from hypothesis import HealthCheck, given, settings, strategies as st

event_sets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # user
        st.integers(min_value=0, max_value=9),      # ts second (ties!)
        st.floats(
            min_value=-100, max_value=100,
            allow_nan=False, allow_infinity=False,
        ),
    ),
    min_size=1,
    max_size=24,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=event_sets)
def test_stream_ewma_matches_batch_on_random_inputs(spark, raw):
    """Any users, any values, duplicate timestamps included (the
    (ts, event_id) tie-break must agree between the pandas operator's
    in-batch sort and the batch window's ORDER BY): the streaming
    replay must equal the independent batch w08 implementation
    row-for-row after identical Spark-side rounding."""
    import shutil
    import tempfile

    from alternating_least_squares_spark.streaming import (
        ewma_stream,
        run_stream_to_batch,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=ts), u, "view", v, "{}")
        for i, (u, ts, v) in enumerate(raw)
    ]
    d = tempfile.mkdtemp(prefix="ewma_prop_")
    try:
        sf_dir = d
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        df.coalesce(1).write.parquet(sf_dir + "/events.parquet")

        want = {
            r["event_id"]: (r["n_hist"], r["ewma"])
            for r in registry.q_w08_ewma(spark, sf_dir).collect()
        }
        stream = (
            spark.readStream.schema(df.schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(sf_dir + "/events.parquet")
            .select(
                "event_id", "user_id", "value",
                (F.unix_micros("ts") * 1000).alias("ts_ns"),
            )
        )
        out = run_stream_to_batch(ewma_stream(stream), output_mode="append")
        got = {
            r["event_id"]: (r["n_hist"], r["ewma"])
            for r in out.select(
                "event_id", "n_hist", F.round("ewma_raw", 6).alias("ewma")
            ).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_ewma_rejects_conflicting_intra_batch_duplicate(
    spark, tmp_path
):
    """A same-(ts_ns, event_id) twin carrying a DIFFERENT value is not
    a verifiable redelivery — keeping either copy would make the
    output depend on Arrow chunk arrival order, so the batch must
    fail loudly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from alternating_least_squares_spark.streaming import (
        ewma_stream,
        run_stream_to_batch,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0 + datetime.timedelta(seconds=2), 1, 4.0),
        (1, t0 + datetime.timedelta(seconds=2), 1, 5.0),  # conflict
    ]
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        str(src / "wave_0.parquet"),
    )
    schema = "event_id long, ts timestamp, user_id long, value double"
    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .parquet(str(src))
        .select(
            "event_id", "user_id", "value",
            (F.unix_micros("ts") * 1000).alias("ts_ns"),
        )
    )
    with pytest.raises(Exception, match="conflicting duplicate"):
        run_stream_to_batch(ewma_stream(stream), output_mode="append")


def test_stream_ewma_rejects_reused_event_id_across_ts(spark, tmp_path):
    """ADVICE r12: two rows sharing an event_id but differing in ts_ns
    violate the 'event_id is unique per event' premise the replay
    logic rests on, yet the exact-(ts_ns, event_id) twin dedup never
    sees them — they must fail as loudly as the value-conflict case,
    not be silently scored as two distinct events."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from alternating_least_squares_spark.streaming import (
        ewma_stream,
        run_stream_to_batch,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (7, t0 + datetime.timedelta(seconds=1), 1, 4.0),
        (7, t0 + datetime.timedelta(seconds=2), 1, 4.0),  # reused id
    ]
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        str(src / "wave_0.parquet"),
    )
    schema = "event_id long, ts timestamp, user_id long, value double"
    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .parquet(str(src))
        .select(
            "event_id", "user_id", "value",
            (F.unix_micros("ts") * 1000).alias("ts_ns"),
        )
    )
    with pytest.raises(Exception, match="unique per"):
        run_stream_to_batch(ewma_stream(stream), output_mode="append")


def test_w09_rolling_slope_hand_computed(spark, tmp_path):
    """w09 on a hand series: a perfectly linear stretch yields exactly
    slope_num/slope_den = its per-step increment in micro-units; a
    direction flip shows up immediately in the trailing fit; NaN rows
    are not observations; n_obs==1 rows are absent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from alternating_least_squares_spark import registry

    t0 = datetime.datetime(2024, 1, 1)
    vals = [1.0, 3.0, 5.0, float("nan"), 1.0]  # linear +2, then drop
    rows = [
        (i, t0 + datetime.timedelta(seconds=i + 1), 7, v)
        for i, v in enumerate(vals)
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {
        r["event_id"]: (r["n_obs"], r["slope_num"], r["slope_den"])
        for r in registry.q_w09_rolling_slope(
            spark, str(tmp_path)
        ).collect()
    }
    # observations are x=1..4 (NaN dropped), y_us = 1e6, 3e6, 5e6, 1e6
    # event 1: n=2, num = 2*(1*1e6+2*3e6) - 3*4e6 = 2e6, den = 2*5-9 = 1
    # event 2: n=3, num = 3*(1e6+6e6+15e6) - 6*9e6 = 12e6, den = 3*14-36 = 6
    # event 4: n=4, num = 4*(1e6+6e6+15e6+4e6) - 10*10e6 = 4e6,
    #          den = 4*30-100 = 20  -> slope 0.2e6 (the drop flattens it)
    assert got == {
        1: (2, 2_000_000, 1),
        2: (3, 12_000_000, 6),
        4: (4, 4_000_000, 20),
    }
    assert got[1][1] / got[1][2] == 2_000_000.0
    assert got[2][1] / got[2][2] == 2_000_000.0


def test_w10_rolling_median_hand_computed(spark, tmp_path):
    """w10 on a hand series: med_lo/med_hi are the two middle order
    statistics of the trailing frame (equal on odd counts); a spike
    entering the window leaves the median untouched (robustness, the
    point of the operator); NaN rows are not observations."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from alternating_least_squares_spark import registry

    t0 = datetime.datetime(2024, 1, 1)
    vals = [2.0, 1.0, float("nan"), 3.0, 100.0]  # spike at the end
    rows = [
        (i, t0 + datetime.timedelta(seconds=i + 1), 7, v)
        for i, v in enumerate(vals)
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {
        r["event_id"]: (r["n_obs"], r["med_lo"], r["med_hi"])
        for r in registry.q_w10_rolling_median(
            spark, str(tmp_path)
        ).collect()
    }
    M = 1_000_000
    assert got == {
        0: (1, 2 * M, 2 * M),  # [2]
        1: (2, 1 * M, 2 * M),  # [1,2] — even: the two middles differ
        3: (3, 2 * M, 2 * M),  # [1,2,3] — odd: both middles = median
        4: (4, 2 * M, 3 * M),  # [1,2,3,100] — the spike never moves it
    }


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.floats(
            min_value=-100, max_value=100,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_w10_rolling_median_matches_pandas(spark, tmp_path_factory, vals):
    """w10 property: on any series, (med_lo + med_hi) / 2 in
    micro-units equals pandas' rolling(window=8, min_periods=1)
    median of the floored micro-unit series."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import math

    from alternating_least_squares_spark import registry

    tmp_path = tmp_path_factory.mktemp("w10")
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i + 1), 1, v)
        for i, v in enumerate(vals)
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {
        r["event_id"]: (r["med_lo"] + r["med_hi"]) / 2
        for r in registry.q_w10_rolling_median(
            spark, str(tmp_path)
        ).collect()
    }
    y = pd.Series([math.floor(v * 1_000_000) for v in vals], dtype="float64")
    want = y.rolling(window=8, min_periods=1).median()
    assert got == {i: want[i] for i in range(len(vals))}


def test_w11_rolling_mad_hand_computed(spark, tmp_path):
    """w11 on a hand series: mad_lo/mad_hi are the two middle order
    statistics of the sorted DOUBLED absolute deviations
    |2y - (med_lo + med_hi)| (exact longs in doubled micro-units); a
    spike entering the window moves the MAD far less than it would a
    stddev; NaN rows are not observations."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from alternating_least_squares_spark import registry

    t0 = datetime.datetime(2024, 1, 1)
    vals = [2.0, 1.0, float("nan"), 3.0, 100.0]
    rows = [
        (i, t0 + datetime.timedelta(seconds=i + 1), 7, v)
        for i, v in enumerate(vals)
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {
        r["event_id"]: (r["n_obs"], r["mad_lo"], r["mad_hi"])
        for r in registry.q_w11_rolling_mad(spark, str(tmp_path)).collect()
    }
    M = 1_000_000
    # frames (micro-units): [2], [1,2], [1,2,3], [1,2,3,100]
    # med2 = med_lo+med_hi: 4M, 3M, 4M, 5M
    # doubled devs |2y-med2|, sorted:
    #   [0]; [1M,1M]; [2M,0,2M]->[0,2M,2M]; [3M,1M,1M,195M]->[1M,1M,3M,195M]
    assert got == {
        0: (1, 0, 0),
        1: (2, 1 * M, 1 * M),
        3: (3, 2 * M, 2 * M),
        4: (4, 1 * M, 3 * M),  # the spike sits in the tail, not the MAD
    }


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.floats(
            min_value=-100, max_value=100,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_w11_rolling_mad_matches_python_replay(
    spark, tmp_path_factory, vals
):
    """w11 property: on any series, (mad_lo + mad_hi) / 2 equals the
    sequential reference MAD (in doubled micro-units) of the trailing
    8-observation frame."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from alternating_least_squares_spark import registry

    tmp_path = tmp_path_factory.mktemp("w11")
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i + 1), 1, v)
        for i, v in enumerate(vals)
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {
        r["event_id"]: (r["mad_lo"] + r["mad_hi"]) / 2
        for r in registry.q_w11_rolling_mad(spark, str(tmp_path)).collect()
    }
    y = [math.floor(v * 1_000_000) for v in vals]
    want = {}
    for i in range(len(y)):
        frame = sorted(y[max(0, i - 7): i + 1])
        n = len(frame)
        med2 = frame[(n - 1) // 2] + frame[n // 2]
        devs = sorted(abs(2 * x - med2) for x in frame)
        want[i] = (devs[(n - 1) // 2] + devs[n // 2]) / 2
    assert got == want


def test_stream_ewma_rejects_reused_event_id_across_batches(
    spark, tmp_path
):
    """Self-review r13: the event_id-uniqueness guard must also fire
    ACROSS micro-batches — an event_id still held in the retained
    history arriving in a later wave with a newer ts_ns is neither an
    exact replay (those are dropped) nor a new event, and scoring it
    twice would be silently wrong."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from alternating_least_squares_spark.streaming import (
        ewma_stream,
        run_stream_to_batch,
    )

    t0 = datetime.datetime(2024, 1, 1)
    waves = [
        [(7, t0 + datetime.timedelta(seconds=1), 1, 4.0)],
        [(7, t0 + datetime.timedelta(seconds=2), 1, 4.0)],  # reused id
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(waves):
        path = str(src / f"wave_{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "value": pa.array([r[3] for r in rows], pa.float64()),
                }
            ),
            path,
        )
        os.utime(path, (1_000_000 + i, 1_000_000 + i))
    schema = "event_id long, ts timestamp, user_id long, value double"
    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .select(
            "event_id", "user_id", "value",
            (F.unix_micros("ts") * 1000).alias("ts_ns"),
        )
    )
    with pytest.raises(Exception, match="unique per"):
        run_stream_to_batch(ewma_stream(stream), output_mode="append")


def test_w13_robust_anomaly_gate_hand_computed(spark, tmp_path):
    """w13 on the w11 hand series: the spike (100.0 entering a
    [1,2,3] window) is the ONLY flagged event — its doubled
    deviation 195M cross-multiplies to 390M > 3·(1M+3M) = 12M, while
    every in-band event fails the strict compare (including the
    1-element frame, where 0 > 0 is false). NaN rows are not
    observations."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from alternating_least_squares_spark import registry

    t0 = datetime.datetime(2024, 1, 1)
    vals = [2.0, 1.0, float("nan"), 3.0, 100.0]
    rows = [
        (i, t0 + datetime.timedelta(seconds=i + 1), 7, v)
        for i, v in enumerate(vals)
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {
        r["event_id"]: (
            r["n_obs"], r["dev2"], r["mad_lo"], r["mad_hi"],
            r["is_anomaly"],
        )
        for r in registry.q_w13_robust_anomaly_gate(
            spark, str(tmp_path)
        ).collect()
    }
    M = 1_000_000
    assert got == {
        0: (1, 0, 0, 0, False),
        1: (2, 1 * M, 1 * M, 1 * M, False),
        3: (3, 2 * M, 2 * M, 2 * M, False),
        4: (4, 195 * M, 1 * M, 3 * M, True),
    }


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.floats(
            min_value=-100, max_value=100,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_w13_gate_matches_python_replay(spark, tmp_path_factory, vals):
    """w13 property: on any series the flag equals the sequential
    reference |y - med| > 3*MAD computed in exact rationals
    (fractions have no rounding, so a mismatch is a logic bug, not
    float slop)."""
    from fractions import Fraction

    import pyarrow as pa
    import pyarrow.parquet as pq

    from alternating_least_squares_spark import registry

    tmp_path = tmp_path_factory.mktemp("w13")
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i + 1), 1, v)
        for i, v in enumerate(vals)
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {
        r["event_id"]: r["is_anomaly"]
        for r in registry.q_w13_robust_anomaly_gate(
            spark, str(tmp_path)
        ).collect()
    }
    import math

    y = [math.floor(v * 1_000_000) for v in vals]
    want = {}
    for i in range(len(y)):
        frame = sorted(y[max(0, i - 7): i + 1])
        n = len(frame)
        med = Fraction(frame[(n - 1) // 2] + frame[n // 2], 2)
        devs = sorted(abs(Fraction(x) - med) for x in frame)
        mad = Fraction(devs[(n - 1) // 2] + devs[n // 2], 2)
        want[i] = abs(Fraction(y[i]) - med) > 3 * mad
    assert got == want
