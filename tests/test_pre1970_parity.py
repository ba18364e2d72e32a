"""Trunc-vs-floor oracle parity on PRE-1970 timestamps.

Spark's integer ``DIV`` and DuckDB's integer ``//`` BOTH truncate
toward zero (verified for the installed DuckDB 1.0.0: ``-7 // 2`` is
``-3``), while time bucketing must FLOOR — ``F.window`` floors
internally and a day/hour bucket for 1969-12-31 23:00 is day −1, not
day 0. Both engines therefore carry explicit floor-division
emulations (registry ``_floor_div`` / ``_floor_div_duck``); this test
replays the affected time-bucketing queries on synthetic events
straddling the epoch and diffs Spark against the DuckDB oracle —
the exact comparison the driver gate runs, on the data it might
regenerate someday.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from alternating_least_squares_spark import registry


def _write_epoch_straddling_events(tmp_path) -> str:
    # micros from 1969-12-31 ~18:00 to 1970-01-01 ~06:00, spaced 17 min
    # (odd spacing so events hit window edges on both sides of 0)
    rows = []
    ts0 = -6 * 3600 * 1_000_000
    for i in range(85):
        rows.append((i, ts0 + i * 17 * 60 * 1_000_000, i % 7, "view", float(i), "{}"))
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


@pytest.mark.parametrize(
    "name",
    [
        "e01_hourly_value",
        "e04_resample_gapfill",
        "e07_cohort_retention",
        "e17_locf_fill",
        "w05_tumbling_batch",
        "w06_hopping_batch",
    ],
)
def test_time_bucketing_matches_oracle_pre_1970(spark, tmp_path, name):
    sf_dir = _write_epoch_straddling_events(tmp_path)
    fn, sql = registry.REGISTRY[name]
    sdf = fn(spark, sf_dir)
    spark_rows = {
        tuple(r[c] for c in sorted(sdf.columns)) for r in sdf.collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    oracle_rows = {tuple(r[i] for i in order) for r in cur.fetchall()}
    assert sorted(cols) == sorted(sdf.columns), (cols, sdf.columns)
    assert spark_rows == oracle_rows, (
        name,
        sorted(spark_rows - oracle_rows)[:5],
        sorted(oracle_rows - spark_rows)[:5],
    )


def test_windows_contain_their_events_pre_1970(spark, tmp_path):
    """Sanity independent of the oracle: every (hopping and tumbling)
    window emitted must actually contain events — start ≤ some event
    ts < end. A truncation bug yields windows starting after their
    only event."""
    sf_dir = _write_epoch_straddling_events(tmp_path)
    ts_us = {
        r[0]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("unix_micros(cast(ts as timestamp)) AS u")
        .collect()
    }
    for name in ("w05_tumbling_batch", "w06_hopping_batch"):
        fn, _ = registry.REGISTRY[name]
        for r in fn(spark, sf_dir).collect():
            assert any(
                r["win_start_us"] <= t < r["win_end_us"] for t in ts_us
            ), (name, r)
