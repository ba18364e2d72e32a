"""w08 bounded-horizon EWMA: hand-computed fixture (VERDICT r6 #2) and
the registry no-dead-query lint that would have caught w08's original
unregistered state."""

from __future__ import annotations

import datetime
import inspect
import re

import pytest

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


def test_registry_has_no_dead_query_functions():
    """Every module-level ``q_*`` in registry.py must be reachable via
    REGISTRY — w08_ewma shipped unregistered in round 6 (dead code,
    zero coverage) and this lint makes that state a test failure."""
    src = inspect.getsource(registry)
    defined = set(re.findall(r"^def (q_\w+)", src, re.M))
    registered = {fn.__name__ for fn, _ in registry.REGISTRY.values()}
    assert defined <= registered, sorted(defined - registered)
