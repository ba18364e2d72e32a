"""Loud guards for the DATA assumptions round-5 entries bake in.

The driver regenerates /root/testdata between rounds (and has changed
layouts before — see sources/catalog dual-layout handling). Entries
whose ORACLES encode structural assumptions about the synthetic data
would fail with an opaque hash mismatch if those assumptions drifted;
these tests fail first, naming the assumption.
"""

from __future__ import annotations

import duckdb
import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf", SFS)
def test_partkeys_contiguous_from_zero(sf):
    """rc01–rc04 + gr edges define the synthetic forest as
    parent(k) = k DIV 10 over CONTIGUOUS keys 0..N-1 — both engines'
    recursions rely on every parent row existing. If this fails, the
    rc oracles (pure-arithmetic walks) and the Spark closures (walks
    over existing rows) would diverge on the gaps."""
    lo, hi, n, nd = duckdb.sql(
        f"SELECT min(p_partkey), max(p_partkey), count(*), "
        f"count(DISTINCT p_partkey) FROM '{sf}/part.parquet'"
    ).fetchall()[0]
    assert (lo, hi, n) == (0, n - 1, nd), (
        f"p_partkey no longer contiguous 0..N-1 in {sf}: "
        f"min={lo} max={hi} rows={n} distinct={nd} — revisit the "
        "rc-suite hierarchy construction and its recursive oracles"
    )


@pytest.mark.parametrize("sf", SFS)
def test_low_doc_ids_exist(sf):
    """b07 materializes docs with doc_id < 8 as files; zero such rows
    would make the entry vacuous (0-row hash still matches, hiding
    the loss of coverage)."""
    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/documents.parquet' WHERE doc_id < 8"
    ).fetchall()[0][0]
    assert n >= 1, f"no doc_id < 8 rows in {sf} — b07 is vacuous"


@pytest.mark.parametrize("sf", SFS)
def test_events_users_and_types_present(sf):
    """j01/j04/j05 + the st-suite assume click/purchase event types
    exist; e-suite assumes non-empty user activity."""
    rows = dict(
        duckdb.sql(
            f"SELECT event_type, count(*) FROM '{sf}/events.parquet' "
            "GROUP BY 1"
        ).fetchall()
    )
    assert rows.get("click", 0) > 0 and rows.get("purchase", 0) > 0, (
        f"event_type mix changed in {sf}: {rows} — asof/funnel entries "
        "would go vacuous"
    )
