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


@pytest.mark.parametrize("sf", SFS)
def test_no_shingle_set_collisions_across_distinct_token_keys(sf):
    """d09/d10/d11 oracles state ground truth as "identical token
    key"; the Spark side decides on shingle-SET equality (Jaccard
    1.0). The two agree unless the corpus holds two docs with the
    SAME 3-shingle set but DIFFERENT token sequences (pathological —
    e.g. rotations). This guard proves the equivalence holds on the
    actual testdata, so the oracle texts stay ground truth."""
    bad = duckdb.sql(f"""
        WITH tk AS (
          SELECT doc_id,
                 CASE WHEN regexp_replace(coalesce(text, ''),
                                          '^\\s+|\\s+$', '', 'g') = ''
                      THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(
                             regexp_replace(coalesce(text, ''),
                                            '^\\s+|\\s+$', '', 'g'),
                             '\\s+') END AS toks
          FROM '{sf}/documents.parquet'
        ),
        sh AS (
          SELECT doc_id,
                 array_to_string(toks, ' ') AS key,
                 md5(array_to_string(list_sort(list_distinct(
                   CASE WHEN len(toks) < 3
                        THEN [array_to_string(toks, ' ')]
                        ELSE list_transform(range(len(toks) - 2),
                             i -> toks[i+1] || ' ' || toks[i+2]
                                  || ' ' || toks[i+3]) END)), chr(10)))
                   AS shset
          FROM tk
        )
        SELECT shset, count(DISTINCT key) AS nk
        FROM sh GROUP BY 1 HAVING count(DISTINCT key) > 1
    """).fetchall()
    assert bad == [], (
        f"{sf}: {len(bad)} shingle-set groups span distinct token "
        "keys — the d09/d10/d11 'token key == ground truth' oracle "
        "argument no longer holds on this corpus"
    )
