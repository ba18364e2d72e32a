"""DuckDB type-scan over every ``oracle_sql()`` entry.

Round 4 lost two driver hash rows to a pure oracle-SQL type defect:
DuckDB ``SUM`` over integer inputs returns HUGEINT (int128) while the
Spark twin returns LONG, and the driver's value-hash is type-sensitive.
The local gate compared repr()-values only, so it green-lit exactly the
class of bug the driver rejects (VERDICT r4 "What's wrong").

This test binds (not executes) each oracle SQL against the sf0.001
parquet views and asserts no output column has a type the driver can't
hash-match against Spark: HUGEINT/UHUGEINT (no Spark twin) and DECIMAL
(testdata is double/bigint everywhere; a DECIMAL output means an uncast
DuckDB arithmetic artifact). Fails with the offending query, column,
and type so the fix is a one-line CAST.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TYPESCAN_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_hugeint_or_decimal_oracle_columns(con):
    import __spark_entry__ as e

    bad = []
    for name, sql in e.oracle_sql().items():
        rel = con.sql(sql)  # binds + resolves types without executing
        for col, dt in zip(rel.columns, rel.types):
            dname = str(dt).upper()
            if any(dname.startswith(f) for f in FORBIDDEN):
                bad.append(f"{name}: column {col!r} is {dname}")
    assert not bad, (
        "oracle SQL columns with driver-hash-incompatible types "
        "(wrap in CAST(... AS BIGINT/DOUBLE)):\n" + "\n".join(bad)
    )


def test_driver_prefix_entries_all_have_oracles():
    """The driver checks the first 50 registry entries; a rows-only
    entry in that window records err:no_oracle and reads as a failure
    in CORRECTNESS_r*.json (VERDICT r4 #4). Pin the invariant."""
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    prefix = list(qs)[:50]
    missing = [k for k in prefix if k not in osql]
    assert missing == [], f"rows-only entries in the driver prefix: {missing}"
