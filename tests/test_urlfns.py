"""URL canonicalization (functions/urlfns.py) — rule-by-rule hand
cases, idempotence, and the d14 gate shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alternating_least_squares_spark.functions.urlfns import (
    canonicalize_url,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonicalize_url("url").alias("c"))
        .collect()
    ]


CASES = [
    # already canonical
    ("http://example.com/docs/1?x=1&y=2", "http://example.com/docs/1?x=1&y=2"),
    # scheme + host case
    ("HTTP://EXAMPLE.COM/Docs/A?x=1", "http://example.com/Docs/A?x=1"),
    # default ports drop; non-default stays
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com:80/a", "https://example.com:80/a"),
    # fragment
    ("http://e.com/a?x=1#frag", "http://e.com/a?x=1"),
    # tracking params drop, wherever they sit; ? vanishes if all drop
    ("http://e.com/a?utm_source=f&x=1", "http://e.com/a?x=1"),
    ("http://e.com/a?x=1&fbclid=z", "http://e.com/a?x=1"),
    ("http://e.com/a?gclid=1&utm_medium=m&ref=r", "http://e.com/a"),
    # bare tracking key without '=' also drops
    ("http://e.com/a?fbclid&x=1", "http://e.com/a?x=1"),
    # query keys sort; empty pairs drop
    ("http://e.com/a?y=2&x=1", "http://e.com/a?x=1&y=2"),
    ("http://e.com/a?y=2&&x=1", "http://e.com/a?x=1&y=2"),
    # trailing slashes; root path collapses to bare authority
    ("http://e.com/a/b/", "http://e.com/a/b"),
    ("http://e.com/a//", "http://e.com/a"),
    ("http://e.com/", "http://e.com"),
    # whitespace trims
    ("  http://e.com/a  ", "http://e.com/a"),
    # non-tracking key that merely CONTAINS a stop word survives
    ("http://e.com/a?refresh=1", "http://e.com/a?refresh=1"),
    ("http://e.com/a?myutm_x=1", "http://e.com/a?myutm_x=1"),
    # scheme-less input: host/path rules apply, no crash
    ("E.com/a/?x=1#f", "e.com/a?x=1"),
]


def test_canonicalize_url_hand_cases(spark):
    got = _canon(spark, [u for u, _ in CASES])
    assert got == [want for _, want in CASES]


def test_canonicalize_url_is_idempotent(spark):
    once = _canon(spark, [u for u, _ in CASES])
    twice = _canon(spark, once)
    assert twice == once


def test_d14_gate_collapses_every_dirt_class(spark):
    """All ten dirty spellings of one page collapse to one group with
    the min doc_id as keeper, across both scheme families."""
    from alternating_least_squares_spark import registry

    out = registry.q_d14_url_dedup(spark, "/root/testdata/sf0.001")
    rows = {r["canon_url"]: (r["n_docs"], r["keep_id"])
            for r in out.collect()}
    assert len(rows) == 50  # 500 docs / 10 per canonical page
    assert all(n == 10 for n, _ in rows.values())
    assert rows["http://example0.com/docs/0?x=1&y=2"] == (10, 0)
    assert rows["https://example1.com/docs/1?x=1&y=2"] == (10, 10)
    # every canonical URL is a fixpoint of the canonicalizer
    assert _canon(spark, sorted(rows)) == sorted(rows)


def test_canonicalize_url_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(
        canonicalize_url("url").alias("c")
    ).first()["c"] is None
