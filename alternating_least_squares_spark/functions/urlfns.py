"""URL canonicalization — the CCNet/RefinedWeb-style pre-dedup gate.

Web-crawl corpora carry the same page under many spellings: scheme
and host case, explicit default ports, fragments, tracking params
(utm_*, fbclid, gclid, ref), query-key order, trailing slashes. A
URL-level dedup gate canonicalizes first and groups after —
upstream of content dedup (d01–d13) because it is O(rows) pure
string work with no candidate join at all, so at 100 TB it removes
the bulk of crawl duplication before any shingling shuffle runs.

:func:`canonicalize_url` is a fixed tree of built-in string
expressions (regexp_extract / regexp_replace / split / filter /
array_sort / array_join) — whole-stage codegen end to end, no UDF.
The registry entry ``d14`` proves it against an INDEPENDENT DuckDB
restatement of the same rules (regexp + list functions), so the
transformation is pinned engine-independently rather than against
its own construction.

Domain: absolute http(s) URLs (``scheme://host[:port][/path]
[?query][#fragment]``). Userinfo and IPv6 bracket hosts are out of
scope for the gate (a crawl frontier normalizes those away earlier);
inputs without a scheme pass through the host/path rules with an
empty scheme rather than erroring — garbage in, deterministic
garbage out, never a crash mid-pipeline.

No reference analog (the reference is an in-memory matrix engine,
core.clj:1-197); this extends the LLM-pipeline dedup family.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query keys dropped by the gate: per-click tracking identifiers
#: that never change page content (the CCNet/RefinedWeb stop set)
TRACKING_KEY_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL, as one codegen
    expression tree:

    1. trim; strip the ``#fragment``;
    2. lowercase the scheme and the host (path and query keep case —
       they are case-significant on most origins);
    3. drop an explicit DEFAULT port (``:80`` for http, ``:443`` for
       https — a non-default port is identity and stays);
    4. strip trailing slashes from the path (``/path/a/`` ≡
       ``/path/a``; a root ``/`` collapses to the bare authority);
    5. drop tracking params (:data:`TRACKING_KEY_RE`) and empty
       pairs, then sort the surviving query pairs bytewise so key
       order cannot split a group (``?b=2&a=1`` ≡ ``?a=1&b=2``);
       an all-tracking query loses its ``?`` entirely.

    Idempotent by construction (a canonical URL maps to itself) —
    pinned in tests/test_urlfns.py.
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    authority = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = (
        F.when(
            scheme == "http", F.regexp_replace(authority, r":80$", "")
        )
        .when(
            scheme == "https", F.regexp_replace(authority, r":443$", "")
        )
        .otherwise(authority)
    )
    after = F.regexp_replace(rest, r"^[^/?#]*", "")  # /path?query
    path = F.regexp_replace(
        F.regexp_extract(after, r"^([^?]*)", 1), r"/+$", ""
    )
    query = F.when(
        after.contains("?"), F.regexp_replace(after, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_KEY_RE),
            )
        ),
        "&",
    )
    return F.concat(
        F.when(scheme != "", F.concat(scheme, F.lit("://"))).otherwise(
            F.lit("")
        ),
        host,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
