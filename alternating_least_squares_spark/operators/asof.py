"""As-of join — Spark has no native operator; this is the scalable
union+window formulation.

``asof_join(left, right, key, ts)``: every left row is matched with
the LATEST right row of the same key whose timestamp is ≤ the left
row's (classic market-data / feature-store semantics).

The naive theta-join (``l.key = r.key AND r.ts <= l.ts`` + max) is
quadratic per key. The scalable shape — one union, ONE shuffle on the
key, one ordered window pass:

1. tag both sides and union them on (key, ts);
2. ``last(right_payload, ignorenulls=True)`` over
   ``partitionBy(key).orderBy(ts, side)`` rows-to-current carries the
   most recent right payload forward;
3. keep the left rows.

Ties (equal ts): the right row sorts FIRST (side ordering), so a
same-timestamp right row IS visible to the left row — the standard
inclusive as-of. Cost is sort-within-partition, exactly what a range
join in a native engine pays.

Hot keys: the window puts every row of one key into ONE reducer's
sort, so a single hot key serializes that partition (results stay
exact — pinned by tests/test_skew.py's 99%-hot fixture). If a real
deployment hits one, sub-partition the window by a coarse time bucket
and stitch the bucket boundaries, or pre-aggregate the right side;
see :mod:`.skew` for the general salting recipe and when AQE covers
it instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can sort on this type (maps and variants cannot
    appear anywhere inside a sort key)."""
    if isinstance(dt, T.MapType) or dt.typeName() == "variant":
        return False
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """Inclusive as-of join. ``direction='backward'`` (default): the
    LATEST right row with right.ts ≤ left.ts; ``'forward'``: the
    EARLIEST right row with right.ts ≥ left.ts; ``'nearest'``: the
    closer of the two, ties resolved BACKWARD (the full pandas
    ``merge_asof`` direction vocabulary). Backward/forward are the
    same one-shuffle union+window plan with the time axis set
    accordingly; nearest computes both carries over the SAME
    partitioning (one exchange, two sorted window passes) and picks
    per-row by distance — ``nearest`` therefore requires a numeric ts
    column (distances are compared arithmetically).

    ``tolerance``: optional max distance between left.ts and the
    matched right.ts — a match farther away is nulled out (carried
    columns AND matched ts), like ``merge_asof(tolerance=...)``.
    Expressed in the ts column's own arithmetic (use integer µs/ns
    timestamps; an interval-typed tolerance works only for
    timestamp-typed ts).

    ``payload_cols``: right columns to carry (default: all but key/ts).
    Carried columns are renamed ``<name><suffix>``; the matched right
    timestamp arrives as ``<ts><suffix>`` (NULL when no right row
    qualifies)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', "
            f"got {direction!r}"
        )
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (key, ts)]
    reserved = {"_pack", "_side"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved)}; rename them"
        )

    # SQL join semantics for NULLs, matching the DuckDB ASOF oracle:
    # a right row with a NULL key can never be matched by key equality,
    # and one with a NULL timestamp can never satisfy ts <= left.ts —
    # but NULLS-FIRST window ordering would otherwise sort it before
    # everything and carry its payload into every left row.
    right = right.filter(F.col(key).isNotNull() & F.col(ts).isNotNull())

    # The whole right payload travels as ONE struct: last(ignorenulls)
    # then carries the entire matched row atomically. Filling each
    # payload column independently would let a NULL field in the
    # matched right row fall through to an OLDER right row's value —
    # a frankenrow mixing fields from different matches.
    pack = F.struct(
        F.col(ts).alias(f"{ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols],
    )
    r_tag = right.select(key, ts, pack.alias("_pack")).withColumn(
        "_side", F.lit(0)
    )
    l_tag = left.withColumn(
        "_pack", F.lit(None).cast(r_tag.schema["_pack"].dataType)
    ).withColumn("_side", F.lit(1))
    # one select, not a withColumn-per-column loop: each withColumn is
    # a full analysis pass over a growing plan (O(n^2) driver cost on
    # wide left tables)
    r_full = r_tag.select(
        "*",
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (key, ts)
        ],
    )
    unioned = l_tag.unionByName(r_full.select(l_tag.columns))

    # _pack as the final sort key: among right rows sharing (key, ts)
    # the winner is otherwise arbitrary (partition-order-dependent),
    # which would make hash-compared results flaky. Struct ordering is
    # total over the payload, so the pick is deterministic: the
    # greatest payload tuple wins. Maps/variants cannot be sort keys —
    # for such payloads fall back to (ts, side) ordering and accept
    # the arbitrary tie winner (pre-dedupe the right side per
    # (key, ts) to pin it, as q_j01 does).
    # forward = the same scan with the time axis reversed; _side and
    # _pack keep their ASC order so ties stay inclusive and the
    # greatest payload still wins deterministically in every direction
    tail = [F.col("_side").asc()]
    if _orderable(r_tag.schema["_pack"].dataType):
        tail.append(F.col("_pack").asc())

    def carry(ts_key):
        w = (
            Window.partitionBy(key)
            .orderBy(ts_key, *tail)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("_pack", ignorenulls=True).over(w)

    carried = [f"{ts}{suffix}"] + [f"{c}{suffix}" for c in payload_cols]
    if direction in ("backward", "forward"):
        ts_key = (
            F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
        )
        filled = unioned.withColumn("_pack", carry(ts_key))
        out = filled.filter(F.col("_side") == 1).drop("_side")
        if tolerance is None:
            return out.select(
                *[c for c in left.columns],
                *[F.col(f"_pack.{c}").alias(c) for c in carried],
            )
        matched = F.col(f"_pack.{ts}{suffix}")
        dist = (
            F.col(ts) - matched
            if direction == "backward"
            else matched - F.col(ts)
        )
        ok = matched.isNotNull() & (dist <= F.lit(tolerance))
        return out.select(
            *[c for c in left.columns],
            *[F.when(ok, F.col(f"_pack.{c}")).alias(c) for c in carried],
        )

    # nearest: both carries over the same partition key — Catalyst
    # plans ONE exchange with two sorted window passes; the per-row
    # pick is pure expression work
    filled = unioned.withColumn("_pbw", carry(F.col(ts).asc())).withColumn(
        "_pfw", carry(F.col(ts).desc())
    )
    out = filled.filter(F.col("_side") == 1)
    bw_ts = F.col(f"_pbw.{ts}{suffix}")
    fw_ts = F.col(f"_pfw.{ts}{suffix}")
    bw_dist = F.col(ts) - bw_ts
    fw_dist = fw_ts - F.col(ts)
    use_bw = bw_ts.isNotNull() & (fw_ts.isNull() | (bw_dist <= fw_dist))
    pick = F.when(use_bw, F.col("_pbw")).otherwise(F.col("_pfw"))
    dist = F.when(use_bw, bw_dist).otherwise(fw_dist)
    ok = pick.isNotNull()
    if tolerance is not None:
        ok = ok & (dist <= F.lit(tolerance))
    return out.select(
        *[c for c in left.columns],
        *[
            F.when(ok, pick.getField(c)).alias(c)
            for c in carried
        ],
    )
