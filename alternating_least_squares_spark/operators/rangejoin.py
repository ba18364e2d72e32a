"""Range (interval) join — points to containing intervals.

Spark evaluates a plain ``p.ts BETWEEN i.start AND i.end`` join as
BroadcastNestedLoopJoin (quadratic; fine only when one side
broadcasts). The scalable formulation is the classic **binned range
join** (what Databricks' range-join optimization does under the
hood):

1. pick a bin width; each interval explodes to the bins it covers
   (``sequence(start DIV w, end DIV w)`` — a generator, no shuffle);
2. each point maps to its single bin;
3. equi-join on (key, bin) — THE shuffle, fan-out bounded by
   interval_length / bin_width;
4. re-check the exact range predicate (bins over-approximate).

Bin width trades replication (long intervals → many bins) against
candidate pruning (wide bins → more false candidates). A width near
the median interval length keeps both ~O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point (``key``, ``ts``) to every interval of the same
    key with ``start ≤ ts ≤ end`` (inclusive both ends; integer
    domains — use epoch micros for timestamps).

    ``how='inner'`` only: a left variant would need an extra anti-join
    for unmatched points; compose it from this primitive if needed.
    """
    if how != "inner":
        raise ValueError("range_join supports inner only; compose left "
                         "from inner + left_anti on the points side")
    if bin_width < 1:
        raise ValueError(
            f"bin_width must be >= 1 (got {bin_width}): DIV 0 is a "
            "runtime DIVIDE_BY_ZERO under ANSI, silent row loss without"
        )
    for side, df in (("points", points), ("intervals", intervals)):
        if "_bin" in df.columns:
            raise ValueError(
                f"range_join reserves the column name '_bin' "
                f"(present in {side}); rename it"
            )
    # integer DIV, not `/`: double division + cast truncates AFTER fp
    # rounding and can land in the wrong bin. DIV is monotone, so
    # start ≤ ts ≤ end ⟹ the point's bin is inside the interval's
    # bin sequence.
    binned_i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{start} DIV {bin_width}"),
                F.expr(f"{end} DIV {bin_width}"),
            )
        ),
    )
    binned_p = points.withColumn("_bin", F.expr(f"{ts} DIV {bin_width}"))
    return (
        binned_p.join(binned_i, [key, "_bin"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_l: str,
    end_l: str,
    start_r: str,
    end_r: str,
    bin_width: int,
) -> DataFrame:
    """Interval×interval overlap join (inclusive ends, integer
    domains): every (left, right) pair with
    ``start_l ≤ end_r AND start_r ≤ end_l`` — the join shape Spark has
    no native operator for (a raw inequality join plans as a
    nested-loop product).

    Same binned formulation as :func:`range_join`, with the
    **canonical-bin trick** replacing pair dedup: both sides explode
    to their covering bins and equi-join on the bin, but a candidate
    survives only in the bin containing ``greatest(start_l, start_r)``
    — the overlap's first instant, which lies inside BOTH intervals,
    so every overlapping pair is emitted from EXACTLY one bin. No
    ``distinct`` over the (wide) pair stream, which at 100 TB would be
    a second full shuffle of the output.

    Column names must be disjoint across the two inputs (standard
    Spark join hygiene — rename before calling)."""
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1 (got {bin_width})")
    dup = set(left.columns) & set(right.columns)
    if dup:
        raise ValueError(
            f"interval_overlap_join needs disjoint column names; both "
            f"sides carry {sorted(dup)}"
        )
    for side, df in (("left", left), ("right", right)):
        if "_bin" in df.columns:
            raise ValueError(
                f"interval_overlap_join reserves '_bin' (present in "
                f"{side}); rename it"
            )
    # trunc DIV is monotone non-decreasing, so an interval's covering
    # bins are exactly [start DIV w, end DIV w] and the overlap-start
    # bin is shared by both sides whenever the intervals overlap.
    def _binned(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.expr(f"{s} DIV {bin_width}"),
                    F.expr(f"{e} DIV {bin_width}"),
                )
            ),
        )

    return (
        _binned(left, start_l, end_l)
        .join(_binned(right, start_r, end_r), "_bin")
        .filter(
            (F.col(start_l) <= F.col(end_r))
            & (F.col(start_r) <= F.col(end_l))
            & (
                F.col("_bin")
                == F.expr(f"greatest({start_l}, {start_r}) DIV {bin_width}")
            )
        )
        .drop("_bin")
    )
