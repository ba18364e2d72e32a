"""Z-order (Morton-curve) clustering for multi-column data skipping.

A table sorted by ``a`` prunes scans filtered on ``a`` but not on
``b`` — every file spans the full ``b`` domain. Interleaving the bits
of both columns into one sort key (the Z-order / Morton curve, the
public technique behind Delta's OPTIMIZE ZORDER BY and Iceberg's
sort-order z-curves) makes every file a small RECTANGLE in (a, b)
space, so parquet min/max stats prune on EITHER dimension.

The Morton code is a pure bit-shuffle, built here as a fixed
expression tree of shift/mask/or terms — whole-stage-codegen JVM
arithmetic, no UDF — and the identical arithmetic is emitted as a
DuckDB SQL fragment so the layout key itself is oracle-checkable
(registry ``ac03``).

At 100 TB: ``zorder_write`` is one range-repartition shuffle on the
z key plus a within-partition sort — exactly the cost of a plain
sorted write — and every later scan with a selective filter on any
clustered dimension reads a O(selectivity) slice of the files instead
of all of them. The pruning claim is asserted empirically in
tests/test_zorder.py by comparing per-file (min, max) boxes of a
z-ordered vs linearly-sorted layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 21 bits per dimension -> 42-bit codes: two full int21 domains fit a
# long with room to spare
DEFAULT_BITS = 21


def morton_code(a: Column, b: Column, bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i = bit i of ``a``, bit 2i+1 = bit i of ``b``.
    Inputs are masked to ``bits`` first, so out-of-range values wrap
    rather than corrupt higher positions."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31] (got {bits})")
    mask = (1 << bits) - 1
    am = a.cast("long").bitwiseAND(F.lit(mask))
    bm = b.cast("long").bitwiseAND(F.lit(mask))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(am, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(bm, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def morton_code_py(a: int, b: int, bits: int = DEFAULT_BITS) -> int:
    """Driver-side twin of :func:`morton_code` — same interleave, same
    masking — for computing the z-interval of a query rectangle:
    the code is monotone in each coordinate (it decomposes as
    spread(a) + 2·spread(b) with spread strictly increasing), so every
    point of [a_lo, a_hi] × [b_lo, b_hi] has its z in
    [morton(a_lo, b_lo), morton(a_hi, b_hi)] — the (possibly loose)
    superset interval :func:`sources.snapshot.read_key_range` prunes
    files with."""
    mask = (1 << bits) - 1
    a &= mask
    b &= mask
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def morton_code_sql(a: str, b: str, bits: int = DEFAULT_BITS) -> str:
    """DuckDB twin of :func:`morton_code` — same shift/mask/or tree,
    same masking, so both engines produce identical codes."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((((({a}) & {mask}) >> {i}) & 1) << {2 * i})")
        terms.append(f"((((({b}) & {mask}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-curve of (col_a, col_b): range-repartition on the Morton code
    (one shuffle), sort within each partition (so parquet row-group
    stats are tight too), drop the helper column, write."""
    if "_z" in df.columns:
        raise ValueError("zorder_write reserves the column name '_z'; rename")
    (
        df.withColumn("_z", morton_code(F.col(col_a), F.col(col_b), bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
