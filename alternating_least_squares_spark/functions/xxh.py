"""Bit-exact NumPy replica of Spark's ``xxhash64`` over fixed-width
integers — the Python half of the mapInArrow MinHash fast path.

Spark's ``xxhash64(c1, c2, ...)`` expression (catalyst ``XxHash64``)
folds the children left-to-right through the XXH64 *short-input*
paths, starting from seed 42 and skipping NULLs:

    hash = 42
    hash = hashInt(c1, hash)     # IntegerType child
    hash = hashLong(c2, hash)    # LongType child
    # ArrayType child: fold hashLong/hashInt over the elements,
    # skipping NULL elements

``hashInt`` / ``hashLong`` are the XXH64 specializations for 4- and
8-byte inputs (org.apache.spark.sql.catalyst.expressions.XXH64 —
public Apache Spark source). Both are pure 64-bit modular arithmetic,
so a NumPy ``uint64`` vectorization reproduces them bit-for-bit; the
parity is pinned against the JVM implementation by
tests/test_r19_optimizations.py on thousands of random values.

Everything here operates on (arrays of) ``np.uint64`` with wrapping
semantics; callers reinterpret to/from signed int64 with ``.view()``
(no value conversion) at the boundary, because Spark longs are the
same 64 bits under two's complement.
"""

from __future__ import annotations

import numpy as np

PRIME64_1 = np.uint64(0x9E3779B185EBCA87)
PRIME64_2 = np.uint64(0xC2B2AE3D27D4EB4F)
PRIME64_3 = np.uint64(0x165667B19E3779F9)
PRIME64_4 = np.uint64(0x85EBCA77C2B2AE63)
PRIME64_5 = np.uint64(0x27D4EB2F165667C5)

_U32_MASK = np.uint64(0xFFFFFFFF)
_SEED = np.uint64(42)  # Spark's fixed xxhash64 seed


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    rr = np.uint64(r)
    return (x << rr) | (x >> (np.uint64(64) - rr))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * PRIME64_2
    h = h ^ (h >> np.uint64(29))
    h = h * PRIME64_3
    h = h ^ (h >> np.uint64(32))
    return h


def hash_long(value: np.ndarray | np.uint64, seed: np.ndarray | np.uint64):
    """XXH64.hashLong(value, seed) — the 8-byte input path.
    ``value``/``seed`` are uint64 scalars or arrays (broadcast)."""
    with np.errstate(over="ignore"):
        h = seed + PRIME64_5 + np.uint64(8)
        h = h ^ (_rotl(value * PRIME64_2, 31) * PRIME64_1)
        h = _rotl(h, 27) * PRIME64_1 + PRIME64_4
        return _fmix(h)


def hash_int(value: np.ndarray | np.uint64, seed: np.ndarray | np.uint64):
    """XXH64.hashInt(value, seed) — the 4-byte input path. ``value``
    must already be the unsigned-32 reinterpretation of the Java int
    (i.e. ``int_value & 0xFFFFFFFF``), held in uint64."""
    with np.errstate(over="ignore"):
        h = seed + PRIME64_5 + np.uint64(4)
        h = h ^ ((value & _U32_MASK) * PRIME64_1)
        h = _rotl(h, 23) * PRIME64_2 + PRIME64_3
        return _fmix(h)


def xxhash64_int_seed(j: int) -> np.uint64:
    """``xxhash64(lit(j))`` for an int literal — i.e. hashInt(j, 42).
    This is the per-permutation / per-band folded seed: Spark's
    ``xxhash64(j, x)`` == hashLong(x, hashInt(j, 42))."""
    return hash_int(np.uint64(j & 0xFFFFFFFF), _SEED)
