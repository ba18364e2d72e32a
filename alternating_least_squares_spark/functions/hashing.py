"""Shared deterministic content-hash bucketing.

One definition for the md5-prefix bucket used by the samplers
(x02/x03/x06), and the ML train/holdout split (ml/classifier.py): a
content hash — unlike a seeded RNG — survives repartitioning, engine
swaps, and reruns unchanged, which is what makes hash-split outputs
oracle-checkable and row-stable. The DuckDB twin of this expression is
``registry._hex4_sql`` — change BOTH or neither.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hex4_bucket(col: Column) -> Column:
    """First 4 hex digits of md5(col) as a long in [0, 65536)."""
    return F.conv(F.md5(col.cast("string")).substr(1, 4), 16, 10).cast("long")
