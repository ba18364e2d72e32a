"""Dense-embedding column math (array<float> columns).

Native ``F.zip_with`` / ``F.aggregate`` higher-order functions — these
evaluate inside the JVM per row over the array, no Python, no
explode-shuffle. For 64-dim embeddings this is the right tradeoff at
any scale; a Pandas-UDF/BLAS path only wins for ≫1k dims.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def vec_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero-norm vectors (returns NULL,
    matching DuckDB's list_cosine_similarity semantics of div-by-zero
    → NULL)."""
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
