"""Vector math over `array<float>` embedding columns — built on
higher-order functions (`zip_with`, `aggregate`) so the arithmetic
runs JVM-side per row with no Python round-trip.  This is the
similarity-search primitive set for the LLM-data-pipeline operators.

Accumulate in double regardless of the storage type (float32
embeddings) — at 64–4096 dims float accumulation error is visible in
top-k ordering.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a: Column | str, b: Column | str) -> Column:
    prod = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    sq = F.aggregate(
        _col(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) with a zero-norm guard (ANSI-safe)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))
