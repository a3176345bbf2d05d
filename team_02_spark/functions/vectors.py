"""Vector math over ``array<float>`` columns as JVM higher-order
functions — no Python crossing, so these run inside whole-stage codegen
and scale to 100 TB of embeddings.

Used by the similarity-search lane (operators/similarity.py) and the
embedding-cosine near-dup lane (operators/dedup.py). SURVEY.md §2.4 J5.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (pure JVM). Elements are
    cast to double BEFORE multiplying: float*float in Spark is a
    float32 multiply, which would diverge from any double-precision
    oracle; double accumulation left-to-right is reproducible across
    engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector is all-zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def normalize(a: Column) -> Column:
    """Unit-normalize; all-zero vectors pass through unchanged."""
    n = l2_norm(a)
    return F.when(n == 0.0, a).otherwise(
        F.transform(a, lambda x: (x / n).cast("float"))
    )
