"""Small engine-wide utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ONLY if the input has fewer partitions than the
    cluster has cores. A small parquet file scans as 1 partition and
    would serialize every downstream explode / pandas_udf onto one
    core; one cheap round-robin shuffle of the narrow input unlocks
    full parallelism. Inputs that are already well-partitioned (the
    100 TB case) pass through untouched — no extra shuffle."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
