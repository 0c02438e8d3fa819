"""Small physical-plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition to cluster parallelism when the input is
    under-partitioned (e.g. a single small parquet file). CPU-heavy narrow
    work (per-row hashing, UDF kernels) otherwise runs in however many tasks
    the SCAN produced, which has nothing to do with how expensive the
    downstream expressions are. No-op when already parallel enough."""
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
