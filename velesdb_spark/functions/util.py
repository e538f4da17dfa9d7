"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the input has
    too few partitions (e.g. a single small parquet file would otherwise run
    every downstream expression single-threaded). No-op when already spread —
    on a real cluster reading many files this never fires."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor <= target:
        return df.repartition(target)
    return df
