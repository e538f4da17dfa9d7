"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the input
    is backed by too few files (e.g. a single small parquet file would
    otherwise run every downstream expression single-threaded). Decided
    from the leaf file count — no RDD conversion, no job. No-op for
    in-memory relations (createDataFrame already slices by parallelism)
    and on a real cluster reading many files this never fires."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    files = df.inputFiles()
    if files and len(files) * min_factor <= target:
        return df.repartition(target)
    return df
