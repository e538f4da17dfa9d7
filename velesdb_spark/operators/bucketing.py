"""Bucketed storage for co-located joins.

At 100 TB the dominant cost of fact-fact joins is the shuffle. Writing both
sides bucketed (and sorted) by the join key lets Spark plan a SortMergeJoin
with NO Exchange on either side — each task reads matching buckets directly.
This module wraps that layout; `tests` assert the Exchange-free plan.

The reference has no distributed analog (single-process hash join,
collection/search/query/join.rs); this is the Spark-native equivalent of its
"primary-key hash index" join acceleration at cluster scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: Sequence[str],
                   buckets: int = 32, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (+sorted) managed table on ``keys``."""
    w = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   left_key: str, right_key: str,
                   how: str = "inner") -> DataFrame:
    """Join two tables bucketed on their join keys. When bucket counts
    match, the plan contains no Exchange (verify with df.explain())."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key], how)
