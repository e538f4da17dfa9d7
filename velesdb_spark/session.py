"""SparkSession factory with scale-aware defaults.

Defaults target local[N] testing but are chosen to survive a 1000-executor
cluster: AQE on (runtime coalescing + skew-join handling), Arrow enabled for
the few pandas-UDF paths, shuffle partitions sized by cores locally (on a real
cluster AQE coalesces from a higher initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "velesdb-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        # InferFiltersFromGenerate synthesizes size(e)>0 from every
        # explode(e) and pushes it toward the scan — when e is an
        # expensive derived array (tokenize→shingle pipelines: ngram,
        # minhash, decontam, packing) the WHOLE expression is duplicated
        # into a filter that lands BELOW the parallelizing repartition,
        # so it runs twice per row and serialized on the input's file
        # splits (measured: contamination_report at sf1 91 s → 6.7 s
        # with the rule off). Our explode inputs are never empty-heavy,
        # so the rule's row-skipping upside is nil.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer."
                "InferFiltersFromGenerate")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
