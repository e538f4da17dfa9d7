"""SparkSession factory with scale-aware defaults.

Defaults target local[N] testing but are chosen to survive a 1000-executor
cluster: AQE on (runtime coalescing + skew-join handling), Arrow enabled for
the few pandas-UDF paths, shuffle partitions sized by cores locally (on a real
cluster AQE coalesces from a higher initial number).
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import SparkSession

_INFER_GENERATE_RULE = ("org.apache.spark.sql.catalyst.optimizer."
                        "InferFiltersFromGenerate")


def get_spark(app_name: str = "velesdb-spark", cpus: int | None = None,
              infer_generate_filters: bool = False) -> SparkSession:
    """``infer_generate_filters=True`` keeps Catalyst's
    InferFiltersFromGenerate rule enabled — the escape hatch for
    workloads over genuinely EMPTY-HEAVY user arrays, where the inferred
    size(e)>0 filter's row skipping outweighs the duplication risk the
    default exclusion protects against (see the excludedRules comment
    below; scoping can also be flipped per-query with
    infer_generate_filters_enabled())."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # PySpark's DataFrame-context debugging (SPARK-47274) wraps EVERY
        # DataFrame/Column API call with ~4 extra py4j round-trips
        # (getActiveSession + a conf RPC + JVM origin set/clear) to record
        # the Python call site for error messages. At sf0.1 the bench's
        # wall time is ~35% driver-side plan construction, and this
        # wrapper alone is 20-45% of that (measured: bm25_topk build
        # 0.365 -> 0.205 s, hybrid_rrf 0.598 -> 0.415 s, min-of-5
        # interleaved). Static conf — must be set before the JVM starts;
        # errors lose only the Python-side call-site line, not the
        # message or SQLSTATE.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    if not infer_generate_filters:
        # InferFiltersFromGenerate synthesizes size(e)>0 from every
        # explode(e) and pushes it toward the scan — when e is an
        # expensive derived array (tokenize→shingle pipelines: ngram,
        # minhash, decontam, packing) the WHOLE expression is duplicated
        # into a filter that lands BELOW the parallelizing repartition,
        # so it runs twice per row and serialized on the input's file
        # splits (measured: contamination_report at sf1 91 s → 6.7 s
        # with the rule off). Our explode inputs are never empty-heavy,
        # so the rule's row-skipping upside is nil. A user workload over
        # sparse arrays can opt back in (infer_generate_filters=True, or
        # per-query via infer_generate_filters_enabled()).
        builder = builder.config("spark.sql.optimizer.excludedRules",
                                 _INFER_GENERATE_RULE)
    spark = builder.getOrCreate()
    # getOrCreate() reuses an existing session without re-applying configs;
    # excludedRules is runtime-settable, so enforce the requested scoping
    # on the live session either way.
    current = spark.conf.get("spark.sql.optimizer.excludedRules", "") or ""
    if infer_generate_filters:
        rules = [r for r in current.split(",") if r and r != _INFER_GENERATE_RULE]
        spark.conf.set("spark.sql.optimizer.excludedRules", ",".join(rules))
    elif _INFER_GENERATE_RULE not in current:
        rules = [r for r in current.split(",") if r] + [_INFER_GENERATE_RULE]
        spark.conf.set("spark.sql.optimizer.excludedRules", ",".join(rules))
    return spark


@contextlib.contextmanager
def infer_generate_filters_enabled(spark: SparkSession):
    """Temporarily re-enable InferFiltersFromGenerate for one query —
    the per-query scoping of the session-wide exclusion. Use when an
    explode input is a genuinely empty-heavy USER array (most rows
    empty), where the inferred size(e)>0 filter skips rows cheaply and
    the array is a stored column (nothing expensive to duplicate):

        with infer_generate_filters_enabled(spark):
            df = docs.select(F.explode("sparse_tags")).count()

    Restores the previous exclusion list on exit, even on error."""
    before = spark.conf.get("spark.sql.optimizer.excludedRules", "") or ""
    rules = [r for r in before.split(",") if r and r != _INFER_GENERATE_RULE]
    spark.conf.set("spark.sql.optimizer.excludedRules", ",".join(rules))
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.optimizer.excludedRules", before)
