"""Decompose per-query bench time into driver-side plan CONSTRUCTION
(the queries()-callable body: DataFrame building, py4j traffic, any
eager staging materialization) vs EXECUTION (collect of an
already-built frame) — guide §1 stage decomposition for the sf0.1
regime where the bench's wall time is often dominated by the driver.

Usage: python tools/decompose_queries.py name1,name2,... [runs]

Per query and run: t_build = time to call fn(spark, sf_dir);
t_collect = time to .collect() that same frame; a fresh frame is built
for every run (no plan reuse across runs). Prints one JSON line per
query with min/median over runs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from velesdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("velesdb-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    from pyspark.sql import functions as F

    spark.range(100_000).groupBy((F.col("id") % 10).alias("g")).agg(
        F.sum("id"), F.avg("id"), F.count("*")).collect()
    cat = entry_mod._catalog(spark, sf_dir)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        cat.resolve(t).df.limit(1).collect()

    for name in names:
        fn = qs[name]
        builds, collects, rows = [], [], None
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"decompose:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            out = df.collect()
            t2 = time.time()
            builds.append(t1 - t0)
            collects.append(t2 - t1)
            rows = len(out)
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({
            "query": name,
            "rows": rows,
            "build_min": round(min(builds), 3),
            "build_med": round(statistics.median(builds), 3),
            "collect_min": round(min(collects), 3),
            "collect_med": round(statistics.median(collects), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
