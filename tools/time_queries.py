"""Focused per-query timing harness for optimization A/B work.

Usage: python tools/time_queries.py name1,name2,... [runs]

Times each named declared query with the same methodology as bench.py
(collect() the declared frame, best-of-N) plus a noop-sink timing
(guide §1.4: computes every column, isolates computation from the
result fetch). Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from velesdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("velesdb-time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # session warmup: same shapes bench.py warms
    from pyspark.sql import functions as F

    spark.range(100_000).groupBy((F.col("id") % 10).alias("g")).agg(
        F.sum("id"), F.avg("id"), F.count("*")).collect()
    cat = entry_mod._catalog(spark, sf_dir)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        cat.resolve(t).df.limit(1).collect()

    for name in names:
        fn = qs[name]
        coll, noop = [], []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"time:{name}:collect")
            t0 = time.time()
            fn(spark, sf_dir).collect()
            coll.append(time.time() - t0)
            spark.sparkContext.setJobDescription(f"time:{name}:noop")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({
            "query": name,
            "collect_min": round(min(coll), 3),
            "collect_all": [round(x, 3) for x in coll],
            "noop_min": round(min(noop), 3),
            "noop_all": [round(x, 3) for x in noop],
        }), flush=True)


if __name__ == "__main__":
    main()
