"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "total_headline_sec", "value": N, "unit": "sec",
 "queries": {name: sec, ...}, "sf": X}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    import __spark_entry__ as entry_mod
    from velesdb_spark.session import get_spark

    spark = get_spark("velesdb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    headline = [
        "groupby_agg",        # TPC-H Q1-style full lineitem aggregation
        "having_filter",      # groupBy + HAVING on orders
        "join_two_dims",      # 2-dim star join
        "scalar_subquery",    # subquery + filter scan
        "knn_cosine",         # exact k-NN, single query
        "batch_knn",          # exact k-NN, 4-query batch
        "similarity_threshold",
        "bm25_topk",          # full BM25 pipeline (postings + score join)
        "hybrid_rrf",         # vector ∪ text RRF fusion
        "graph_match_2hop",   # MATCH 2-hop iterative joins
        "graph_bfs",          # multi-source BFS
        "minhash_first_hash", # shingle + MinHash signatures over documents
        "ngram_jaccard",      # inverted-index similarity join
        "exact_dedup",
        "events_hourly",      # time-window aggregation
    ]

    # warm the session + table cache outside timing
    entry_mod._catalog(spark, sf_dir)

    times: dict[str, float] = {}
    total = 0.0
    for name in headline:
        fn = qs[name]
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.collect()
            dt = time.time() - t0
        except Exception as exc:  # keep the harness alive; report the failure
            print(f"bench query {name} failed: {exc}", file=sys.stderr)
            dt = float("nan")
        times[name] = round(dt, 3)
        if dt == dt:
            total += dt

    print(json.dumps({
        "metric": "total_headline_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
