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


def _await_quiet_host(cpus: int, max_wait_s: int = 300,
                      poll_s: int = 15) -> dict:
    """Load-control guard (round-10 lesson: BENCH_r10 read 11.8 s at
    loadavg 10.52 vs 7.6 s quiet — a 53% phantom regression). If the
    1-minute loadavg exceeds cpus/4 at start, wait up to max_wait_s for
    the co-tenant burst to pass, then proceed either way but ANNOTATE the
    JSON line (host_noisy=true) so a hot line is never mistaken for a
    code regression."""
    threshold = cpus / 4.0
    load0 = os.getloadavg()[0]
    waited = 0
    load = load0
    while load > threshold and waited < max_wait_s:
        print(f"bench: loadavg {load:.2f} > {threshold:.1f} "
              f"(cpus/4) — waiting for quiet host ({waited}s/"
              f"{max_wait_s}s)", file=sys.stderr)
        time.sleep(poll_s)
        waited += poll_s
        load = os.getloadavg()[0]
    return {"loadavg_start": round(load0, 2),
            "loadavg_at_run": round(load, 2),
            "quiet_threshold": round(threshold, 2),
            "quiet_wait_s": waited,
            "host_noisy": load > threshold}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    cpus = (int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
            or os.cpu_count() or 4)
    load_info = _await_quiet_host(cpus)

    import __spark_entry__ as entry_mod
    from velesdb_spark.session import get_spark

    spark = get_spark("velesdb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    headline = [
        "groupby_agg",        # TPC-H Q1-style full lineitem aggregation
        "tpch_q3",            # 3-way join + agg + top-10 (shipping priority)
        "having_filter",      # groupBy + HAVING on orders
        "join_two_dims",      # 2-dim star join
        "scalar_subquery",    # subquery + filter scan
        "correlated_subquery",  # EXISTS + correlated scalar decorrelation
        "knn_cosine",         # exact k-NN, single query
        "batch_knn",          # exact k-NN, 4-query batch
        "similarity_threshold",
        "bm25_topk",          # full BM25 pipeline (postings + score join)
        "hybrid_rrf",         # vector ∪ text RRF fusion (scan-path text leg)
        "hybrid_rrf_indexed",  # same fusion on the amortized postings index
        "graph_match_2hop",   # MATCH 2-hop iterative joins
        "graph_bfs",          # multi-source BFS
        "minhash_first_hash", # shingle + MinHash signatures over documents
        "ngram_jaccard",      # inverted-index similarity join
        "exact_dedup",
        "events_hourly",      # time-window aggregation
    ]

    # Warm the session outside timing: compile whole-stage-codegen paths on
    # synthetic data (JIT/codegen caches, shuffle machinery) and populate the
    # in-memory file index per table. No query results are precomputed.
    from pyspark.sql import functions as F

    cat = entry_mod._catalog(spark, sf_dir)
    spark.range(100_000).groupBy((F.col("id") % 10).alias("g")).agg(
        F.sum("id"), F.avg("id"), F.count("*")).collect()
    # warm the iterative-join shapes (broadcast join, union, distinct,
    # left-anti) on a synthetic 200-edge chain graph
    from velesdb_spark.operators import graph as _gr

    synth_edges = spark.range(200).select(
        F.col("id").alias("eid"), F.col("id").alias("src"),
        (F.col("id") + 1).alias("dst"), F.lit("E").alias("label"))
    _gr.bfs(synth_edges, [0, 1], 1, 2).collect()
    # warm the text-pipeline shapes (tokenize arrays, explode + self-join,
    # broadcast-stats crossJoin, takeOrdered) on 100 synthetic docs
    from velesdb_spark.functions import dedup as _dd
    from velesdb_spark.functions.bm25 import bm25_scan_search as _bss

    synth_docs = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("alpha beta gamma delta epsilon doc "),
                 F.col("id").cast("string")).alias("text"))
    _bss(synth_docs, "alpha beta", 5).collect()
    _dd.ngram_jaccard_pairs(synth_docs.limit(30), 0.2, "text", "id").collect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        cat.resolve(t).df.limit(1).collect()

    # amortized text index (the reference's add/search split): postings are
    # built + cached ONCE in warm-up; hybrid_rrf_indexed times search only
    from velesdb_spark.functions.bm25 import Bm25Index
    from velesdb_spark.functions.fusion import fuse_hybrid_rrf
    from velesdb_spark.operators import topk as _tk

    docs_df = cat.resolve("documents").df
    bm25_idx = Bm25Index(docs_df, id_col="doc_id", text_col="text", cache=True)
    bm25_idx.search("alpha", 1).collect()  # materialize the cached postings

    def _hybrid_indexed(s, d):
        emb = cat.resolve("embeddings").df
        vres = _tk.knn(emb, entry_mod.QV1, 20, "cosine", "embedding", "vec_id") \
            .select(F.lit("v").alias("qid"), F.col("vec_id").alias("id"), "score")
        tres = bm25_idx.search("spark query join", 20) \
            .select(F.lit("t").alias("qid"), F.col("doc_id").alias("id"),
                    F.col("_bm25_score").alias("score"))
        fused = fuse_hybrid_rrf(vres.union(tres))
        return fused.orderBy(F.desc("score"), F.asc("id")).limit(10)

    qs = dict(qs)
    qs["hybrid_rrf_indexed"] = _hybrid_indexed

    # pinned measurement protocol: 3 runs per query, report the best (run 1
    # soaks per-query file-scan/codegen caches; best-of-3 strips host-load
    # noise so round-over-round deltas are attributable); loadavg recorded.
    # Round-12 measurement-integrity fix (r11 VERDICT item 2a): staged
    # intra-query intermediates are released BETWEEN reps (and therefore
    # between queries), so the reported min never reads a MEMORY_AND_DISK
    # cache built by an earlier rep or an earlier query sharing the same
    # canonicalized plan (e.g. the graph catalog staged during
    # graph_match_2hop previously stayed warm for graph_bfs). Every rep now
    # pays its query's true staging cost. Numbers under the old protocol
    # are kept in BENCH_LOCAL_r11_final2.json / BENCH_r11.json.
    from velesdb_spark.functions.staging import release_staged

    RUNS = 3
    times: dict[str, float] = {}
    total = 0.0
    for name in headline:
        fn = qs[name]
        best = float("nan")
        for _ in range(RUNS):
            t0 = time.time()
            try:
                fn(spark, sf_dir).collect()
                dt = time.time() - t0
            except Exception as exc:  # keep the harness alive; report it
                print(f"bench query {name} failed: {exc}", file=sys.stderr)
                dt = float("nan")
                release_staged()
                break
            # outside the timed region: drop staged caches so the next rep
            # recomputes from parquet (the warm-up Bm25Index for
            # hybrid_rrf_indexed uses .cache(), not the staging registry,
            # and is deliberately amortized — see "amortized" below)
            release_staged()
            best = dt if best != best else min(best, dt)
        times[name] = round(best, 3)
        if best == best:
            total += best

    print(json.dumps({
        "metric": "total_headline_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "runs_per_query": RUNS,
        "agg": "min",
        # queries timed against an index built+cached in warm-up (the
        # reference's add/search amortization split) — r11 VERDICT item 2b
        "amortized": ["hybrid_rrf_indexed"],
        "staged_released_between_reps": True,
        "loadavg_1m": round(os.getloadavg()[0], 2),
        **load_info,
    }))


if __name__ == "__main__":
    main()
