"""Next-decade scaling evidence (round-8 verdict #2): run the steepest
headline queries at two scale factors in ONE Spark session and report the
per-query time ratio vs the 10× data growth. A ratio <= 10 is sublinear
(fixed overhead amortizing or better); > 10 is superlinear and gets
flagged in the output.

The ngram_jaccard row runs on the OPEN-vocabulary (Zipf) fixture pair —
the corpus shape real pipelines dedup, where the round-8 auto strategy
picks the prefix-filtering join. The closed-vocabulary fixture's
all-pairs output is itself quadratic in sf (every doc shares bigrams
with every other), so no exact algorithm can scale it; that regime is
covered by the documented max_shingle_df cap instead (see
BENCH_LOCAL_r08_zipf.json / _closed.json for the strategy trade-off).

Usage: python tools/bench_scaling.py <small_dir> <big_dir>
         [--zipf-small d] [--zipf-big d] [--json out.json] [--runs 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = ["correlated_subquery", "bm25_topk", "hybrid_rrf",
           "minhash_first_hash", "exact_dedup", "ngram_jaccard",
           "decontam_fixed_eval", "epoch_shuffle", "repetition_stats",
           "tpch_q3", "tpch_q13", "tpch_q18",
           # completion-batch representatives: Q1 = scan-bound exact
           # integer aggregate, Q9 = 5-way join + 175-group agg, Q21 =
           # double-distinct per-order decorrelation
           "tpch_q1", "tpch_q9", "tpch_q21",
           # round-8 session-3 operators: gapfill = spine fan-out +
           # group-partitioned LOCF window, kmeans = 3 literal-centroid
           # map rounds + combinable k-group aggregates, mmr = exact
           # top-pool scan + bounded driver greedy
           "events_gapfill", "kmeans_docs", "mmr_rerank",
           # round-8 session-4 operators: lm = two corpus scans into
           # vocab-bounded count tables + equi-join scoring, dsir = lm
           # twice + id join, dhash pairs = mapInPandas decode + banded
           # equi-join on 16-bit keys
           "lm_perplexity", "dsir_logratio", "media_dhash_pairs",
           "events_retention", "graph_sssp", "zipf_slope",
           "table_profile",
           # round-9: the heavy dedup/text family in the realistic
           # curation regime (verdict r8 task 4) — cluster/keep-reps at
           # threshold 0.6 with planted dups, full-corpus banded LSH
           # embedding near-dup (Spark-only; the gate caps its corpus
           # for the quadratic DuckDB oracle, not for Spark), trigram
           # fuzzy ranked search, and the two-micro-batch streaming
           # near-dup ingest over the full corpus
           "dedup_clusters", "dedup_keep_reps",
           "embedding_near_dups_lsh_full", "fuzzy_trigram",
           "stream_neardup_full"]


def main():
    args = sys.argv[1:]
    out_json, runs = None, 3
    zsmall = zbig = None
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    for flag in ("--json", "--runs", "--zipf-small", "--zipf-big"):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i:i + 2]
            if flag == "--json":
                out_json = v
            elif flag == "--runs":
                runs = int(v)
            elif flag == "--zipf-small":
                zsmall = v
            else:
                zbig = v
    small_dir, big_dir = args[0], args[1]

    import __spark_entry__ as entry_mod
    from velesdb_spark.session import get_spark

    spark = get_spark("velesdb-spark-scaling-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # the n-gram dedup family runs on the OPEN-vocabulary (Zipf) fixtures
    # when provided — the corpus shape real pipelines dedup. The closed-
    # vocab TPC-H-ish documents fixture makes every doc share bigrams with
    # every other, so the inverted-index candidate set is Σdf²-quadratic
    # BY CONSTRUCTION (round-10 run: sf10 filled 78 GB of shuffle spill);
    # no exact n-gram algorithm scales that regime — it is covered by the
    # documented max_shingle_df cap instead, not by this curve.
    ZIPF_QUERIES = {"ngram_jaccard", "dedup_clusters", "dedup_keep_reps"}

    def dirs_for(name):
        if name in ZIPF_QUERIES and zsmall and zbig:
            return zsmall, zbig
        return small_dir, big_dir

    def best_of(fn, d, action="collect"):
        from velesdb_spark.functions import staging as _staging

        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            getattr(fn(spark, d), action)()
            best = min(best, time.time() - t0)
            # release AFTER the action: unpersisting the staged shingle/tf
            # frames before the run both re-pays the tokenize per consuming
            # branch AND strips the size statistics Catalyst needs to keep
            # the ngram join off the broadcast path (round-10 zipf10 run:
            # an 8g-driver broadcast OOM with the persists released early)
            _staging.release_staged()
        return round(best, 3)

    def decontam_fixed_eval(s, d):
        # the 100 TB decontamination regime: the EVAL side is a FIXED
        # benchmark suite (doc_id < 1000, identical at both scales) and
        # only the training corpus grows — scaling both sides 10x would
        # measure a quadratic regime that does not exist in production
        from pyspark.sql import functions as _F

        from velesdb_spark.functions import decontam as _dct
        from velesdb_spark.functions import dedup as _dd

        docs = s.read.parquet(f"{d}/documents.parquet") \
            .selectExpr("doc_id as id", "text")
        ev = docs.filter((_F.col("id") % 17 == 0) & (_F.col("id") < 1000))
        train = docs.filter((_F.col("id") % 17 != 0) | (_F.col("id") >= 1000))
        out = _dct.contamination_report(train, ev, "text", "id",
                                        min_shared=2)
        _dd.release_staged()
        return out

    def epoch_shuffle_q(s, d):
        from velesdb_spark.functions.sampling import epoch_shuffle as _es

        docs = s.read.parquet(f"{d}/documents.parquet").select("doc_id")
        return _es(docs, "bench", "doc_id")

    def repetition_q(s, d):
        from velesdb_spark.functions.text_analysis import \
            repetition_stats_df as _rs

        docs = s.read.parquet(f"{d}/documents.parquet")
        return _rs(docs, "text", "doc_id")

    def lm_force(s, d):
        # a bare count() of the left-joined score output lets Catalyst
        # ELIMINATE the whole scoring plan (join elimination: counting a
        # left join needs only the left side) — aggregate the score
        # columns so the models actually compute
        from pyspark.sql import functions as _F

        return qs["lm_perplexity"](s, d).agg(_F.sum("avg_nll"),
                                             _F.sum("n_bigrams"))

    def dsir_force(s, d):
        from pyspark.sql import functions as _F

        return qs["dsir_logratio"](s, d).agg(_F.sum("log_ratio"),
                                             _F.sum("n_bigrams"))

    def clusters_q(s, d):
        return qs["dedup_clusters"](s, d)

    def keep_reps_q(s, d):
        return qs["dedup_keep_reps"](s, d)

    def emb_lsh_full(s, d):
        # FULL corpus (the entry gate caps vec_id < 5000 only to bound
        # its O(N^2) DuckDB oracle); planted half-scale duplicates as in
        # the gate, banded hyperplane LSH end to end
        from pyspark.sql import functions as _F

        from velesdb_spark.functions import dedup as _dd

        emb = s.read.parquet(f"{d}/embeddings.parquet") \
            .select("vec_id", "embedding")
        dup = emb.select(
            (_F.col("vec_id") + 10_000_000).alias("vec_id"),
            _F.transform("embedding",
                         lambda x: (x * _F.lit(0.5)).cast("float"))
            .alias("embedding"))
        return _dd.embedding_near_dups(
            emb.unionByName(dup), 0.999, "embedding", "vec_id",
            method="lsh", dim=64)

    def stream_neardup_full(s, d):
        # full corpus in two parity micro-batches (the entry gate slices
        # doc_id < 2000 because per-batch cost, not corpus size, is the
        # design property — this variant measures the whole drain)
        import os as _os
        import tempfile as _tf

        from pyspark.sql import functions as _F

        from velesdb_spark.streaming.events import read_docs_stream
        from velesdb_spark.streaming.neardup import (
            StreamingNearDupStore, stream_docs_into_neardup)

        docs = s.read.parquet(f"{d}/documents.parquet") \
            .select("doc_id", "text")
        root = _tf.mkdtemp(prefix="neardup_scale_")
        stage = f"{root}/stage"
        _os.makedirs(stage)
        for i in (0, 1):
            part = f"{root}/b{i}"
            docs.filter(_F.col("doc_id") % 2 == i).coalesce(4) \
                .write.parquet(part)
            for j, fn in enumerate(sorted(_os.listdir(part))):
                if fn.endswith(".parquet"):
                    _os.rename(f"{part}/{fn}", f"{stage}/b{i}_{j}.parquet")
        store = StreamingNearDupStore(s, f"{root}/store", id_col="doc_id")
        stream_docs_into_neardup(read_docs_stream(s, stage), store,
                                 f"{root}/ckpt")
        return store.accepted()

    CUSTOM = {"decontam_fixed_eval": (decontam_fixed_eval, "count"),
              "epoch_shuffle": (epoch_shuffle_q, "count"),
              "repetition_stats": (repetition_q, "count"),
              "lm_perplexity": (lm_force, "collect"),
              "dsir_logratio": (dsir_force, "collect"),
              "dedup_clusters": (clusters_q, "count"),
              "dedup_keep_reps": (keep_reps_q, "count"),
              "embedding_near_dups_lsh_full": (emb_lsh_full, "count"),
              "stream_neardup_full": (stream_neardup_full, "count")}

    def ngram_zipf(s, d):
        # the dedup regime (t=0.6) on the open-vocab corpus, NOT the
        # entry gate's t=0.2 exploratory threshold: at 0.2 a Zipf corpus
        # legitimately has millions of qualifying pairs (head-bigram
        # overlap), which measures driver collect, not the join
        from velesdb_spark.functions import dedup as _dd

        docs = s.read.parquet(f"{d}/documents.parquet") \
            .selectExpr("doc_id as id", "text")
        out = _dd.ngram_jaccard_pairs(docs, 0.6, "text", "id")
        _dd.release_staged()
        return out

    # warm both catalogs + codegen outside timing
    for d in {small_dir, big_dir, zsmall, zbig} - {None}:
        entry_mod._catalog(spark, d)

    rec = {"small_dir": small_dir, "big_dir": big_dir,
           "zipf_dirs": [zsmall, zbig], "runs_per_query": runs,
           "agg": "min", "loadavg_1m": round(os.getloadavg()[0], 2),
           "queries": {}}
    superlinear = []
    for name in QUERIES:
        if only is not None and name not in only:
            continue
        ds, db = dirs_for(name)
        if name == "ngram_jaccard" and zsmall and zbig:
            t_small = best_of(ngram_zipf, ds, action="count")
            t_big = best_of(ngram_zipf, db, action="count")
        elif name in CUSTOM:
            fn, action = CUSTOM[name]
            t_small = best_of(fn, ds, action=action)
            t_big = best_of(fn, db, action=action)
        elif name == "correlated_subquery":
            # the tagged-union result SCALES with the data (1.8M rows at
            # sf1, 18M at sf10): collect() would measure driver
            # serialization, not the decorrelated joins — count() runs
            # the same plan (the union's inner/semi joins are
            # cardinality-bearing, so count cannot eliminate them)
            t_small = best_of(qs[name], ds, action="count")
            t_big = best_of(qs[name], db, action="count")
        else:
            t_small = best_of(qs[name], ds)
            t_big = best_of(qs[name], db)
        ratio = round(t_big / max(t_small, 1e-9), 2)
        rec["queries"][name] = {"small_sec": t_small, "big_sec": t_big,
                                "ratio_at_10x_data": ratio,
                                "fixture": "zipf" if ds != small_dir
                                else "sf"}
        if ratio > 10.0:
            superlinear.append(name)
        print(f"  {name}: {t_small}s -> {t_big}s  ratio {ratio}",
              file=sys.stderr)
    rec["superlinear"] = superlinear
    line = json.dumps(rec)
    print(line)
    if out_json:
        with open(out_json, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
