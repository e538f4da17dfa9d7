"""Measure the ngram_jaccard strategy trade-off on a documents fixture:
plain inverted-index all-pairs vs exact prefix-filtering join vs the
auto probe (round-8 verdict #1 — prove the prefix win on an OPEN
vocabulary, where the round-7 closed-vocab measurement showed a 2× loss).

Reports, as one JSON line (and optionally --json <path>):
  - candidate-pair counts for both strategies (plain = Σ df·(df−1)/2,
    one aggregate — computable even when running the plain join is not);
  - the auto probe's choice;
  - wall time + output rows for each strategy actually run (plain is
    skipped with --skip-plain when its candidate count is infeasible);
  - result equality plain vs prefix when both run.

Usage: python tools/bench_ngram.py <docs_dir> [threshold] [--skip-plain]
         [--limit N] [--json out.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from velesdb_spark.functions import dedup  # noqa: E402
from velesdb_spark.session import get_spark  # noqa: E402


def main():
    args = sys.argv[1:]
    skip_plain = "--skip-plain" in args
    if skip_plain:
        args.remove("--skip-plain")
    out_json = None
    if "--json" in args:
        i = args.index("--json")
        out_json = args[i + 1]
        del args[i:i + 2]
    limit = None
    if "--limit" in args:
        i = args.index("--limit")
        limit = int(args[i + 1])
        del args[i:i + 2]
    docs_dir = args[0]
    t = float(args[1]) if len(args) > 1 else 0.6

    spark = get_spark()
    docs = spark.read.parquet(f"{docs_dir}/documents.parquet") \
        .select(F.col("doc_id").alias("id"), "text")
    if limit:
        docs = docs.filter(F.col("id") < limit)
    n_docs = docs.count()

    base = dedup.staged_shingles(docs, "text", "id").persist()
    ex = base.select("_id", F.size("_sh").alias("_sz"),
                     F.explode("_sh").alias("_s")) \
        .withColumn("_s", F.xxhash64("_s"))
    t0 = time.time()
    plain_cand = (ex.groupBy("_s").count()
                  .agg(F.sum(F.expr("count * (count - 1) / 2")))
                  .first()[0])
    probe_sec = round(time.time() - t0, 3)
    t0 = time.time()
    prefix_cand = dedup._prefix_candidates(ex, t).count()
    prefix_cand_sec = round(time.time() - t0, 3)
    t0 = time.time()
    auto_choice = dedup._probe_prefix_wins(ex)
    auto_probe_sec = round(time.time() - t0, 3)
    base.unpersist()

    rec = {"docs_dir": docs_dir, "n_docs": n_docs, "threshold": t,
           "plain_candidates": int(plain_cand or 0),
           "prefix_candidates": int(prefix_cand),
           "candidate_ratio": round((plain_cand or 0)
                                    / max(prefix_cand, 1), 1),
           "auto_picks_prefix": bool(auto_choice),
           "plain_candidate_agg_sec": probe_sec,
           "prefix_candidate_sec": prefix_cand_sec,
           "auto_probe_sec": auto_probe_sec}

    def run(name, **kw):
        t0 = time.time()
        rows = dedup.ngram_jaccard_pairs(docs, t, "text", "id", **kw) \
            .select("id_a", "id_b", F.round("jaccard", 9).alias("j")) \
            .collect()
        dedup.release_staged()
        rec[f"{name}_sec"] = round(time.time() - t0, 3)
        rec[f"{name}_rows"] = len(rows)
        return {(r.id_a, r.id_b): r.j for r in rows}

    pref = run("prefix", prefix_filter=True)
    auto = run("auto")          # default = probe-picked strategy
    assert auto == pref or not auto_choice, "auto diverged from prefix"
    if not skip_plain:
        plain = run("plain", prefix_filter=False)
        rec["results_equal"] = plain == pref
        assert rec["results_equal"], \
            f"plain {len(plain)} != prefix {len(pref)}"
    else:
        rec["plain_sec"] = None
        rec["plain_skipped_reason"] = (
            f"plain candidate count {rec['plain_candidates']:,} "
            f"infeasible to materialize")

    line = json.dumps(rec)
    print(line)
    if out_json:
        with open(out_json, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
