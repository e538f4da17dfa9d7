"""Round-10 verdict #2: name the growing stage in the two steepest r8
sf10 curves (minhash_first_hash 8.59×, tpch_q21 6.52×).

minhash_first_hash decomposition — time each prefix of its pipeline at
both scales so the growth attributes to a named stage:
  scan      read documents, count rows (parquet scan only)
  tokenize  + regex tokenization (force via sum of token counts)
  shingle   + n-gram shingling (force via sum of shingle counts)
  full      + md5-per-shingle + array_min (the gate expression)
Also reports total shingle count per scale: if time ratio ≈ shingle
ratio, the stage is linear compute, not a growing join/shuffle.

tpch_q21 — wall time of the round-10 single-pass plan at both scales
(the fix replaced the double-consumed lineitem⋈orders join + 2×
countDistinct Expand with one join → per-(order,supp) rollup → window).

Usage: python tools/profile_minhash_q21.py <small_dir> <big_dir>
         [--runs 2] [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    args = sys.argv[1:]
    runs, out_json = 2, None
    for flag in ("--runs", "--json"):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i:i + 2]
            if flag == "--runs":
                runs = int(v)
            else:
                out_json = v
    small_dir, big_dir = args[0], args[1]

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from velesdb_spark.functions import dedup as dd
    from velesdb_spark.functions.text_analysis import (normalized_text,
                                                       word_tokens)
    from velesdb_spark.session import get_spark

    spark = get_spark("velesdb-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for d in (small_dir, big_dir):
        entry_mod._catalog(spark, d)

    def best(mk_df, action):
        b = float("inf")
        for _ in range(runs):
            t0 = time.time()
            action(mk_df())
            b = min(b, time.time() - t0)
        return round(b, 3)

    def docs(d):
        return spark.read.parquet(f"{d}/documents.parquet") \
            .select("doc_id", "text")

    def toks(d):
        return docs(d).select(
            "doc_id", word_tokens(normalized_text(F.col("text")))
            .alias("_toks"))

    def shing(d):
        return toks(d).select(
            "doc_id", dd.shingles_from_tokens(F.col("_toks"), 3)
            .alias("_sh"))

    def full(d):
        return qs["minhash_first_hash"](spark, d)

    rec = {"small_dir": small_dir, "big_dir": big_dir,
           "runs_per_stage": runs, "agg": "min",
           "loadavg_1m": round(os.getloadavg()[0], 2),
           "minhash_first_hash": {}, "tpch_q21": {}}

    for d, tag in ((small_dir, "small"), (big_dir, "big")):
        row = {}
        row["scan_sec"] = best(lambda: docs(d), lambda df: df.count())
        # sum() forces the expressions; count() would prune the columns
        row["tokenize_sec"] = best(
            lambda: toks(d),
            lambda df: df.agg(F.sum(F.size("_toks"))).collect())
        row["shingle_sec"] = best(
            lambda: shing(d),
            lambda df: df.agg(F.sum(F.size("_sh"))).collect())
        row["full_sec"] = best(
            lambda: full(d),
            lambda df: df.agg(F.sum(F.length("mh0"))).collect())
        row["total_shingles"] = shing(d).agg(
            F.sum(F.size("_sh"))).collect()[0][0]
        rec["minhash_first_hash"][tag] = row

        rec["tpch_q21"][tag] = {"sec": best(
            lambda: qs["tpch_q21"](spark, d), lambda df: df.collect())}

    for q in ("minhash_first_hash", "tpch_q21"):
        s, b = rec[q]["small"], rec[q]["big"]
        key = "full_sec" if "full_sec" in s else "sec"
        rec[q]["ratio_at_10x_data"] = round(b[key] / max(s[key], 1e-9), 2)
    line = json.dumps(rec)
    print(line)
    if out_json:
        with open(out_json, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
