#!/usr/bin/env python3
"""LLM training-data curation pipeline demo — the end-to-end sequence a
100 TB pretraining run needs, every stage an oracle-gated operator from
this repo, composed as ONE lazy DataFrame program per stage:

  raw corpus
    → exact dedup            (fingerprint groupBy — functions/dedup.py)
    → near dedup             (MinHash-LSH bands → connected components
                              → keep-best representatives)
    → quality filtering      (heuristic quality_score + bigram-LM
                              perplexity, the CCNet-style filter —
                              functions/lm.py)
    → decontamination        (eval-suite n-gram overlap —
                              functions/decontam.py)
    → domain selection       (DSIR importance resampling toward a
                              target domain — lm.dsir_resample)
    → mixture + packing      (token-budget mixture, deterministic
                              epoch shuffle, sequence packing)

Run: python examples/curation_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints per-stage survivor counts)

Everything is deterministic (md5-keyed sampling, exact-count models),
so re-running reproduces the same curated set bit-for-bit — the
property that makes a data recipe auditable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from velesdb_spark.functions import dedup as dd
from velesdb_spark.functions import decontam as dct
from velesdb_spark.functions.lm import dsir_resample, perplexity_self
from velesdb_spark.functions.mixture import make_mixture
from velesdb_spark.functions.packing import pack_sequences
from velesdb_spark.functions.sampling import epoch_shuffle
from velesdb_spark.functions.text_analysis import quality_score
from velesdb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-pipeline", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    print(f"raw corpus:            {n0} docs")

    # 1. exact dedup — normalize, fingerprint, keep min-id per print
    base = docs.selectExpr("doc_id as id", "text", "lang", "source")
    exact = dd.exact_dedup(base).select("id").join(base, "id")
    n1 = exact.count()
    print(f"after exact dedup:     {n1} docs")

    # 2. near dedup — MinHash bands → components → keep the LONGEST
    # member of each near-dup set (the quality-preferring policy)
    exact = exact.withColumn("_len", F.length("text"))
    pairs = dd.minhash_dedup_pairs(exact, threshold=0.7, text_col="text")
    near = dd.dedup_keep_representatives(exact, pairs, id_col="id",
                                         prefer_col="_len").drop("_len")
    n2 = near.count()
    print(f"after near dedup:      {n2} docs")

    # 3. quality filter — heuristic composite AND in-domain perplexity
    # band (drop the repetitive LOW tail and the garbage HIGH tail)
    scored = (near.withColumn("q", quality_score(F.col("text")))
              .join(perplexity_self(near, "text", "id")
                    .select("id", "ppl"), "id"))
    bounds = scored.agg(
        F.expr("percentile_approx(ppl, 0.05)").alias("lo"),
        F.expr("percentile_approx(ppl, 0.95)").alias("hi"))
    quality = (scored.crossJoin(F.broadcast(bounds))
               .filter((F.col("q") > 0.3) & (F.col("ppl") >= F.col("lo"))
                       & (F.col("ppl") <= F.col("hi")))
               .drop("lo", "hi"))
    n3 = quality.count()
    print(f"after quality filter:  {n3} docs")

    # 4. decontamination — drop training docs overlapping the eval set
    eval_suite = docs.filter(F.col("doc_id") % 97 == 0) \
        .selectExpr("doc_id as id", "text")
    clean = dct.decontaminate(quality, eval_suite, "text", "id",
                              min_shared=2)
    n4 = clean.count()
    print(f"after decontamination: {n4} docs")

    # 5. domain selection — resample toward the English slice (DSIR)
    target = clean.filter(F.col("lang") == "en")
    selected = dsir_resample(clean, target, n=max(n4 // 2, 1),
                             text_col="text", id_col="id",
                             lo=-50.0, hi=50.0)
    n5 = selected.count()
    print(f"after DSIR selection:  {n5} docs")

    # 6. mixture, shuffle, pack — the training-batch assembly
    mixed = make_mixture(selected, "lang",
                         {"en": 0.6, "es": 0.2, "fr": 0.2},
                         id_col="id")
    ordered = epoch_shuffle(mixed.select("id"), "epoch0", "id")
    packs = pack_sequences(mixed, budget=512, text_col="text",
                           id_col="id")
    n6, n7 = mixed.count(), packs.select("pack_id").distinct().count()
    print(f"after mixture:         {n6} docs "
          f"→ {n7} packed sequences (epoch order rows: "
          f"{ordered.count()})")
    spark.stop()


if __name__ == "__main__":
    main()
