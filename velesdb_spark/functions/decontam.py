"""Train/eval decontamination: flag and drop training documents that share
word n-grams with an evaluation set.

The standard LLM-pipeline hygiene step (benchmark contamination removal):
a train doc is contaminated when it shares at least ``min_shared`` distinct
n-gram shingles with any eval doc. The reference engine has no pipeline
module; this is headroom designed for its `documents` data model
(src/table/mod.rs text columns) reusing the shingle machinery from
:mod:`velesdb_spark.functions.dedup`.

100 TB design: the eval side of this join is a *benchmark suite* — a few
thousand documents, not a corpus — so its distinct (eval_id, shingle-hash)
postings are broadcast (8-byte hashes, no text) and the training corpus is
never shuffled: explode → map-side broadcast join → partial-aggregated
pair counts. Only hit pairs (a vanishing fraction at scale) reach the one
shuffle in the report aggregate. ``decontaminate`` anti-joins the train
table against the contaminated-id set (AQE broadcasts it when small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import DEFAULT_SHINGLE, staged_shingles


def _postings(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(_id, _sz, _s) exploded distinct-shingle hash postings (no text);
    _sz carries the doc's shingle-set size inline (8 bytes/row) so
    containment falls out of the pair aggregate with no size join."""
    base = staged_shingles(df, text_col, id_col, n)
    return base.select("_id", F.size("_sh").alias("_sz"),
                       F.explode("_sh").alias("_s")) \
        .withColumn("_s", F.xxhash64("_s"))


def contamination_report(train: DataFrame, eval_df: DataFrame,
                         text_col: str = "text", id_col: str = "id",
                         n: int = DEFAULT_SHINGLE,
                         min_shared: int = 1) -> DataFrame:
    """(train_id, eval_id, shared, containment) for every train/eval doc
    pair sharing at least ``min_shared`` distinct n-gram shingles.

    ``shared`` counts DISTINCT shared shingles (shingle sets are distinct
    per doc, so the join produces one row per shared shingle);
    ``containment`` = shared / |train doc's shingle set| — the standard
    decontamination metric (how much of the training doc is covered by
    benchmark n-grams), asymmetric on purpose."""
    t = _postings(train, text_col, id_col, n).select(
        F.col("_id").alias("train_id"), F.col("_sz").alias("_tsz"), "_s")
    e = _postings(eval_df, text_col, id_col, n) \
        .select(F.col("_id").alias("eval_id"), "_s")
    pairs = (t.join(F.broadcast(e), "_s")
             .groupBy("train_id", "eval_id")
             .agg(F.count("*").alias("shared"),
                  F.first("_tsz").alias("_tsz"))
             .withColumn("containment",
                         F.col("shared") / F.col("_tsz"))
             .drop("_tsz"))
    if min_shared > 1:
        pairs = pairs.filter(F.col("shared") >= int(min_shared))
    return pairs


def contaminated_ids(train: DataFrame, eval_df: DataFrame,
                     text_col: str = "text", id_col: str = "id",
                     n: int = DEFAULT_SHINGLE,
                     min_shared: int = 1) -> DataFrame:
    """Distinct train ids contaminated by ANY eval doc."""
    return (contamination_report(train, eval_df, text_col, id_col, n,
                                 min_shared)
            .select(F.col("train_id").alias(id_col)).distinct())


def decontaminate(train: DataFrame, eval_df: DataFrame,
                  text_col: str = "text", id_col: str = "id",
                  n: int = DEFAULT_SHINGLE,
                  min_shared: int = 1) -> DataFrame:
    """The train table minus contaminated documents (all columns kept).

    Docs too short to produce a full n-gram (fewer than n tokens) have a
    single truncated shingle (see shingles_from_tokens) and participate
    normally; empty docs produce no shingles and are always kept."""
    bad = contaminated_ids(train, eval_df, text_col, id_col, n, min_shared)
    return train.join(bad, on=id_col, how="left_anti")
