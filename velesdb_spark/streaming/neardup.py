"""Streaming near-duplicate filtering: MinHash-LSH accept/reject over
micro-batches against a persisted band-key store.

The batch pipeline (functions/dedup.py: shingle → minhash → band →
bucket-join → connected components → keep representatives) answers
"which docs in this CORPUS are near-dups"; a training-data INGEST needs
the online form — "is this arriving doc a near-dup of anything already
accepted" — without re-scanning the corpus per batch. This module is
that form, with the same segment/append discipline as the incremental
BM25 index (bm25.py IncrementalBm25Index): per-batch cost is
proportional to the batch, never the accepted corpus.

Semantics (deterministic, order-free within a batch):
1. Within a batch, docs whose band keys collide form candidate clusters
   (connected components); only each cluster's min-id representative
   survives the intra-batch stage.
2. A surviving doc is ACCEPTED iff none of its band keys exists in the
   store — i.e. it collides with no PREVIOUSLY ACCEPTED doc. Docs
   dropped in earlier batches are not in the store and never block an
   arrival (matching the batch keep-representatives rule, where only
   representatives suppress others).
3. Accepted docs' band keys append to the store as one immutable
   segment per batch.

``mode="verify"`` additionally stores each accepted doc's shingle set
and confirms candidates with exact Jaccard ≥ ``threshold`` before
dropping (LSH collisions become candidates, not verdicts) — the
streaming twin of minhash_dedup_pairs. Costs one wider store row;
candidate-only mode is the web-crawl-scale default.

Scale: the store is parquet band postings (id, band, hash, batch) — the
per-batch membership probe is a broadcast-able equi-join of the BATCH's
keys against the store keys (band+hash are join keys a 100 TB store
would bucket by); nothing ever re-tokenizes accepted docs. Crash
consistency: the bands append is the SINGLE commit point —
``accepted()`` derives from the band store, so a crash before the
append leaves no trace (replay recomputes the identical accept set)
and a replay after it finds every key present and accepts nothing
twice. Verify-mode shingles write before the commit; orphaned shingle
rows from a crash in between are duplicate-content-only and harmless
(candidate joins end in distinct()).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from velesdb_spark.functions.dedup import (DEFAULT_BANDS, DEFAULT_MINHASHES,
                                           DEFAULT_SHINGLE,
                                           connected_components,
                                           minhash_band_rows,
                                           staged_shingles)

_BANDS_SCHEMA = "_id BIGINT, _b INT, _bh STRING, batch_id BIGINT"
_SHINGLES_SCHEMA = "_id BIGINT, _sh ARRAY<STRING>"


class StreamingNearDupStore:
    """Persisted accept/reject state for streaming MinHash-LSH dedup."""

    def __init__(self, spark: SparkSession, root: str,
                 text_col: str = "text", id_col: str = "doc_id",
                 num_hashes: int = DEFAULT_MINHASHES,
                 bands: int = DEFAULT_BANDS,
                 n: int = DEFAULT_SHINGLE,
                 mode: str = "candidate",
                 threshold: float = 0.8):
        if mode not in ("candidate", "verify"):
            raise ValueError("mode must be 'candidate' or 'verify'")
        self.spark = spark
        self.root = root
        self.text_col = text_col
        self.id_col = id_col
        self.num_hashes = num_hashes
        self.bands = bands
        self.n = n
        self.mode = mode
        self.threshold = float(threshold)
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ state
    def _read(self, sub: str, schema: str) -> DataFrame:
        # explicit-schema parquet reads defer the file listing to
        # execution time, so a missing first-batch store would surface as
        # a mid-stream FileNotFoundException — probe the directory up
        # front instead of relying on a load-time error. (Local-fs probe;
        # an object-store deployment would consult the segment manifest
        # the same way storage.LogStore does.)
        path = os.path.join(self.root, sub)
        if not os.path.isdir(path) or not any(
                f.endswith(".parquet") for f in os.listdir(path)):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)

    def band_store(self) -> DataFrame:
        return self._read("bands", _BANDS_SCHEMA)

    def accepted(self) -> DataFrame:
        """(doc_id, batch_id) of every accepted doc so far — DERIVED from
        the band store (one aggregation over its (doc, batch) pairs), so
        the bands append is the store's single commit point: there is no
        second table that could disagree with it after a crash."""
        return (self.band_store()
                .groupBy(F.col("_id").alias("doc_id"))
                .agg(F.min("batch_id").alias("batch_id")))

    def shingle_store(self) -> DataFrame:
        return self._read("shingles", _SHINGLES_SCHEMA)

    # ------------------------------------------------------- batch step
    def _batch_bands(self, batch: DataFrame) -> DataFrame:
        return minhash_band_rows(batch, self.text_col, self.id_col,
                                 self.num_hashes, self.bands, self.n) \
            .select(F.col("_id").cast("long").alias("_id"), "_b", "_bh")

    def _intra_batch_reps(self, batch: DataFrame,
                          bands_df: DataFrame) -> DataFrame:
        """Drop every within-batch cluster member except its min-id rep."""
        a = bands_df.select(F.col("_id").alias("id_a"), "_b", "_bh")
        b = bands_df.select(F.col("_id").alias("id_b"), "_b", "_bh")
        pairs = (a.join(b, on=["_b", "_bh"])
                 .filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b").distinct())
        if self.mode == "verify":
            pairs = self._verify_pairs_within(batch, pairs)
        clusters = connected_components(pairs)
        losers = clusters.filter(F.col("id") != F.col("cluster_id")) \
            .select(F.col("id").alias(self.id_col))
        return batch.join(F.broadcast(losers), self.id_col, "left_anti")

    def _verify_pairs_within(self, batch: DataFrame,
                             pairs: DataFrame) -> DataFrame:
        from velesdb_spark.functions.dedup import jaccard_of_shingles

        return jaccard_of_shingles(batch, pairs, self.text_col,
                                   self.id_col, self.n) \
            .filter(F.col("jaccard") >= self.threshold) \
            .select("id_a", "id_b")

    def _store_hits(self, batch: DataFrame,
                    bands_df: DataFrame) -> DataFrame:
        """ids of batch docs colliding with the accepted store (candidate
        mode) or exact-Jaccard-confirmed against it (verify mode)."""
        store = self.band_store()
        cand = (bands_df.join(store.withColumnRenamed("_id", "_sid"),
                              on=["_b", "_bh"])
                .select(F.col("_id"), "_sid").distinct())
        if self.mode == "candidate":
            return cand.select("_id").distinct()
        new_sh = staged_shingles(batch, self.text_col, self.id_col, self.n) \
            .withColumnRenamed("_sh", "_sh_new")
        old_sh = self.shingle_store().withColumnRenamed("_id", "_sid") \
            .withColumnRenamed("_sh", "_sh_old")
        j = (cand.join(new_sh, "_id").join(old_sh, "_sid"))
        inter = F.size(F.array_intersect("_sh_new", "_sh_old"))
        union = F.size(F.array_union("_sh_new", "_sh_old"))
        return (j.filter(
            F.when(union > 0, inter.cast("double") / union)
            .otherwise(0.0) >= self.threshold)
            .select("_id").distinct())

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> DataFrame:
        """One micro-batch through the filter; returns the accepted rows
        and appends their keys to the store.

        Commit protocol: the BANDS append is the single commit point —
        accepted() derives from it, so a crash anywhere before it leaves
        no trace and the checkpoint replay recomputes the identical
        accept set. Verify mode writes its shingle segment BEFORE the
        bands commit: a crash in between leaves orphan shingle rows,
        which are harmless (the replayed batch re-appends identical
        content; candidate joins end in distinct()). The batch's band
        rows and accept set are persisted once and reused by every
        consumer — the store joins, the writes, and the returned frame —
        instead of re-running the tokenize/minhash pipeline per action."""
        batch = batch.select(self.id_col, self.text_col)
        bands_df = self._batch_bands(batch).persist()
        try:
            survivors = self._intra_batch_reps(batch, bands_df)
            hits = self._store_hits(batch, bands_df) \
                .select(F.col("_id").alias(self.id_col))
            accepted = survivors.join(F.broadcast(hits), self.id_col,
                                      "left_anti")
            # materialize the accept decision exactly once; lineage
            # truncation keeps the returned frame valid after unpersist
            acc_ids = accepted.select(self.id_col).localCheckpoint()
            if self.mode == "verify":
                staged_shingles(accepted, self.text_col, self.id_col,
                                self.n) \
                    .select(F.col("_id").cast("long").alias("_id"), "_sh") \
                    .write.mode("append") \
                    .parquet(os.path.join(self.root, "shingles"))
            acc_bands = bands_df.join(
                F.broadcast(acc_ids.withColumnRenamed(self.id_col, "_id")),
                "_id", "left_semi") \
                .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
            acc_bands.write.mode("append").parquet(
                os.path.join(self.root, "bands"))
            return batch.join(F.broadcast(acc_ids), self.id_col,
                              "left_semi")
        finally:
            bands_df.unpersist()


    def compact(self) -> "StreamingNearDupStore":
        """Fold the per-batch append segments into one consolidated
        segment per store table — file-count hygiene for long-running
        streams, same motivation as IncrementalBm25Index.compact().
        Single-writer discipline: call between drains, never concurrently
        with an active stream (the swap is two local renames; an
        object-store deployment would commit via manifest instead)."""
        import shutil

        for sub, schema in (("bands", _BANDS_SCHEMA),
                            ("shingles", _SHINGLES_SCHEMA)):
            path = os.path.join(self.root, sub)
            if not os.path.isdir(path):
                continue
            df = self._read(sub, schema)
            tmp = path + ".compacting"
            df.write.mode("overwrite").parquet(tmp)
            old = path + ".old"
            os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old)
        return self


def stream_docs_into_neardup(docs_stream: DataFrame,
                             store: StreamingNearDupStore,
                             checkpoint: str, timeout_s: int = 600):
    """Drain a (doc_id, text) file stream through the near-dup filter:
    each micro-batch is one accept/reject round + one store segment
    (foreachBatch = the transactional sink, exactly the
    stream_docs_into_bm25 discipline).

    An incomplete drain is an ERROR, never a silent truncation: with
    availableNow the query terminates when every pending file has been
    processed, so hitting the timeout means the store is missing
    batches — reading it then would look like mass rejection."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.limit(1).count() == 0:
            return
        store.process_batch(batch_df, batch_id)

    q = (docs_stream.writeStream.foreachBatch(_sink)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"near-dup drain still running after {timeout_s}s — the "
            "store is incomplete; raise timeout_s")
    return q
