"""Streaming perceptual-image near-dup ingest: dHash accept/reject over
micro-batches against a persisted band store — the multimodal twin of
streaming/neardup.py (text MinHash-LSH), same segment/append discipline.

Each arriving batch of images is decoded and dHashed once
(multimodal/imagehash.dhash_images — the only Python in the path);
everything after is JVM joins over (id, hash, band) longs:

1. Within a batch, pairs at Hamming ≤ ``max_hamming`` (pigeonhole band
   join + exact bit_count verify) form clusters (connected components);
   only each cluster's min-id representative survives.
2. A surviving image is ACCEPTED iff no PREVIOUSLY ACCEPTED image lies
   within ``max_hamming`` — the band equi-join against the store yields
   candidates (recall 1.0 by pigeonhole since max_hamming < n_bands),
   the exact XOR popcount against the stored full hash confirms.
   Images rejected in earlier batches are not in the store and never
   block an arrival (the keep-representatives rule).
3. Accepted images append (n_bands rows each, full hash inline) as one
   immutable parquet segment per batch — per-batch cost ∝ batch size,
   never the accepted corpus; the store probe is an equi-join on
   16-bit band keys a 100 TB store would bucket by.

Crash consistency mirrors StreamingNearDupStore: the bands append is
the single commit point; ``accepted()`` derives from the store, so a
replayed batch recomputes the identical accept set and re-writes the
same rows (last write wins on identical content).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from velesdb_spark.functions.dedup import connected_components
from velesdb_spark.multimodal.imagehash import dhash_images, dhash_near_dups

_STORE_SCHEMA = "_id BIGINT, _b INT, _v BIGINT, _h BIGINT, batch_id BIGINT"


class StreamingDHashStore:
    """Persisted dHash band store with sequential accept/reject."""

    def __init__(self, spark: SparkSession, root: str,
                 id_col: str = "id", max_hamming: int = 3,
                 n_bands: int = 4):
        if 64 % n_bands != 0:
            raise ValueError(f"n_bands must divide 64, got {n_bands}")
        if max_hamming >= n_bands:
            raise ValueError(
                f"pigeonhole recall needs max_hamming < n_bands "
                f"(got {max_hamming} >= {n_bands})")
        self.spark = spark
        self.root = root
        self.id_col = id_col
        self.max_hamming = max_hamming
        self.n_bands = n_bands
        os.makedirs(f"{root}/bands", exist_ok=True)

    # -- store access ---------------------------------------------------
    def band_store(self) -> DataFrame:
        d = f"{self.root}/bands"
        if not any(not f.startswith(("_", ".")) for f in os.listdir(d)):
            return self.spark.createDataFrame([], _STORE_SCHEMA)
        return self.spark.read.schema(_STORE_SCHEMA).parquet(d)

    def accepted(self) -> DataFrame:
        """(id_col, dhash) of every accepted image."""
        return (self.band_store()
                .select(F.col("_id").alias(self.id_col),
                        F.col("_h").alias("dhash"))
                .distinct())

    # -- per-batch pipeline ----------------------------------------------
    def _bands(self, hashes: DataFrame) -> DataFrame:
        width = 64 // self.n_bands
        mask = (1 << width) - 1
        return hashes.select(
            F.col(self.id_col).cast("long").alias("_id"),
            F.col("dhash").alias("_h"),
            F.explode(F.array(*[
                F.struct(
                    F.lit(i).alias("_b"),
                    F.shiftrightunsigned("dhash", i * width)
                    .bitwiseAND(F.lit(mask)).alias("_v"))
                for i in range(self.n_bands)])).alias("bv"),
        ).select("_id", "_h", "bv._b", "bv._v")

    def _intra_batch_reps(self, hashes: DataFrame) -> DataFrame:
        """Drop every within-batch cluster member except its min-id rep."""
        pairs = dhash_near_dups(hashes, self.max_hamming, self.n_bands,
                                id_col=self.id_col) \
            .select("id_a", "id_b")
        clusters = connected_components(pairs)
        losers = clusters.filter(F.col("id") != F.col("cluster_id")) \
            .select(F.col("id").alias(self.id_col))
        return hashes.join(F.broadcast(losers), self.id_col, "left_anti")

    def _store_hits(self, bands_df: DataFrame) -> DataFrame:
        """_ids of batch images within max_hamming of an accepted one:
        band equi-join for candidates, exact popcount to confirm."""
        store = (self.band_store()
                 .select("_b", "_v", F.col("_h").alias("_h_old")))
        cand = (bands_df.join(store, on=["_b", "_v"])
                .select("_id", "_h", "_h_old").distinct())
        return (cand.filter(
            F.expr(f"bit_count(_h ^ _h_old) <= {self.max_hamming}"))
            .select("_id").distinct())

    def process_batch(self, images: DataFrame, batch_id: int = 0,
                      content_col: str = "content") -> DataFrame:
        """Decode+hash one micro-batch of (id, content) images, run the
        accept/reject round, append the accepted band segment; returns
        the accepted (id, dhash) rows of THIS batch."""
        hashes = dhash_images(images, id_col=self.id_col,
                              content_col=content_col)
        reps = self._intra_batch_reps(hashes)
        bands = self._bands(reps)
        hits = self._store_hits(bands)
        keep = bands.join(hits, "_id", "left_anti") \
            .withColumn("batch_id", F.lit(int(batch_id)))
        d = f"{self.root}/bands"
        before = set(os.listdir(d))
        keep.write.mode("append").parquet(d)
        # Return THIS append's rows read back from exactly the files the
        # append created, rather than re-evaluating keep: a second action
        # on the lazy plan would re-run the full decode+hash+join pipeline
        # (image decode dominates batch cost — every batch paid it
        # twice) AND, worse, re-list the bands dir so the batch's own
        # appended rows masquerade as previously-accepted and self-
        # reject the whole batch. Filtering the store on batch_id is NOT
        # enough: a reused batch_id (the documented sequential default
        # batch_id=0, or a fresh-checkpoint restart over an existing
        # store root) would surface earlier calls' rows as this batch's.
        # The file delta pins the read-back to this call alone; the
        # single-writer contract (compact() discipline) makes the listing
        # race-free. localCheckpoint still severs the file-index pin:
        # after compact() renames the bands dir, actions on a lazy
        # read-back would throw FileNotFoundException.
        new_files = [f"{d}/{f}" for f in os.listdir(d)
                     if f not in before and not f.startswith(("_", "."))]
        if not new_files:
            return (self.spark.createDataFrame([], _STORE_SCHEMA)
                    .select(F.col("_id").alias(self.id_col),
                            F.col("_h").alias("dhash")))
        out = (self.spark.read.schema(_STORE_SCHEMA)
               .parquet(*new_files)
               .select(F.col("_id").alias(self.id_col),
                       F.col("_h").alias("dhash")).distinct()
               .localCheckpoint(eager=True))
        return out


    def compact(self) -> "StreamingDHashStore":
        """Fold the per-batch band segments into one consolidated
        segment — file-count hygiene for long-running streams (the
        StreamingNearDupStore.compact discipline: single-writer, call
        between drains; the swap is two local renames, an object-store
        deployment would commit via manifest)."""
        import shutil

        path = f"{self.root}/bands"
        df = self.band_store()
        tmp = path + ".compacting"
        df.write.mode("overwrite").parquet(tmp)
        old = path + ".old"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        return self


def stream_images_into_dhash(media_stream: DataFrame,
                             store: StreamingDHashStore,
                             checkpoint: str, timeout_s: int = 600):
    """Drain an (id, content) image file stream through the dHash
    filter: each micro-batch is one accept/reject round + one store
    segment (foreachBatch = the transactional sink, the
    stream_docs_into_neardup discipline). An incomplete availableNow
    drain raises — reading a partial store would look like mass
    rejection."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.limit(1).count() == 0:
            return
        store.process_batch(batch_df, batch_id)

    q = (media_stream.writeStream.foreachBatch(_sink)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"dHash drain still running after {timeout_s}s — the store "
            "is incomplete; raise timeout_s")
    return q
