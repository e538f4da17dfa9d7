"""Streaming MinHash-LSH near-dup filter: two-batch sequential semantics,
dropped-doc non-suppression, verify-mode exact-Jaccard confirmation, and
replay idempotence — all against hand-built corpora with known collisions."""

import pytest
from pyspark.sql import functions as F

from velesdb_spark.streaming.neardup import StreamingNearDupStore

DUP_A = "the quick brown fox jumps over the lazy dog near the river bank"
DUP_A2 = "the quick brown fox jumps over the lazy dog near the river shore"
UNIQ_B = "completely different text about database engines and query planners"
UNIQ_C = "spark structured streaming processes micro batches with checkpoints"
UNIQ_D = "product quantization compresses vectors into compact codebook codes"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _mk(spark, tmp, **kw):
    return StreamingNearDupStore(spark, str(tmp / "store"),
                                 id_col="doc_id", **kw)


def test_intra_batch_keeps_min_id_rep(spark, tmp_path):
    store = _mk(spark, tmp_path)
    out = store.process_batch(
        _df(spark, [(3, DUP_A), (1, DUP_A), (2, UNIQ_B)]), 0)
    ids = sorted(r.doc_id for r in out.collect())
    # 1 and 3 are exact dups → min-id 1 survives; 2 unrelated
    assert ids == [1, 2]
    acc = sorted(r.doc_id for r in store.accepted().collect())
    assert acc == [1, 2]


def test_cross_batch_rejects_against_accepted(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.process_batch(_df(spark, [(1, DUP_A), (2, UNIQ_B)]), 0)
    out = store.process_batch(
        _df(spark, [(10, DUP_A2), (11, UNIQ_C)]), 1)
    ids = sorted(r.doc_id for r in out.collect())
    # 10 is a near-dup of accepted doc 1 (one word differs → shares
    # bands); 11 is new
    assert ids == [11]
    acc = {(r.doc_id, r.batch_id) for r in store.accepted().collect()}
    assert acc == {(1, 0), (2, 0), (11, 1)}


def test_dropped_docs_never_suppress(spark, tmp_path):
    """A doc dropped in batch 0 is NOT in the store; an identical arrival
    in batch 1 is judged only against ACCEPTED docs."""
    store = _mk(spark, tmp_path)
    # 5 and 6 are dups of each other but NOT of anything else: 5 accepted,
    # 6 dropped
    store.process_batch(_df(spark, [(5, UNIQ_C), (6, UNIQ_C)]), 0)
    out = store.process_batch(_df(spark, [(7, UNIQ_C)]), 1)
    # 7 collides with ACCEPTED 5 → rejected (not because of dropped 6)
    assert out.count() == 0
    store2 = _mk(spark, tmp_path / "x")
    store2.process_batch(_df(spark, [(5, UNIQ_C), (6, UNIQ_C)]), 0)
    out2 = store2.process_batch(_df(spark, [(7, UNIQ_D)]), 1)
    assert [r.doc_id for r in out2.collect()] == [7]


def test_replay_is_idempotent(spark, tmp_path):
    store = _mk(spark, tmp_path)
    batch = _df(spark, [(1, DUP_A), (2, UNIQ_B)])
    store.process_batch(batch, 0)
    before = sorted((r.doc_id, r.batch_id)
                    for r in store.accepted().collect())
    # checkpoint redelivery: same batch again — every key already in the
    # store, so nothing is re-accepted and no duplicate rows appear
    store.process_batch(batch, 0)
    after = sorted((r.doc_id, r.batch_id)
                   for r in store.accepted().collect())
    assert before == after == [(1, 0), (2, 0)]


def test_verify_mode_requires_real_jaccard(spark, tmp_path):
    """In verify mode an LSH band collision alone cannot drop a doc —
    exact shingle-Jaccard must clear the threshold."""
    store = _mk(spark, tmp_path, mode="verify", threshold=0.8)
    store.process_batch(_df(spark, [(1, DUP_A)]), 0)
    # DUP_A2 differs by one word: jaccard high → still dropped
    out = store.process_batch(_df(spark, [(2, DUP_A2)]), 1)
    assert out.count() == 0
    # a doc sharing a prefix but mostly different: bands may collide but
    # jaccard is low → accepted in verify mode
    half = "the quick brown fox jumps over unrelated completely new " \
           "words appear here instead of the original tail entirely"
    out2 = store.process_batch(_df(spark, [(3, half)]), 2)
    assert [r.doc_id for r in out2.collect()] == [3]


def test_candidate_vs_batch_pipeline_equivalence(spark, tmp_path):
    """Single-batch streaming == the batch keep-representatives pipeline
    over the same corpus (same bands, same clustering rule)."""
    from velesdb_spark.functions.dedup import (dedup_keep_representatives,
                                               minhash_lsh_candidates)

    rows = [(1, DUP_A), (2, DUP_A2), (3, UNIQ_B), (4, UNIQ_C),
            (5, UNIQ_C + " extra"), (6, UNIQ_D)]
    df = _df(spark, rows)
    store = _mk(spark, tmp_path)
    got = sorted(r.doc_id for r in store.process_batch(df, 0).collect())
    pairs = minhash_lsh_candidates(df, "text", "doc_id")
    want = sorted(r.doc_id for r in dedup_keep_representatives(
        df.select("doc_id"), pairs, "doc_id").collect())
    assert got == want


def test_compact_preserves_state_and_decisions(spark, tmp_path):
    import os

    store = _mk(spark, tmp_path)
    store.process_batch(_df(spark, [(1, DUP_A), (2, UNIQ_B)]), 0)
    store.process_batch(_df(spark, [(3, UNIQ_C)]), 1)
    before = sorted((r.doc_id, r.batch_id)
                    for r in store.accepted().collect())
    bands_before = sorted((r._id, r._b, r._bh)
                          for r in store.band_store().collect())
    nfiles = len([f for f in os.listdir(str(tmp_path / "store" / "bands"))
                  if f.endswith(".parquet")])
    store.compact()
    nafter = len([f for f in os.listdir(str(tmp_path / "store" / "bands"))
                  if f.endswith(".parquet")])
    assert nafter <= nfiles
    assert sorted((r.doc_id, r.batch_id)
                  for r in store.accepted().collect()) == before
    assert sorted((r._id, r._b, r._bh)
                  for r in store.band_store().collect()) == bands_before
    # the store keeps working after the swap: a dup of accepted doc 1
    # is still rejected, a new doc accepted
    out = store.process_batch(_df(spark, [(9, DUP_A2), (10, UNIQ_D)]), 2)
    assert sorted(r.doc_id for r in out.collect()) == [10]
