"""Streaming dHash image near-dup filter (streaming/mediadedup.py):
two-batch sequential semantics on synthetic PNGs with known Hamming
relationships, rejected-image non-suppression, and replay idempotence."""

import itertools

import pytest

from velesdb_spark.multimodal.imagehash import dhash_bits
from velesdb_spark.multimodal.media import png_pixels, synth_png
from velesdb_spark.streaming.mediadedup import StreamingDHashStore


def _img_df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(synth_png(seed)[0])) for i, seed in rows],
        "doc_id bigint, content binary")


def _mk(spark, tmp, **kw):
    return StreamingDHashStore(spark, str(tmp / "store"),
                               id_col="doc_id", **kw)


def _hamming(sa, sb):
    ha = dhash_bits(png_pixels(synth_png(sa)[0]))
    hb = dhash_bits(png_pixels(synth_png(sb)[0]))
    return bin(ha ^ hb).count("1")


def _find_near_pair(max_h=3):
    """A seed pair with 1 <= Hamming <= max_h (genuinely near, not
    exact) — deterministic scan over the synth space."""
    for sa, sb in itertools.combinations(range(60), 2):
        d = _hamming(sa, sb)
        if 1 <= d <= max_h:
            return sa, sb
    pytest.skip("no near pair in the synth seed space")


def _find_far_seed(sa, min_h=10):
    for sb in range(60, 120):
        if _hamming(sa, sb) >= min_h:
            return sb
    pytest.skip("no far seed found")


def test_intra_batch_keeps_min_id_rep(spark, tmp_path):
    store = _mk(spark, tmp_path)
    far = _find_far_seed(7)
    out = store.process_batch(_img_df(spark, [(3, 7), (1, 7), (2, far)]), 0)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]
    assert sorted(r.doc_id for r in store.accepted().collect()) == [1, 2]


def test_cross_batch_rejects_exact_and_near(spark, tmp_path):
    sa, sb = _find_near_pair()
    far = _find_far_seed(sa)
    store = _mk(spark, tmp_path)
    store.process_batch(_img_df(spark, [(1, sa)]), 0)
    out = store.process_batch(
        _img_df(spark, [(10, sa), (11, sb), (12, far)]), 1)
    # 10 = exact twin of accepted 1; 11 = near (1 <= hamming <= 3);
    # 12 = far — only 12 survives
    assert sorted(r.doc_id for r in out.collect()) == [12]
    assert sorted(r.doc_id for r in store.accepted().collect()) == [1, 12]


def test_rejected_images_never_suppress(spark, tmp_path):
    """An arrival within range of a REJECTED image only (not of any
    accepted one) must be accepted — rejected hashes are not stored."""
    trio = None
    for sa, sb in itertools.combinations(range(40), 2):
        d_ab = _hamming(sa, sb)
        if not 1 <= d_ab <= 3:
            continue
        for sc in range(40):
            if sc in (sa, sb):
                continue
            if 1 <= _hamming(sc, sb) <= 3 and _hamming(sc, sa) > 3:
                trio = (sa, sb, sc)
                break
        if trio:
            break
    if not trio:
        pytest.skip("no (a~b, b~c, a!~c) triple in the synth space")
    sa, sb, sc = trio
    store = _mk(spark, tmp_path)
    # batch 0: a and b cluster -> only min-id (a) accepted, b dropped
    store.process_batch(_img_df(spark, [(1, sa), (2, sb)]), 0)
    assert sorted(r.doc_id for r in store.accepted().collect()) == [1]
    # batch 1: c is near the REJECTED b but far from the accepted a
    out = store.process_batch(_img_df(spark, [(10, sc)]), 1)
    assert [r.doc_id for r in out.collect()] == [10]


def test_replay_is_idempotent(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.process_batch(_img_df(spark, [(1, 5), (2, _find_far_seed(5))]), 0)
    before = sorted((r.doc_id, r.dhash)
                    for r in store.accepted().collect())
    # crash-replay: the same batch processed again appends identical
    # rows; accepted() (distinct over the store) is unchanged
    store.process_batch(_img_df(spark, [(1, 5), (2, _find_far_seed(5))]), 0)
    after = sorted((r.doc_id, r.dhash) for r in store.accepted().collect())
    assert before == after


def test_guards(spark, tmp_path):
    with pytest.raises(ValueError, match="pigeonhole"):
        _mk(spark, tmp_path, max_hamming=4, n_bands=4)
    with pytest.raises(ValueError, match="divide 64"):
        _mk(spark, tmp_path, n_bands=5)


def test_compact_preserves_accept_state(spark, tmp_path):
    import os

    store = _mk(spark, tmp_path)
    far = _find_far_seed(3)
    store.process_batch(_img_df(spark, [(1, 3)]), 0)
    store.process_batch(_img_df(spark, [(2, far)]), 1)
    before = sorted((r.doc_id, r.dhash) for r in store.accepted().collect())
    n_files_before = len([f for f in os.listdir(f"{store.root}/bands")
                          if f.endswith(".parquet")])
    store.compact()
    after = sorted((r.doc_id, r.dhash) for r in store.accepted().collect())
    n_files_after = len([f for f in os.listdir(f"{store.root}/bands")
                         if f.endswith(".parquet")])
    assert before == after
    assert n_files_after <= n_files_before
    # rejection still works against the compacted store
    out = store.process_batch(_img_df(spark, [(10, 3)]), 2)
    assert out.count() == 0

def test_reused_batch_id_returns_only_this_call(spark, tmp_path):
    """Two sequential process_batch calls with the SAME batch_id (the
    documented default batch_id=0 usage, or a fresh-checkpoint restart
    over an existing store root): the second call's return must contain
    only the second batch's accepted rows, never earlier calls' rows —
    the read-back is pinned to the files this append created, not to the
    batch_id slice of the store."""
    store = _mk(spark, tmp_path)
    far = _find_far_seed(5)
    first = store.process_batch(_img_df(spark, [(1, 5)]), 0)
    assert [r.doc_id for r in first.collect()] == [1]
    second = store.process_batch(_img_df(spark, [(2, far)]), 0)
    assert [r.doc_id for r in second.collect()] == [2]
    # the store still holds both
    assert sorted(r.doc_id for r in store.accepted().collect()) == [1, 2]


def test_fully_rejected_batch_returns_empty(spark, tmp_path):
    """A batch whose every image is rejected appends nothing; the
    file-delta read-back must return a well-typed empty frame."""
    store = _mk(spark, tmp_path)
    store.process_batch(_img_df(spark, [(1, 5)]), 0)
    out = store.process_batch(_img_df(spark, [(10, 5)]), 1)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "dhash"}
