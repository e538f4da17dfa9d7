"""Bigram-LM perplexity (functions/lm.py) vs a naive pure-Python model."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from velesdb_spark.functions.lm import (perplexity, perplexity_self,
                                        train_bigram_lm)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "a cat and a dog"),
    (3, "one"),          # single token → no bigrams
    (4, ""),             # empty → no bigrams
    (5, "the cat sat on the mat"),  # exact duplicate of 0
]


def _tok(s):
    return [t for t in "".join(c.lower() if c.isalnum() else " "
                               for c in s).split() if t]


def _naive(train_texts, score_rows, k=1.0):
    bc, cc, vocab = Counter(), Counter(), set()
    for s in train_texts:
        t = _tok(s)
        vocab.update(t)
        for a, b in zip(t, t[1:]):
            bc[(a, b)] += 1
            cc[a] += 1
    v = len(vocab)
    out = {}
    for i, s in score_rows:
        t = _tok(s)
        pairs = list(zip(t, t[1:]))
        if not pairs:
            out[i] = (0, 0.0, 1.0)
            continue
        nll = sum(math.log(cc.get(a, 0) + k * v) -
                  math.log(bc.get((a, b), 0) + k) for a, b in pairs)
        avg = nll / len(pairs)
        out[i] = (len(pairs), avg, math.exp(avg))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_self_perplexity_matches_naive(spark, docs_df):
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"])
           for r in perplexity_self(docs_df).collect()}
    want = _naive([s for _, s in DOCS], DOCS)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-9), i
        assert got[i][2] == pytest.approx(want[i][2], abs=1e-9), i


def test_duplicate_docs_score_identically(spark, docs_df):
    got = {r["doc_id"]: r["ppl"] for r in perplexity_self(docs_df).collect()}
    assert got[0] == got[5]


def test_oov_scoring_cross_corpus(spark, docs_df):
    """Score a doc whose context and pair are unseen: P = 1/V exactly."""
    bc, cc, v = train_bigram_lm(docs_df)
    unseen = spark.createDataFrame([(9, "zebra quark")], ["doc_id", "text"])
    row = perplexity(unseen, bc, cc, v).collect()[0]
    vocab_n = v.collect()[0]["v"]
    assert row["n_bigrams"] == 1
    assert row["avg_nll"] == pytest.approx(math.log(vocab_n), abs=1e-12)


def test_short_docs_neutral(spark, docs_df):
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"])
           for r in perplexity_self(docs_df).collect()}
    assert got[3] == (0, 0.0, 1.0)
    assert got[4] == (0, 0.0, 1.0)


def test_k_validation(spark, docs_df):
    with pytest.raises(ValueError):
        perplexity_self(docs_df, k=0.0)


def test_smaller_k_sharpens(spark, docs_df):
    """With lighter smoothing, seen bigrams get higher probability, so
    the repetitive duplicate doc's perplexity drops."""
    p1 = {r["doc_id"]: r["ppl"]
          for r in perplexity_self(docs_df, k=1.0).collect()}
    p01 = {r["doc_id"]: r["ppl"]
           for r in perplexity_self(docs_df, k=0.01).collect()}
    assert p01[0] < p1[0]


def _naive_lr(raw_rows, target_texts, k=1.0):
    def model(texts):
        bc, cc, vocab = Counter(), Counter(), set()
        for s in texts:
            t = _tok(s)
            vocab.update(t)
            for a, b in zip(t, t[1:]):
                bc[(a, b)] += 1
                cc[a] += 1
        return bc, cc, len(vocab)

    bt, ct, vt = model(target_texts)
    br, cr, vr = model([s for _, s in raw_rows])
    out = {}
    for i, s in raw_rows:
        pairs = list(zip(_tok(s), _tok(s)[1:]))
        if not pairs:
            out[i] = 0.0
            continue
        nll_r = sum(math.log(cr.get(a, 0) + k * vr) -
                    math.log(br.get((a, b), 0) + k) for a, b in pairs)
        nll_t = sum(math.log(ct.get(a, 0) + k * vt) -
                    math.log(bt.get((a, b), 0) + k) for a, b in pairs)
        out[i] = nll_r - nll_t
    return out


def test_dsir_log_ratio_matches_naive(spark, docs_df):
    from velesdb_spark.functions.lm import dsir_log_ratio

    target = docs_df.filter("doc_id IN (0, 1, 5)")  # the 'the X sat' docs
    got = {r["doc_id"]: r["log_ratio"]
           for r in dsir_log_ratio(docs_df, target).collect()}
    want = _naive_lr(DOCS, [DOCS[i][1] for i in (0, 1, 5)])
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-9), i
    # target-style docs score above the off-style doc
    assert got[0] > got[2]


def test_dsir_resample_prefers_target_like(spark):
    from velesdb_spark.functions.lm import dsir_resample

    rows = []
    for i in range(40):
        rows.append((i, "the cat sat on the mat and the dog sat too"))
    for i in range(40, 80):
        rows.append((i, "uno dos tres cuatro cinco seis siete ocho nueve"))
    raw = spark.createDataFrame(rows, ["doc_id", "text"])
    target = raw.filter("doc_id < 5")
    got = dsir_resample(raw, target, 20, lo=-5.0, hi=5.0)
    ids = [r["doc_id"] for r in got.collect()]
    assert len(ids) == 20
    n_target_like = sum(1 for i in ids if i < 40)
    assert n_target_like >= 15  # weights strongly favor the target style
    # deterministic across invocations
    ids2 = [r["doc_id"] for r in dsir_resample(
        raw, target, 20, lo=-5.0, hi=5.0).collect()]
    assert ids == ids2


def test_dsir_resample_lo_hi_guard(spark, docs_df):
    from velesdb_spark.functions.lm import dsir_resample

    with pytest.raises(ValueError, match="lo < hi"):
        dsir_resample(docs_df, docs_df, 3, lo=1.0, hi=1.0)


def test_counts_merge_to_full_model(spark, docs_df):
    """The count table is a mergeable sketch: disjoint halves merged ==
    training on the whole corpus — through to identical perplexities."""
    from velesdb_spark.functions.lm import (merge_bigram_counts,
                                            model_from_counts,
                                            perplexity,
                                            train_bigram_counts)

    h1 = docs_df.filter("doc_id < 3")
    h2 = docs_df.filter("doc_id >= 3")
    merged = merge_bigram_counts(train_bigram_counts(h1),
                                 train_bigram_counts(h2))
    full = train_bigram_counts(docs_df)
    key = lambda r: (r[0], r[1] or "", r[2])  # noqa: E731 — NULL-safe sort
    assert (sorted(map(tuple, merged.collect()), key=key)
            == sorted(map(tuple, full.collect()), key=key))
    got_m = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
             for r in perplexity(docs_df,
                                 *model_from_counts(merged)).collect()}
    got_f = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
             for r in perplexity(docs_df,
                                 *model_from_counts(full)).collect()}
    assert got_m == got_f


def test_merge_guard():
    from velesdb_spark.functions.lm import merge_bigram_counts

    with pytest.raises(ValueError, match="at least one"):
        merge_bigram_counts()


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["the", "cat", "dog", "sat", "ran", "mat", "sun", "big"]


@settings(max_examples=12, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8),
                min_size=1, max_size=6),
       st.sampled_from([1.0, 0.5, 2.0]))
def test_perplexity_property_vs_naive(spark, corpora, k):
    """Randomized corpora: distributed scores == the pure-Python model
    for every doc, any k — the hypothesis twin of the fixed cases."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpora)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
           for r in perplexity_self(df, k=k).collect()}
    want = _naive([t for _, t in rows], rows, k=k)
    for i, (n, nll, _) in want.items():
        assert got[i][0] == n, (i, corpora)
        assert got[i][1] == pytest.approx(nll, abs=1e-9), (i, corpora)


def test_dsir_log_ratio_stages_the_multiset_once(spark, docs_df):
    """r11 optimization contract: both model-scoring passes of
    dsir_log_ratio consume ONE staged per-doc bigram multiset (the
    tokenize+explode+aggregate corpus pass) instead of re-deriving it
    per model — the optimized plan must reference the cached relation
    on both branches."""
    from velesdb_spark.functions.lm import dsir_log_ratio

    out = dsir_log_ratio(docs_df, docs_df.limit(4))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("InMemoryRelation") >= 2, plan
    from velesdb_spark.functions.staging import release_staged
    release_staged()
