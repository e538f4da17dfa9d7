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
