"""BM25 correctness — pure-Python reference implementation of the exact
formula (index/bm25.rs:10-20, idf :298-303, tokenizer :114-120)."""

import math
import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from velesdb_spark.functions.bm25 import Bm25Index, tokenize_py

K1, B = 1.2, 0.75


def ref_tokenize(text):
    return [t for t in re.split(r"[\W_]+", text.lower()) if len(t.encode()) > 1]


def ref_bm25(docs: dict[int, str], query: str) -> dict[int, float]:
    toks = {i: ref_tokenize(t) for i, t in docs.items()}
    toks = {i: t for i, t in toks.items() if t}  # empty docs not indexed
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    qterms = ref_tokenize(query)
    df = {}
    for q in set(qterms):
        df[q] = sum(1 for t in toks.values() if q in t)
    out = {}
    for i, t in toks.items():
        score = 0.0
        for q in qterms:  # bag — duplicates count twice (bm25.rs:348-360)
            if df.get(q, 0) == 0:
                continue
            tf = t.count(q)
            if tf == 0:
                continue
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            score += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(t) / avgdl))
        if score > 0:
            out[i] = score
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "rust programming language for systems"),
        (2, "python programming for data science"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "rust rust rust all the way down"),
        (5, "a b c d"),  # all single-char tokens → not indexed
        (6, "programming languages: rust, python, go"),
        (7, ""),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    return df, {i: t for i, t in rows}


def test_tokenizer_parity():
    assert tokenize_py("Hello, World! a_b x") == ["hello", "world"]
    assert tokenize_py("C'est l'été 42") == ["est", "été", "42"]


def test_scores_match_reference(corpus):
    df, docs = corpus
    idx = Bm25Index(df)
    got = {r.id: r._bm25_score for r in idx.scores("rust programming").collect()}
    want = ref_bm25(docs, "rust programming")
    assert set(got) == set(want)
    for i in got:
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])


def test_duplicate_query_terms(corpus):
    df, docs = corpus
    idx = Bm25Index(df)
    got = {r.id: r._bm25_score for r in idx.scores("rust rust").collect()}
    want = ref_bm25(docs, "rust rust")
    for i in got:
        assert abs(got[i] - want[i]) < 1e-9


def test_absent_term(corpus):
    df, _ = corpus
    idx = Bm25Index(df)
    assert idx.scores("zzzmissing").count() == 0


def test_topk_order(corpus):
    df, docs = corpus
    idx = Bm25Index(df)
    got = [r.id for r in idx.search("rust", 3).collect()]
    want = sorted(ref_bm25(docs, "rust").items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == [w[0] for w in want[:3]]


def test_match_predicate_velesql(spark, corpus):
    from velesdb_spark.velesql.translator import Catalog, translate

    df, docs = corpus
    cat = Catalog()
    cat.register("docs", df, text_col="text")
    out = translate("SELECT id FROM docs WHERE text MATCH 'rust' LIMIT 100", cat)
    got = sorted(r.id for r in out.collect())
    assert got == sorted(ref_bm25(docs, "rust"))


def test_documents_table(catalog):
    """Smoke over the driver's documents fixture."""
    info = catalog.resolve("documents")
    idx = Bm25Index(info.df, id_col="doc_id", text_col="text")
    res = idx.search("spark query join", 10).collect()
    assert len(res) == 10
    scores = [r._bm25_score for r in res]
    assert scores == sorted(scores, reverse=True)


def test_hybrid_search_collection(spark, corpus):
    from velesdb_spark.database import Collection

    df, _ = corpus
    df = df.withColumn(
        "vector",
        F.array(*[(F.col("id") * F.lit(i)).cast("float") % 7 for i in range(1, 5)]))
    col = Collection(spark, "c", metric="cosine", df=df, text_col="text")
    res = col.hybrid_search("rust programming", [1.0, 2.0, 3.0, 4.0], k=5).collect()
    assert 0 < len(res) <= 5
    scores = [r.score for r in res]
    assert scores == sorted(scores, reverse=True)


def test_scan_path_matches_index_path(corpus):
    from velesdb_spark.functions.bm25 import bm25_scan_scores

    df, docs = corpus
    for q in ["rust programming", "programming programming", "fox", "zzz", ""]:
        via_index = {r.id: r._bm25_score
                     for r in Bm25Index(df).scores(q).collect()}
        via_scan = {r.id: r._bm25_score
                    for r in bm25_scan_scores(df, q).collect()}
        assert set(via_scan) == set(via_index), q
        for i in via_scan:
            assert via_scan[i] == pytest.approx(via_index[i], rel=1e-9), q
