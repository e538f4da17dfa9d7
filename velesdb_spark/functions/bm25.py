"""BM25 full-text scoring as DataFrame programs.

Reference: crates/velesdb-core/src/index/bm25.rs —
score(D,Q) = Σ_q IDF(q) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl)),
IDF(q) = ln((N − df + 0.5)/(df + 0.5) + 1), k1=1.2, b=0.75 (bm25.rs:10-20,
idf bm25.rs:298-303). Tokenizer: lowercase, split on non-alphanumeric, drop
tokens of byte-length ≤ 1 (bm25.rs:114-120 — note the reference's `s.len()`
is BYTES, so single multi-byte chars survive; we use octet_length for parity).
Duplicate query terms score multiply (scoring loop iterates the query bag,
bm25.rs:348-360).

Scale design: the corpus statistics (postings tf, per-term df, doc lengths,
N/avgdl) are DataFrames produced by explode + groupBy — the classic
distributed inverted-index build, one shuffle each, all map-side combinable.
A query is a tiny (terms × multiplicity) DataFrame broadcast against the
postings; per-doc score is one partial aggregation. Nothing is collected to
the driver except the optional top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
# Unicode-aware split (Rust char::is_alphanumeric ≈ \p{L} | \p{N})
TOKEN_SPLIT_RE = r"[^\p{L}\p{N}]+"


def tokenize(col: Column) -> Column:
    """lowercase → split non-alphanumeric → drop byte-length ≤ 1 tokens
    (bm25.rs:114-120)."""
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE),
        lambda t: F.octet_length(t) > 1,
    )


def tokenize_py(text: str) -> list[str]:
    """Driver-side tokenizer (for query strings) — must match tokenize()."""
    import re

    # [\W_]+ = non-alphanumeric incl. underscore (Rust '_'.is_alphanumeric()
    # is false, so '_' separates tokens)
    out = []
    for tok in re.split(r"[\W_]+", text.lower(), flags=re.UNICODE):
        if len(tok.encode("utf-8")) > 1:
            out.append(tok)
    return out


class Bm25Index:
    """Corpus statistics for BM25 over (id, text) — all lazy DataFrames.

    Mirrors Bm25Index in the reference (index/bm25.rs): ``add``-time work
    becomes the postings build; ``search`` becomes a score join.
    """

    def __init__(self, docs: DataFrame, id_col: str = "id", text_col: str = "text",
                 cache: bool = False):
        from velesdb_spark.functions.util import spread

        self.id_col = id_col
        spark = docs.sparkSession
        # Stage the token array before exploding (keeps the regex chain out
        # of the generator) and spread small single-file inputs across cores.
        toks = spread(docs).select(
            F.col(id_col).alias("_doc_id"),
            tokenize(F.col(text_col)).alias("_toks"),
        )
        tokens = toks.select("_doc_id", F.explode("_toks").alias("term"))
        # Per-doc length; empty docs are NOT indexed (bm25.rs:146-148)
        self.doc_lengths = tokens.groupBy("_doc_id").agg(F.count("*").alias("dl"))
        # Postings: term frequency per (term, doc)
        self.postings = tokens.groupBy("term", "_doc_id").agg(F.count("*").alias("tf"))
        # Document frequency per term
        self.term_df = self.postings.groupBy("term").agg(F.count("*").alias("df"))
        # Corpus stats: N and avgdl (1-row DataFrame, broadcastable)
        self.stats = self.doc_lengths.agg(
            F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
        )
        self.spark = spark
        if cache:
            self.postings = self.postings.cache()
            self.doc_lengths = self.doc_lengths.cache()
            self.term_df = self.term_df.cache()
            self.stats = self.stats.cache()

    def query_terms_df(self, query: str) -> DataFrame:
        """Query token bag with multiplicities (duplicate terms multiply)."""
        terms = tokenize_py(query)
        counts: dict[str, int] = {}
        for t in terms:
            counts[t] = counts.get(t, 0) + 1
        rows = [(t, c) for t, c in counts.items()] or []
        return self.spark.createDataFrame(rows, "term string, qtf int") if rows else \
            self.spark.createDataFrame([], "term string, qtf int")

    def scores(self, query: str) -> DataFrame:
        """Per-document BM25 scores for ``query`` → (id, _bm25_score).

        Docs containing none of the query terms are absent (score join is
        inner); score > 0 filter matches the reference (bm25.rs:321-327).
        """
        qterms = F.broadcast(
            self.query_terms_df(query)
            .join(self.term_df, "term", "inner")  # df per present term
        )
        scored = (
            self.postings.join(qterms, "term", "inner")
            .join(self.doc_lengths, "_doc_id")
            .crossJoin(F.broadcast(self.stats))
            .withColumn(
                "_idf",
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                ),
            )
            .withColumn(
                "_term_score",
                F.col("qtf")
                * F.col("_idf")
                * (F.col("tf") * (K1 + 1.0))
                / (
                    F.col("tf")
                    + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))
                ),
            )
            .groupBy("_doc_id")
            .agg(F.sum("_term_score").alias("_bm25_score"))
            .filter(F.col("_bm25_score") > 0.0)
        )
        return scored.select(F.col("_doc_id").alias(self.id_col), "_bm25_score")

    def search(self, query: str, k: int = 10) -> DataFrame:
        """Top-k by BM25 score descending (TakeOrderedAndProject — no full
        sort at scale)."""
        return self.scores(query).orderBy(F.desc("_bm25_score"), F.asc(self.id_col)).limit(k)

    def save(self, path: str, term_buckets: int = 64) -> str:
        """Materialize the inverted index to parquet. Postings are written
        bucketed by a hash of the term so a query's score join reads only
        its terms' buckets (the 100 TB layout; locally the same files).

        The reference persists its index on flush (crud.rs flush →
        index/bm25.rs serialization); this is that, as columnar artifacts.
        """
        # persist the shared tokenize/explode lineage: term_df derives from
        # postings and stats from doc_lengths — without this, the four
        # writes would each re-scan and re-shuffle the whole corpus
        postings = self.postings.persist()
        doc_lengths = self.doc_lengths.persist()
        try:
            (postings
             .withColumn("_tb", F.abs(F.xxhash64("term")) % term_buckets)
             .write.mode("overwrite").partitionBy("_tb")
             .parquet(f"{path}/postings"))
            doc_lengths.write.mode("overwrite").parquet(f"{path}/doc_lengths")
            postings.groupBy("term").agg(F.count("*").alias("df")) \
                .write.mode("overwrite").parquet(f"{path}/term_df")
            doc_lengths.agg(
                F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")) \
                .write.mode("overwrite").parquet(f"{path}/stats")
        finally:
            postings.unpersist()
            doc_lengths.unpersist()
        return path

    @classmethod
    def load(cls, spark, path: str, id_col: str = "id") -> "Bm25Index":
        """Open a saved index without recomputing corpus statistics."""
        idx = cls.__new__(cls)
        idx.id_col = id_col
        idx.spark = spark
        idx.postings = spark.read.parquet(f"{path}/postings").drop("_tb")
        idx.doc_lengths = spark.read.parquet(f"{path}/doc_lengths")
        idx.term_df = spark.read.parquet(f"{path}/term_df")
        idx.stats = spark.read.parquet(f"{path}/stats")
        return idx


def bm25_scan_scores(docs: DataFrame, query: str, id_col: str = "id",
                     text_col: str = "text") -> DataFrame:
    """Query-time BM25 with NO postings index: per-term tf is an array
    expression over the tokenized text, so the whole plan is two
    column-pruned scans (one tiny stats aggregate, one scoring pass) and a
    broadcast of a single stats row — no explode, no shuffle of doc-level
    data, no Python. Identical scores to Bm25Index.scores().

    Use this for ad-hoc queries; use Bm25Index (postings DataFrames) when
    the corpus is indexed once and searched many times — that amortizes the
    inverted-index build exactly like the reference's add-time indexing
    (index/bm25.rs add/search split).
    """
    counts: dict[str, int] = {}
    for t in tokenize_py(query):
        counts[t] = counts.get(t, 0) + 1
    if not counts:
        return docs.select(
            F.col(id_col), F.lit(0.0).alias("_bm25_score")).limit(0)

    base = (
        docs.select(F.col(id_col).alias("_doc_id"),
                    tokenize(F.col(text_col)).alias("_toks"))
        .withColumn("_dl", F.size("_toks"))
        .filter(F.col("_dl") > 0)  # empty docs are not indexed (bm25.rs:146-148)
    )
    terms = list(counts)

    def _eq(term):
        # single-arg lambda only: a 2-arg lambda would make F.filter pass
        # the array index as the second argument
        return lambda x: x == F.lit(term)

    for i, t in enumerate(terms):
        base = base.withColumn(
            f"_tf{i}", F.size(F.filter(F.col("_toks"), _eq(t))))
    base = base.drop("_toks")

    stats = base.agg(
        F.count("*").alias("n_docs"), F.avg("_dl").alias("avgdl"),
        *[F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
          for i in range(len(terms))])

    scored = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        idf = F.log((F.col("n_docs") - F.col(f"_df{i}") + 0.5)
                    / (F.col(f"_df{i}") + 0.5) + 1.0)
        sat = (F.col(f"_tf{i}") * (K1 + 1.0)) / (
            F.col(f"_tf{i}") + K1 * (1.0 - B + B * F.col("_dl") / F.col("avgdl")))
        score = score + F.when(F.col(f"_tf{i}") > 0,
                               float(counts[t]) * idf * sat).otherwise(0.0)
    return (
        scored.withColumn("_bm25_score", score)
        .filter(F.col("_bm25_score") > 0.0)
        .select(F.col("_doc_id").alias(id_col), "_bm25_score")
    )


def bm25_scan_search(docs: DataFrame, query: str, k: int = 10,
                     id_col: str = "id", text_col: str = "text") -> DataFrame:
    """Top-k over the scan path (TakeOrderedAndProject — no full sort)."""
    return (bm25_scan_scores(docs, query, id_col, text_col)
            .orderBy(F.desc("_bm25_score"), F.asc(id_col)).limit(k))


def bm25_score_df(docs: DataFrame, query: str, id_col: str = "id",
                  text_col: str = "text") -> DataFrame:
    """One-shot convenience: scan-path scores (no index build)."""
    return bm25_scan_scores(docs, query, id_col=id_col, text_col=text_col)
