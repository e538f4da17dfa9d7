"""N-gram language-model perplexity scoring — the CCNet/KenLM-style
corpus quality filter (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data").

Beyond reference parity (the reference has no LM scoring); this is the
standard LLM-pipeline quality gate: train a smoothed n-gram model on a
trusted corpus, score candidate documents by perplexity, and drop the
high-perplexity tail. Everything here is built-in Column expressions and
equi-join/groupBy shuffles — no UDFs, no driver state:

- the model is two count tables bounded by VOCABULARY size (bigram types
  and context types), never by corpus size: at 100 TB of text the counts
  still fit a few GB and the scoring joins are AQE-broadcastable;
- count aggregation is map-side combinable; the scoring joins are plain
  equi-joins on token keys (AQE skew-join splits hot contexts like
  "the"); the final per-document aggregate shuffles (doc_id, double)
  pairs only;
- smoothing is add-k over exact int64 counts, so every per-token term is
  ``ln(c1 + k*V) - ln(c12 + k)`` — with k=1 both arguments are exact
  integers and the score reproduces cross-engine to ~1e-12, far inside
  the 4-decimal gate rounding.

Tokenizer = text_analysis.word_tokens (the repo-wide oracle-matched
lowercased \\p{L}\\p{N} split).
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, functions as F

from .text_analysis import word_tokens

__all__ = ["train_bigram_counts", "merge_bigram_counts",
           "model_from_counts", "train_bigram_lm", "perplexity",
           "perplexity_self", "dsir_log_ratio", "dsir_resample"]

_BIGRAMS = "_lm_bigrams"


def _with_bigrams(df: DataFrame, text_col: str) -> DataFrame:
    """Attach ARRAY<STRUCT<w1,w2>> of adjacent word pairs (empty for
    docs with <2 tokens) — pure JVM zip of two shifted slices."""
    toks = word_tokens(F.col(text_col))
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.zip_with(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
                   lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return df.withColumn(_BIGRAMS, pairs)


def train_bigram_counts(corpus: DataFrame,
                        text_col: str = "text") -> DataFrame:
    """The LM model as ONE mergeable count table: (w1, w2, c12) rows
    where w2 IS NULL rows are unigram-presence markers (c12 = unigram
    count) and w2 NOT NULL rows are bigram counts.

    ONE tokenize+explode pass produces both: unigrams ride along as
    (w1, NULL) markers through the same groupBy, so bigram counts /
    context counts / vocabulary all hang off ONE exchange that AQE's
    stage reuse dedupes inside the scoring plan — the corpus is scanned
    and regex-tokenized once for training, not three times (measured
    49s → ~33s at 500k docs).

    The table is a MERGEABLE SKETCH: counts from disjoint corpus slices
    union+sum to exactly the full-corpus model (unigram markers make
    the vocabulary mergeable too — a distinct count would not be), so
    incremental ingest appends a per-batch count table and compacts by
    merge_bigram_counts — the IncrementalBm25Index discipline.
    """
    toks = word_tokens(F.col(text_col))
    n = F.size(toks)
    unis = F.transform(
        toks, lambda t: F.struct(t.alias("w1"),
                                 F.lit(None).cast("string").alias("w2")))
    bigs = F.when(
        n >= 2,
        F.zip_with(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
                   lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (corpus
            .select(F.explode(F.concat(unis, bigs)).alias("p"))
            .select("p.w1", "p.w2")
            .groupBy("w1", "w2").agg(F.count("*").alias("c12")))


def merge_bigram_counts(*count_tables: DataFrame) -> DataFrame:
    """Merge count tables from disjoint corpus slices (associative and
    commutative — counts are additive, vocabulary markers union)."""
    if not count_tables:
        raise ValueError("need at least one count table")
    merged = count_tables[0]
    for t in count_tables[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("w1", "w2").agg(F.sum("c12").alias("c12"))


def model_from_counts(counts: DataFrame,
                      ) -> Tuple[DataFrame, DataFrame, DataFrame]:
    """(bigram_counts, context_counts, vocab) views over one count
    table — all vocab-bounded, all hanging off the table's single
    aggregation exchange.

    The count table is STAGED here: its three views land in different
    spots of a scoring plan (two joins + a broadcast crossJoin) where
    Catalyst plans three independent copies of the corpus
    tokenize+explode+aggregate (plan-observed on lm_perplexity: the
    documents scan repeated 3x, 0 ReusedExchange). Persisting the
    vocab-bounded table — size independent of corpus length — makes the
    corpus pass run once, which is the operator's documented scale
    contract."""
    from velesdb_spark.functions.staging import stage

    counts = stage(counts)
    bigram_counts = counts.filter(F.col("w2").isNotNull())
    context_counts = bigram_counts.groupBy("w1").agg(
        F.sum("c12").alias("c1"))
    # distinct unigrams = the (w1, NULL) marker groups
    vocab = (counts.filter(F.col("w2").isNull())
             .agg(F.count("*").alias("v")))
    return bigram_counts, context_counts, vocab


def train_bigram_lm(corpus: DataFrame, text_col: str = "text",
                    ) -> Tuple[DataFrame, DataFrame, DataFrame]:
    """Train bigram counts on ``corpus``.

    Returns ``(bigram_counts, context_counts, vocab)``:
    - bigram_counts: (w1, w2, c12 BIGINT) — count of each adjacent pair;
    - context_counts: (w1, c1 BIGINT) — derived FROM the bigram table
      (one extra vocab-sized aggregate, not a second corpus scan);
    - vocab: a 1-row (v BIGINT) distinct-token count, meant to ride a
      broadcast crossJoin into the scoring plan (the bm25 corpus-stats
      pattern).

    All three are vocab-bounded: their size is independent of how many
    times each token appears, so the model stays broadcastable long
    after the corpus stops fitting anywhere.
    """
    return model_from_counts(train_bigram_counts(corpus, text_col))


def perplexity(score_df: DataFrame, bigram_counts: DataFrame,
               context_counts: DataFrame, vocab: DataFrame,
               text_col: str = "text", id_col: str = "doc_id",
               k: float = 1.0) -> DataFrame:
    """Score documents under an add-k-smoothed bigram model.

    P(w2|w1) = (c12 + k) / (c1 + k·V); unseen contexts and pairs fall
    back through the LEFT joins to c12=0 / c1=0 (pure OOV term 1/V).

    Returns one row per input document:
    (id_col, n_bigrams INT, avg_nll DOUBLE, ppl DOUBLE) where
    avg_nll = mean negative natural log-likelihood per bigram and
    ppl = exp(avg_nll); documents with <2 tokens get (0, 0.0, 1.0).

    Scale shape: per-doc bigram MULTISET counts first (shrinks the join
    input to distinct (doc, w1, w2) triples), two equi-joins against the
    vocab-bounded count tables, one broadcast crossJoin for V, then a
    map-combinable per-doc aggregate. No window, no UDF, no collect.
    """
    if k <= 0:
        raise ValueError(f"add-k smoothing needs k > 0, got {k}")
    dg = _doc_bigram_multiset(score_df, text_col, id_col)
    return _perplexity_from_multiset(dg, score_df, bigram_counts,
                                     context_counts, vocab, id_col, k)


def _doc_bigram_multiset(score_df: DataFrame, text_col: str,
                         id_col: str) -> DataFrame:
    """Per-doc bigram multiset (id, w1, w2, m) — the tokenize+explode+
    aggregate half of perplexity scoring, factored out so callers that
    score the SAME documents under several models (dsir_log_ratio) can
    stage it once instead of re-deriving it per model."""
    return (_with_bigrams(score_df, text_col)
            .select(F.col(id_col), F.explode(_BIGRAMS).alias("p"))
            .select(id_col, "p.w1", "p.w2")
            .groupBy(id_col, "w1", "w2").agg(F.count("*").alias("m")))


def _perplexity_from_multiset(dg: DataFrame, score_df: DataFrame,
                              bigram_counts: DataFrame,
                              context_counts: DataFrame, vocab: DataFrame,
                              id_col: str, k: float) -> DataFrame:
    scored = (dg.join(bigram_counts, ["w1", "w2"], "left")
              .join(context_counts, ["w1"], "left")
              .crossJoin(F.broadcast(vocab)))
    nll_term = (F.log(F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k) * F.col("v"))
                - F.log(F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k)))
    agg = (scored.groupBy(id_col)
           .agg(F.sum(F.col("m") * nll_term).alias("_nll_sum"),
                F.sum("m").alias("_n")))
    out = (score_df.select(id_col)
           .join(agg, [id_col], "left")
           .select(
               id_col,
               F.coalesce(F.col("_n"), F.lit(0)).cast("int")
               .alias("n_bigrams"),
               F.coalesce(F.col("_nll_sum") / F.col("_n"), F.lit(0.0))
               .alias("avg_nll"))
           .withColumn("ppl", F.exp(F.col("avg_nll"))))
    return out


def perplexity_self(corpus: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: float = 1.0) -> DataFrame:
    """Train on ``corpus`` and score the same corpus (the in-domain
    repetitiveness measure; low ppl = formulaic/boilerplate-heavy)."""
    bc, cc, v = train_bigram_lm(corpus, text_col)
    return perplexity(corpus, bc, cc, v, text_col, id_col, k)


def dsir_log_ratio(raw: DataFrame, target: DataFrame,
                   text_col: str = "text", id_col: str = "doc_id",
                   k: float = 1.0) -> DataFrame:
    """DSIR importance log-ratio (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw doc by
    log P_target(doc) − log P_raw(doc) under two add-k bigram models —
    positive = target-like. The DSIR paper uses hashed n-gram features;
    the bigram LM here is the same estimator family with an exact
    vocabulary.

    Returns (id_col, n_bigrams INT, log_ratio DOUBLE) for every raw
    doc; docs with <2 tokens get log_ratio 0.0. Scale shape = two
    model trainings (corpus-scan aggregates into vocab-bounded tables),
    two scoring passes, one id-equi join — everything JVM-side.
    """
    from velesdb_spark.functions.staging import stage

    bc_t, cc_t, v_t = train_bigram_lm(target, text_col)
    bc_r, cc_r, v_r = train_bigram_lm(raw, text_col)
    # BOTH scoring passes consume the identical per-doc bigram multiset
    # of ``raw``; un-staged, the tokenize+explode+aggregate corpus pass
    # runs once per model (plan-observed: two Generate-over-raw
    # subtrees). Stage it: one corpus pass, two vocab-bounded joins. The
    # staged frame is the aggregated (id, w1, w2, m) triples — already
    # shuffle-reduced, never the raw text.
    dg = stage(_doc_bigram_multiset(raw, text_col, id_col))
    under_t = (_perplexity_from_multiset(dg, raw, bc_t, cc_t, v_t,
                                         id_col, k)
               .select(id_col, "n_bigrams",
                       F.col("avg_nll").alias("_nll_t")))
    under_r = (_perplexity_from_multiset(dg, raw, bc_r, cc_r, v_r,
                                         id_col, k)
               .select(id_col, F.col("avg_nll").alias("_nll_r")))
    return (under_t.join(under_r, [id_col])
            .select(id_col, "n_bigrams",
                    (F.col("n_bigrams")
                     * (F.col("_nll_r") - F.col("_nll_t")))
                    .alias("log_ratio")))


def dsir_resample(raw: DataFrame, target: DataFrame, n: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  k: float = 1.0, lo: float = -50.0, hi: float = 50.0,
                  cap: int = 64, seed: str = "dsir") -> DataFrame:
    """DSIR selection: resample ``n`` raw docs with probability
    increasing in the importance log-ratio.

    The continuous exp(log_ratio) weight is quantized to an integer
    1..cap over the fixed clip range [lo, hi] (round(…,6) first, so the
    ~1e-12 cross-engine drift of the ratio can never flip a bucket),
    then drawn through sampling.weighted_key — the pow-free
    Efraimidis–Spirakis max-of-w-hashes key that any md5-capable engine
    reproduces bit-for-bit. Returns the sampled rows with their
    log_ratio, weight, and ranking key.
    """
    from .sampling import weighted_sample_topk

    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi}]")
    lr = dsir_log_ratio(raw, target, text_col, id_col, k)
    clipped = F.least(F.lit(float(hi)),
                      F.greatest(F.lit(float(lo)),
                                 F.round(F.col("log_ratio"), 6)))
    weight = (F.lit(1)
              + F.floor((clipped - F.lit(float(lo)))
                        / F.lit(float(hi - lo)) * F.lit(cap - 1))
              ).cast("long")
    weighted = (raw.join(lr, [id_col])
                .withColumn("_w", F.least(F.lit(int(cap)), weight)))
    return weighted_sample_topk(weighted, n, "_w", id_col=id_col,
                                seed=seed, cap=cap)
