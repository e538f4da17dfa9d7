"""Product quantization (PQ): m-subspace codebooks + asymmetric-distance
(ADC) scoring — the compressed-domain ANN scale path.

The reference compresses vectors with SQ8 / binary / f16
(crates/velesdb-core/src/quantization.rs, half_precision.rs) but has no
product quantizer; this module is capability headroom using the public
method of Jégou, Douze & Schmid, "Product Quantization for Nearest
Neighbor Search" (IEEE TPAMI 2011): split a d-dim vector into ``m``
subvectors, quantize each against its own ``ksub``-codeword codebook, and
score a query against the m·ksub partial-distance table instead of the
raw floats. Codes are ``m`` small ints per vector vs ``4·d`` bytes of
f32 — at d=64, m=8 that is a 32× storage/IO reduction, and search cost
is m table lookups per row instead of d multiply-adds.

Spark-first shape:
- Codebooks are tiny (m·ksub·dsub floats) and live driver-side; they
  ride into the plan as literals (small ksub, whole-stage codegen) or in
  an Arrow pandas-UDF closure (large ksub) — the same two-tier strategy
  as IVF list assignment in ``similarity.py``.
- Encoding is one narrow map over the table — no shuffle; the encoded
  table persists as parquet with the codebooks alongside, so a 100 TB
  corpus is encoded once and searched from the codes.
- ADC search is a scan of the codes + per-subspace literal-array lookup
  (``element_at``), then ``TakeOrderedAndProject`` top-k — no shuffle
  beyond the final k rows; an optional exact re-rank joins the top-R
  candidates back to the raw vectors (classic PQ refine step).

Determinism for the DuckDB oracle: ``init="sample"`` builds codebook j
from the first ``ksub`` rows in id order (sub-slice j of each) — the
bootstrap init the IVF oracle already uses — so assignment, the distance
table, and the final ranking are all re-derivable relationally.
``init="kmeans"`` runs seeded NumPy k-means per subspace on a bounded
deterministic sample for production quality.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from velesdb_spark.functions.similarity import LSH_SEED, _kmeans_np
from velesdb_spark.functions.arraylit import (double_array_lit,
                                               double_matrix_lit)

# JVM-literal path bound: m * ksub element_at/argmin terms stay small
# enough for codegen; above this the codebooks move into an Arrow UDF
# closure (constant plan size).
EXPR_CODES_MAX = 64


def subspace_bounds(dim: int, m: int) -> list[tuple[int, int]]:
    """1-based (start, length) per subspace; dim must divide evenly."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    return [(j * dsub + 1, dsub) for j in range(m)]


def train_codebooks_sample(df: DataFrame, vector_col: str, id_col: str,
                           dim: int, m: int, ksub: int) -> np.ndarray:
    """Sampled-points codebooks: sub-slices of the first ``ksub`` rows in
    id order (bounded TakeOrdered collect — never a full sort)."""
    rows = (df.select(F.col(id_col).alias("_id"),
                      F.col(vector_col).alias("_v"))
            .orderBy("_id").limit(ksub).collect())
    if len(rows) < ksub:
        raise ValueError(f"need ≥{ksub} rows to sample codebooks")
    pts = np.array([r["_v"] for r in rows], dtype=np.float64)  # (ksub, dim)
    return np.stack([pts[:, lo - 1:lo - 1 + ln]
                     for lo, ln in subspace_bounds(dim, m)])


def train_codebooks_kmeans(df: DataFrame, vector_col: str, id_col: str,
                           dim: int, m: int, ksub: int,
                           seed: int = LSH_SEED, max_iter: int = 8,
                           train_sample: int = 4096) -> np.ndarray:
    """Seeded per-subspace k-means on a deterministic bounded sample
    (xxhash64 top-k — the IvfIndex training discipline)."""
    sample = (df.select(
        F.col(vector_col).alias("_v"),
        F.xxhash64(F.col(id_col).cast("string")).alias("_h"))
        .orderBy("_h").limit(train_sample).collect())
    pts = np.array([r["_v"] for r in sample], dtype=np.float64)
    dsub = dim // m
    return np.stack([
        _kmeans_np(pts[:, j * dsub:(j + 1) * dsub], ksub, seed + j, max_iter)
        for j in range(m)])


def _encode_expr(vec: Column, codebooks: np.ndarray) -> Column:
    """JVM path: per-subspace squared-L2 argmin (-2·x·c + ||c||², the
    ||x||² term is row-constant) with first-index tie-break, assembled
    into one ARRAY<INT> of codes. Mirrors _nearest_centroid_expr."""
    m, ksub, dsub = codebooks.shape
    bounds = subspace_bounds(m * dsub, m)
    codes = []
    for j in range(m):
        sub = F.slice(vec, *bounds[j])
        scores = []
        for c in codebooks[j]:
            dot = F.aggregate(
                F.zip_with(sub, double_array_lit(c),
                           lambda a, b: a.cast("double") * b),
                F.lit(0.0), lambda acc, x: acc + x)
            scores.append(-2.0 * dot + float(c @ c))
        arr = F.array(*scores)
        codes.append((F.array_position(arr, F.array_min(arr)) - 1)
                     .cast("int"))
    return F.array(*codes)


def _encode_gemm(vec: Column, codebooks: np.ndarray) -> Column:
    """Arrow path for large m·ksub: per batch, one (n, dsub) @ (dsub,
    ksub) gemm per subspace; codebooks ride in the closure, so the plan
    stays constant-size however big the codebooks get."""
    m, ksub, dsub = codebooks.shape
    cb_t = [np.ascontiguousarray(codebooks[j].T) for j in range(m)]
    norms = [(codebooks[j] ** 2).sum(axis=1) for j in range(m)]

    @F.pandas_udf("array<int>")
    def _enc(v: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(x, dtype=np.float64) for x in v])
        out = np.empty((mat.shape[0], m), dtype=np.int32)
        for j in range(m):
            sub = mat[:, j * dsub:(j + 1) * dsub]
            d = -2.0 * (sub @ cb_t[j]) + norms[j]
            out[:, j] = d.argmin(axis=1)
        return pd.Series(list(out))

    return _enc(vec)


def encode_codes(vec: Column, codebooks: np.ndarray) -> Column:
    m, ksub, _ = codebooks.shape
    if m * ksub <= EXPR_CODES_MAX:
        return _encode_expr(vec, codebooks)
    return _encode_gemm(vec, codebooks)


def adc_table(codebooks: np.ndarray, q: Sequence[float]) -> np.ndarray:
    """(m, ksub) partial squared-L2 distances of the query's subvectors
    to every codeword — computed once per query, driver-side."""
    m, ksub, dsub = codebooks.shape
    qa = np.asarray(q, dtype=np.float64)
    return np.stack([
        ((codebooks[j] - qa[j * dsub:(j + 1) * dsub]) ** 2).sum(axis=1)
        for j in range(m)])


def _adc_expr(codes: Column, table: np.ndarray) -> Column:
    """ADC distance = Σ_j table[j][code_j]: m literal-array lookups, all
    codegen'd — the per-row cost is m element_at ops, not d mult-adds."""
    m, ksub = table.shape
    out = F.lit(0.0)
    for j in range(m):
        lut = double_array_lit(table[j])
        out = out + F.element_at(lut, F.element_at(codes, j + 1) + F.lit(1))
    return out


def _adc_gemm(codes: Column, table: np.ndarray) -> Column:
    t = np.ascontiguousarray(table)

    @F.pandas_udf("double")
    def _score(c: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(x, dtype=np.int64) for x in c])
        return pd.Series(t[np.arange(t.shape[0]), mat].sum(axis=1))

    return _score(codes)


def adc_distance(codes: Column, table: np.ndarray) -> Column:
    m, ksub = table.shape
    if m * ksub <= EXPR_CODES_MAX:
        return _adc_expr(codes, table)
    return _adc_gemm(codes, table)


class PqIndex:
    """Encoded table + codebooks; search scans codes, never raw floats.

    ``rerank`` in :meth:`search` fetches the top-R by ADC and re-scores
    them exactly from the raw vectors (kept alongside the codes) — the
    standard two-stage PQ pipeline: compressed-domain candidate
    generation, exact refinement of a bounded candidate set.
    """

    def __init__(self, df: DataFrame, vector_col: str = "embedding",
                 id_col: str = "id", m: int = 8, ksub: int = 16,
                 init: str = "kmeans", seed: int = LSH_SEED,
                 codebooks: Optional[np.ndarray] = None,
                 keep_vectors: bool = True):
        self.vector_col = vector_col
        self.id_col = id_col
        first = df.select(vector_col).first()
        if first is None:
            raise ValueError("empty table")
        dim = len(first[0])
        self.dim = dim
        if codebooks is not None:
            self.codebooks = np.asarray(codebooks, dtype=np.float64)
        elif init == "sample":
            self.codebooks = train_codebooks_sample(
                df, vector_col, id_col, dim, m, ksub)
        else:
            self.codebooks = train_codebooks_kmeans(
                df, vector_col, id_col, dim, m, ksub, seed=seed)
        cols = [F.col(id_col),
                encode_codes(F.col(vector_col), self.codebooks)
                .alias("_codes")]
        if keep_vectors:
            cols.append(F.col(vector_col))
        self.codes = df.select(*cols)
        self.keep_vectors = keep_vectors

    @property
    def compression_ratio(self) -> float:
        """f32 bytes per vector ÷ code bytes per vector (int8 codes when
        ksub ≤ 256, which is the PQ norm)."""
        m = self.codebooks.shape[0]
        code_bytes = m * (1 if self.codebooks.shape[1] <= 256 else 4)
        return (4.0 * self.dim) / code_bytes

    def search(self, q: Sequence[float], k: int = 10,
               rerank: int = 0) -> DataFrame:
        """Top-k by ascending ADC squared-L2; ``rerank`` > 0 re-scores
        that many ADC candidates exactly (cosine) and returns top-k of
        the refined set."""
        from velesdb_spark.functions.distance import cosine_similarity
        from velesdb_spark.operators.topk import vector_lit

        table = adc_table(self.codebooks, q)
        scored = self.codes.withColumn(
            "adc_dist", adc_distance(F.col("_codes"), table))
        base = (scored.orderBy(F.asc("adc_dist"), F.asc(self.id_col)))
        if rerank <= 0:
            return (base.limit(k)
                    .select(self.id_col,
                            F.round("adc_dist", 6).alias("adc_dist")))
        if not self.keep_vectors:
            raise ValueError("rerank requires keep_vectors=True")
        cand = base.limit(max(rerank, k))
        exact = cand.withColumn(
            "score", cosine_similarity(F.col(self.vector_col),
                                       vector_lit(list(q))))
        return (exact.orderBy(F.desc("score"), F.asc(self.id_col)).limit(k)
                .select(self.id_col, F.round("score", 6).alias("score")))

    def reconstruct(self) -> DataFrame:
        """Decode codes back to approximate vectors (codeword concat) —
        the quantization error surface for tests/eval."""
        m, ksub, dsub = self.codebooks.shape
        parts = []
        for j in range(m):
            cb = double_matrix_lit(self.codebooks[j])
            parts.append(F.element_at(cb, F.element_at(F.col("_codes"),
                                                       j + 1) + F.lit(1)))
        return self.codes.select(
            self.id_col, F.flatten(F.array(*parts)).alias("approx"))

    def save(self, path: str) -> str:
        self.codes.write.mode("overwrite").parquet(path + "/codes")
        os.makedirs(path, exist_ok=True)
        with open(path + "/codebooks.json", "w") as f:
            json.dump({"dim": self.dim, "vector_col": self.vector_col,
                       "id_col": self.id_col,
                       "keep_vectors": self.keep_vectors,
                       "codebooks": self.codebooks.tolist()}, f)
        return path

    @classmethod
    def load(cls, spark, path: str) -> "PqIndex":
        with open(path + "/codebooks.json") as f:
            meta = json.load(f)
        idx = cls.__new__(cls)
        idx.dim = meta["dim"]
        idx.vector_col = meta["vector_col"]
        idx.id_col = meta["id_col"]
        idx.keep_vectors = meta["keep_vectors"]
        idx.codebooks = np.asarray(meta["codebooks"], dtype=np.float64)
        idx.codes = spark.read.parquet(path + "/codes")
        return idx


def residual_expr(vec: Column, centroids: np.ndarray,
                  list_col: str = "_list") -> Column:
    """x − coarse_centroid[list]: the centroid table rides as a literal
    array-of-arrays indexed by the assigned list (JVM, fine for the
    ≤EXPR_NLIST_MAX tier Spark plans tolerate; a larger nlist would move
    this into the same Arrow closure as _encode_gemm)."""
    cent = double_matrix_lit(centroids)
    cvec = F.element_at(cent, F.col(list_col) + F.lit(1))
    return F.zip_with(vec, cvec, lambda a, b: a.cast("double") - b)


def train_residual_codebooks(df: DataFrame, vector_col: str, id_col: str,
                             coarse: np.ndarray, dim: int, m: int,
                             ksub: int, init: str = "kmeans",
                             seed: int = LSH_SEED,
                             train_sample: int = 4096) -> np.ndarray:
    """PQ codebooks over RESIDUALS (x − nearest coarse centroid): bounded
    deterministic sample collected once, assignment + residuals computed
    driver-side in NumPy (the sample is small), then the usual seeded
    per-subspace k-means — or first-ksub sampled-points init on the
    residuals when ``init='sample'`` (sample = first ksub rows in id
    order, matching train_codebooks_sample's row choice)."""
    order = (F.col(id_col).asc() if init == "sample"
             else F.xxhash64(F.col(id_col).cast("string")).asc())
    n = ksub if init == "sample" else train_sample
    rows = (df.select(F.col(vector_col).alias("_v"),
                      F.col(id_col).alias("_id"))
            .orderBy(order).limit(n).collect())
    pts = np.array([r["_v"] for r in rows], dtype=np.float64)
    assign = ((pts[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2) \
        .argmin(axis=1)
    res = pts - coarse[assign]
    dsub = dim // m
    if init == "sample":
        return np.stack([res[:, j * dsub:(j + 1) * dsub] for j in range(m)])
    return np.stack([
        _kmeans_np(res[:, j * dsub:(j + 1) * dsub], ksub, seed + j, 8)
        for j in range(m)])


class IvfPqIndex:
    """IVF coarse pruning over PQ codes: rows partition by nearest coarse
    centroid (the IvfIndex machinery), PQ codes score only the probed
    lists — candidate count drops by ~nprobe/nlist BEFORE any ADC work,
    and a saved index prunes list partitions at the file level.

    ``residual=False`` (default) quantizes the raw vector — every piece
    stays independently oracle-checkable (the driver's ivfpq_topk gate),
    at slightly worse quantization error. ``residual=True`` is the full
    Jégou et al. §IV composition: codes quantize x − coarse_centroid
    (the residual has far less variance than x, so the same bits encode
    it tighter), and search builds one per-list ADC table from the
    query's residual against that list's centroid. NumPy-differential
    tested; the recall harness shows the residual variant dominating the
    raw variant on clustered data.
    """

    def __init__(self, df: DataFrame, vector_col: str = "embedding",
                 id_col: str = "id", n_centroids: int = 16,
                 m: int = 8, ksub: int = 16, init: str = "kmeans",
                 seed: int = LSH_SEED,
                 coarse_centroids: Optional[np.ndarray] = None,
                 codebooks: Optional[np.ndarray] = None,
                 residual: bool = False):
        from velesdb_spark.functions.similarity import (IvfIndex,
                                                        nearest_centroid)

        self.ivf = IvfIndex(df, vector_col=vector_col, id_col=id_col,
                            n_centroids=n_centroids, seed=seed,
                            centroids=coarse_centroids)
        self.vector_col = vector_col
        self.id_col = id_col
        self.residual = bool(residual)
        if residual:
            first = df.select(vector_col).first()
            dim = len(first[0])
            if codebooks is None:
                codebooks = train_residual_codebooks(
                    df, vector_col, id_col, self.ivf.centroids, dim, m,
                    ksub, init=init, seed=seed)
            pq = PqIndex.__new__(PqIndex)
            pq.codebooks = np.asarray(codebooks, dtype=np.float64)
            pq.vector_col = vector_col
            pq.id_col = id_col
            pq.dim = dim
            pq.keep_vectors = False
            self.pq = pq
            assigned = df.select(
                F.col(id_col), F.col(vector_col),
                nearest_centroid(F.col(vector_col), self.ivf.centroids)
                .alias("_list"))
            self.codes = assigned.select(
                F.col(id_col), "_list",
                encode_codes(
                    residual_expr(F.col(vector_col), self.ivf.centroids),
                    self.pq.codebooks).alias("_codes"))
        else:
            self.pq = PqIndex(df, vector_col=vector_col, id_col=id_col,
                              m=m, ksub=ksub, init=init, seed=seed,
                              codebooks=codebooks)
            self.codes = df.select(
                F.col(id_col),
                nearest_centroid(F.col(vector_col), self.ivf.centroids)
                .alias("_list"),
                encode_codes(F.col(vector_col), self.pq.codebooks)
                .alias("_codes"))

    def search(self, q: Sequence[float], k: int = 10,
               nprobe: int = 2) -> DataFrame:
        qa = np.asarray(q, dtype=np.float64)
        d = np.linalg.norm(self.ivf.centroids - qa, axis=1)
        lists = [int(i) for i in np.argsort(d, kind="stable")[:nprobe]]
        if not self.residual:
            table = adc_table(self.pq.codebooks, q)
            cand = self.codes.filter(F.col("_list").isin(lists))
            return (cand.withColumn("adc_dist",
                                    adc_distance(F.col("_codes"), table))
                    .orderBy(F.asc("adc_dist"), F.asc(self.id_col)).limit(k)
                    .select(self.id_col,
                            F.round("adc_dist", 6).alias("adc_dist")))
        # residual mode: one ADC table per probed list (the query residual
        # differs per list); each branch reads only its list partition
        parts = None
        for lst in lists:
            table = adc_table(self.pq.codebooks,
                              qa - self.ivf.centroids[lst])
            part = (self.codes.filter(F.col("_list") == lst)
                    .withColumn("adc_dist",
                                adc_distance(F.col("_codes"), table)))
            parts = part if parts is None else parts.unionByName(part)
        return (parts.orderBy(F.asc("adc_dist"), F.asc(self.id_col))
                .limit(k)
                .select(self.id_col,
                        F.round("adc_dist", 6).alias("adc_dist")))

    def save(self, path: str) -> str:
        """List-partitioned codes (a probe reads only its lists' files —
        the same partition-pruning layout as IvfIndex.save) + both
        codebook sets alongside."""
        self.codes.write.mode("overwrite").partitionBy("_list") \
            .parquet(path + "/lists")
        os.makedirs(path, exist_ok=True)
        with open(path + "/meta.json", "w") as f:
            json.dump({"vector_col": self.vector_col, "id_col": self.id_col,
                       "residual": self.residual,
                       "coarse": self.ivf.centroids.tolist(),
                       "codebooks": self.pq.codebooks.tolist()}, f)
        return path

    @classmethod
    def load(cls, spark, path: str) -> "IvfPqIndex":
        with open(path + "/meta.json") as f:
            meta = json.load(f)
        idx = cls.__new__(cls)
        idx.vector_col = meta["vector_col"]
        idx.id_col = meta["id_col"]
        # the flag decides how search scores the stored codes — a
        # residual index scored raw would be silently wrong, so it is
        # persisted, never defaulted
        idx.residual = bool(meta["residual"])
        ivf = _IvfShim()
        ivf.centroids = np.asarray(meta["coarse"], dtype=np.float64)
        idx.ivf = ivf
        pq = PqIndex.__new__(PqIndex)
        pq.codebooks = np.asarray(meta["codebooks"], dtype=np.float64)
        pq.vector_col = meta["vector_col"]
        pq.id_col = meta["id_col"]
        idx.pq = pq
        idx.codes = spark.read.parquet(path + "/lists")
        return idx


class _IvfShim:
    """Centroids-only stand-in for IvfIndex on the load path (search only
    needs the coarse centroid matrix, never the assigned DataFrame)."""

    centroids: "np.ndarray"
