"""Product quantization: NumPy differential oracles for encode/ADC/search,
expr-vs-gemm tier parity, rerank exactness, save/load, IVF-PQ composition."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from velesdb_spark.functions import pq as pqm


def _np_codes(X, codebooks):
    m, ksub, dsub = codebooks.shape
    out = np.empty((X.shape[0], m), dtype=int)
    for j in range(m):
        sub = X[:, j * dsub:(j + 1) * dsub]
        d = ((sub[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
        out[:, j] = d.argmin(axis=1)
    return out


def _np_adc(codes, codebooks, q):
    table = pqm.adc_table(codebooks, q)
    return table[np.arange(table.shape[0]), codes].sum(axis=1)


@pytest.fixture(scope="module")
def pq_data(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(120, 16)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "id bigint, embedding array<double>")
    return df, X


def test_sample_codebooks_and_codes_match_numpy(pq_data):
    df, X = pq_data
    idx = pqm.PqIndex(df, id_col="id", m=4, ksub=8, init="sample")
    # sampled-points init: codebook j = sub-slices of rows 0..7
    want_cb = np.stack([X[:8, j * 4:(j + 1) * 4] for j in range(4)])
    assert np.allclose(idx.codebooks, want_cb)
    got = {r["id"]: list(r["_codes"])
           for r in idx.codes.select("id", "_codes").collect()}
    want = _np_codes(X, want_cb)
    for i in range(len(X)):
        assert got[i] == list(want[i])


def test_kmeans_codebooks_deterministic(pq_data):
    df, _ = pq_data
    a = pqm.PqIndex(df, id_col="id", m=4, ksub=4, init="kmeans", seed=3)
    b = pqm.PqIndex(df, id_col="id", m=4, ksub=4, init="kmeans", seed=3)
    assert np.allclose(a.codebooks, b.codebooks)


def test_adc_search_matches_numpy(pq_data):
    df, X = pq_data
    idx = pqm.PqIndex(df, id_col="id", m=4, ksub=8, init="sample")
    q = [0.3] * 16
    got = [(r["id"], r["adc_dist"]) for r in idx.search(q, k=7).collect()]
    codes = _np_codes(X, idx.codebooks)
    adc = _np_adc(codes, idx.codebooks, q)
    order = sorted(range(len(X)), key=lambda i: (adc[i], i))[:7]
    assert [g[0] for g in got] == order
    for (gid, gd), i in zip(got, order):
        assert gd == pytest.approx(round(adc[i], 6), abs=1e-9)


def test_expr_vs_gemm_tier_parity(pq_data, spark):
    df, X = pq_data
    cb = pqm.train_codebooks_sample(df, "embedding", "id", 16, 4, 8)
    small = df.select("id", pqm._encode_expr(F.col("embedding"), cb)
                      .alias("_codes"))
    big = df.select("id", pqm._encode_gemm(F.col("embedding"), cb)
                    .alias("_codes"))
    a = {r["id"]: list(r["_codes"]) for r in small.collect()}
    b = {r["id"]: list(r["_codes"]) for r in big.collect()}
    assert a == b
    table = pqm.adc_table(cb, [0.1] * 16)
    da = {r["id"]: r["d"] for r in small.select(
        "id", pqm._adc_expr(F.col("_codes"), table).alias("d")).collect()}
    db = {r["id"]: r["d"] for r in small.select(
        "id", pqm._adc_gemm(F.col("_codes"), table).alias("d")).collect()}
    for i in da:
        assert da[i] == pytest.approx(db[i], rel=1e-12)


def test_rerank_full_equals_exact_knn(pq_data):
    df, X = pq_data
    idx = pqm.PqIndex(df, id_col="id", m=4, ksub=8, init="sample")
    q = list(X[5] + 0.01)
    got = [r["id"] for r in idx.search(q, k=5, rerank=len(X)).collect()]
    qa = np.asarray(q)
    cos = (X @ qa) / (np.linalg.norm(X, axis=1) * np.linalg.norm(qa))
    want = sorted(range(len(X)), key=lambda i: (-cos[i], i))[:5]
    assert got == want


def test_reconstruct_decodes_codewords(pq_data):
    df, X = pq_data
    idx = pqm.PqIndex(df, id_col="id", m=4, ksub=8, init="sample")
    rec = {r["id"]: np.asarray(r["approx"])
           for r in idx.reconstruct().collect()}
    codes = _np_codes(X, idx.codebooks)
    for i in (0, 17, 63):
        want = np.concatenate([idx.codebooks[j][codes[i, j]]
                               for j in range(4)])
        assert np.allclose(rec[i], want)
    # quantization error strictly below trivial (zero-vector) baseline
    err = np.mean([((rec[i] - X[i]) ** 2).sum() for i in range(len(X))])
    base = np.mean([(X[i] ** 2).sum() for i in range(len(X))])
    assert err < base


def test_save_load_roundtrip(pq_data, tmp_path):
    df, _ = pq_data
    idx = pqm.PqIndex(df, id_col="id", m=4, ksub=8, init="sample")
    p = str(tmp_path / "pq")
    idx.save(p)
    loaded = pqm.PqIndex.load(df.sparkSession, p)
    q = [0.2] * 16
    a = [(r["id"], r["adc_dist"]) for r in idx.search(q, k=6).collect()]
    b = [(r["id"], r["adc_dist"]) for r in loaded.search(q, k=6).collect()]
    assert a == b


def test_compression_ratio():
    cb = np.zeros((8, 16, 8))
    idx = pqm.PqIndex.__new__(pqm.PqIndex)
    idx.codebooks = cb
    idx.dim = 64
    # 64 floats (256 B) → 8 byte-codes: 32×
    assert idx.compression_ratio == 32.0


def test_ivfpq_full_probe_equals_pq(pq_data):
    df, X = pq_data
    cb = pqm.train_codebooks_sample(df, "embedding", "id", 16, 4, 8)
    coarse = X[:4]
    ivfpq = pqm.IvfPqIndex(df, id_col="id", m=4, ksub=8,
                           coarse_centroids=coarse, codebooks=cb)
    pq = pqm.PqIndex(df, id_col="id", m=4, ksub=8, codebooks=cb)
    q = [0.15] * 16
    a = [(r["id"], r["adc_dist"])
         for r in ivfpq.search(q, k=8, nprobe=4).collect()]
    b = [(r["id"], r["adc_dist"]) for r in pq.search(q, k=8).collect()]
    assert a == b


def test_ivfpq_partial_probe_matches_numpy(pq_data):
    df, X = pq_data
    cb = pqm.train_codebooks_sample(df, "embedding", "id", 16, 4, 8)
    coarse = X[:4]
    ivfpq = pqm.IvfPqIndex(df, id_col="id", m=4, ksub=8,
                           coarse_centroids=coarse, codebooks=cb)
    q = [0.15] * 16
    qa = np.asarray(q)
    d = np.linalg.norm(coarse - qa, axis=1)
    lists = list(np.argsort(d, kind="stable")[:2])
    assign = ((X[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2) \
        .argmin(axis=1)
    keep = [i for i in range(len(X)) if assign[i] in lists]
    codes = _np_codes(X, cb)
    adc = _np_adc(codes, cb, q)
    want = sorted(keep, key=lambda i: (adc[i], i))[:5]
    got = [r["id"] for r in ivfpq.search(q, k=5, nprobe=2).collect()]
    assert got == want


def test_ivfpq_save_load_roundtrip(pq_data, tmp_path):
    import numpy as np

    df, X = pq_data
    cb = pqm.train_codebooks_sample(df, "embedding", "id", 16, 4, 8)
    idx = pqm.IvfPqIndex(df, id_col="id", m=4, ksub=8,
                         coarse_centroids=X[:4], codebooks=cb)
    p = str(tmp_path / "ivfpq")
    idx.save(p)
    loaded = pqm.IvfPqIndex.load(df.sparkSession, p)
    q = [0.25] * 16
    a = [(r["id"], r["adc_dist"])
         for r in idx.search(q, k=6, nprobe=2).collect()]
    b = [(r["id"], r["adc_dist"])
         for r in loaded.search(q, k=6, nprobe=2).collect()]
    assert a == b


def test_residual_ivfpq_matches_numpy(pq_data):
    df, X = pq_data
    coarse = X[:4]
    idx = pqm.IvfPqIndex(df, id_col="id", m=4, ksub=8, init="sample",
                         coarse_centroids=coarse, residual=True)
    # sampled-points residual codebooks: residuals of rows 0..7
    assign = ((X[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2) \
        .argmin(axis=1)
    res = X - coarse[assign]
    want_cb = np.stack([res[:8, j * 4:(j + 1) * 4] for j in range(4)])
    assert np.allclose(idx.pq.codebooks, want_cb)
    got = {r["id"]: (r["_list"], list(r["_codes"]))
           for r in idx.codes.collect()}
    want_codes = _np_codes(res, want_cb)
    for i in range(len(X)):
        assert got[i] == (assign[i], list(want_codes[i]))

    q = [0.2] * 16
    qa = np.asarray(q)
    d = np.linalg.norm(coarse - qa, axis=1)
    lists = list(np.argsort(d, kind="stable")[:2])
    keep = [i for i in range(len(X)) if assign[i] in lists]
    adc = np.array([
        pqm.adc_table(want_cb, qa - coarse[assign[i]])[
            np.arange(4), want_codes[i]].sum()
        for i in range(len(X))])
    want = sorted(keep, key=lambda i: (adc[i], i))[:6]
    got_ids = [r["id"] for r in idx.search(q, k=6, nprobe=2).collect()]
    assert got_ids == want


def test_residual_encoding_reduces_quantization_error(spark):
    """On clustered data the residual has less variance than the raw
    vector, so residual codes reconstruct tighter — measured as mean
    ADC error of each point against ITSELF as the query (0 would be
    lossless)."""
    rng = np.random.default_rng(3)
    centers = rng.normal(scale=8.0, size=(4, 16))
    X = np.vstack([c + rng.normal(scale=0.5, size=(30, 16))
                   for c in centers])
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "id bigint, embedding array<double>")
    raw = pqm.IvfPqIndex(df, id_col="id", m=4, ksub=8, init="kmeans",
                         coarse_centroids=centers, residual=False)
    resi = pqm.IvfPqIndex(df, id_col="id", m=4, ksub=8, init="kmeans",
                          coarse_centroids=centers, residual=True)

    def self_adc_error(idx):
        codes = {r["id"]: (r["_list"], np.array(r["_codes"]))
                 for r in idx.codes.collect()}
        errs = []
        for i in range(len(X)):
            lst, c = codes[i]
            qres = X[i] - (centers[lst] if idx.residual else 0.0)
            t = pqm.adc_table(idx.pq.codebooks, qres)
            errs.append(t[np.arange(4), c].sum())
        return float(np.mean(errs))

    assert self_adc_error(resi) < self_adc_error(raw)
