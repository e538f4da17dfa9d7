"""Bloom filter (cache/bloom.rs parity): sizing formulas, no false
negatives, FPR estimate, distributed-vs-driver build equivalence, and the
collection fast-negative get path."""

import math

import pytest
from pyspark.sql import functions as F

from velesdb_spark.functions import bloom as B


def test_optimal_sizing_formulas():
    # m = -n ln p / (ln 2)^2 ; k = m/n ln 2
    n, p = 1000, 0.01
    m = B.BloomFilter.optimal_bits(n, p)
    assert m == math.ceil(-n * math.log(p) / (math.log(2) ** 2))
    k = B.BloomFilter.optimal_hashes(m, n)
    assert k == round(m / n * math.log(2))
    bf = B.BloomFilter(n, p)
    assert bf.num_bits == m and bf.num_hashes == k


def test_no_false_negatives_and_low_fpr():
    bf = B.BloomFilter(500, 0.01)
    for i in range(500):
        bf.insert(i)
    assert bf.count() == 500
    assert all(bf.contains(i) for i in range(500))     # never false-negative
    false_pos = sum(bf.contains(i) for i in range(10_000, 12_000))
    assert false_pos / 2000 < 0.05                     # ~1% target, slack 5×
    assert 0.0 < bf.estimated_fpr() < 0.05
    bf.clear()
    assert bf.count() == 0 and not bf.contains(0)
    assert bf.estimated_fpr() == 0.0


def test_definitely_not_contains_and_with_params():
    bf = B.BloomFilter.with_params(1024, 3)
    assert bf.num_bits == 1024 and bf.num_hashes == 3
    bf.insert("hello")
    assert bf.contains("hello")
    assert not bf.definitely_not_contains("hello")


def test_distributed_build_matches_driver_build(spark):
    """build_bloom_df must produce the exact same bitset as row-by-row
    driver inserts — same sha1 position derivation on both paths."""
    ids = list(range(300))
    df = spark.createDataFrame([(i,) for i in ids], "id bigint")
    dist = B.build_bloom_df(df, "id", false_positive_rate=0.01)
    drv = B.BloomFilter(300, 0.01)
    for i in ids:
        drv.insert(i)
    assert (dist._words == drv._words).all()
    assert dist.count() == 300
    assert all(dist.contains(i) for i in ids)


def test_collection_bloom_fast_negative(spark):
    from velesdb_spark.database import Collection

    df = spark.createDataFrame([(i, f"t{i}") for i in range(100)],
                               "id bigint, tag string")
    col = Collection(spark, "c", df=df).build_id_bloom()
    assert col.get(5)["tag"] == "t5"

    # a definite miss answers without starting any Spark job
    missing = next(i for i in range(10_000, 20_000)
                   if col._id_bloom.definitely_not_contains(i))
    sc = spark.sparkContext
    group = "bloom-negative-check"
    sc.setJobGroup(group, "")
    try:
        assert col.get(missing) is None
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setJobGroup("", "")
    assert jobs == []

    # dict upserts extend the bloom (no false negative on new ids) ...
    col.upsert([{"id": 777_777, "tag": "new"}])
    assert col.get(777_777)["tag"] == "new"
    # ... DataFrame upserts invalidate it (ids unknown without a job)
    col.upsert(spark.createDataFrame([(888_888, "df")],
                                     "id bigint, tag string"))
    assert col._id_bloom is None
    assert col.get(888_888)["tag"] == "df"
