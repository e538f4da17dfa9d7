"""Loader for the driver's testdata parquet tables.

The fixtures store their timestamp columns as native TIMESTAMP(MICROS)
(pyarrow-verified at every sf), which Spark reads directly as
TimestampType. A defensive bigint branch remains for a hypothetical
INT64-nanos encoding: it converts via integer ns→us division so SQL
semantics (and DuckDB comparisons) line up; no session config is touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from velesdb_spark.velesql.translator import Catalog

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# timestamp columns per table (defensive re-typing if read as bigint)
_TS_COLS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}

# Catalog config for the non-relational tables
_TABLE_CFG = {
    "embeddings": dict(vector_col="embedding", id_col="vec_id", dim=64),
    "documents": dict(id_col="doc_id", text_col="text"),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _TS_COLS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer division: float division loses precision (ns epoch
            # ~1.7e18 exceeds double's 2^53 exact range) and truncation
            # matches DuckDB's ns→us behavior exactly
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    # partial fixture dirs are legal (e.g. a documents-only corpus from
    # gen_testdata --tables); absent tables simply aren't registered and
    # resolve() raises "unknown table" if a query asks for one
    import os

    return {t: load_table(spark, sf_dir, t) for t in TABLES
            if os.path.exists(f"{sf_dir}/{t}.parquet")}


def make_catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    cat = Catalog()
    for t, df in load_tables(spark, sf_dir).items():
        cat.register(t, df, **_TABLE_CFG.get(t, {}))
    return cat
