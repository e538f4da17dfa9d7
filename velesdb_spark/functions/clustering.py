"""Distributed Lloyd k-means — the iterative-clustering primitive a
training-data pipeline uses for corpus stratification (cluster-balanced
sampling, dedup-by-cluster-representative) and that IVF-style vector
indexes use to train their coarse quantizer.

100 TB shape per iteration: the k centroids travel INTO the plan as
literals (no join, no broadcast exchange — the assignment is a pure map
with whole-stage codegen), and the update is ONE map-side-combinable
groupBy over k groups carrying (sum per feature, count). Driver state is
k rows per round. This is the textbook scalable k-means loop: cost is
iterations × one pass, shuffle payload is k × |features| doubles.

Determinism/exactness contract (what the oracle gate relies on): with
integer-valued feature columns, partial sums are exact in double (no
merge-order sensitivity below 2^53), so centroid means are ONE correctly
rounded IEEE division — bit-identical in any engine evaluating the same
expression; squared distances are evaluated in the same literal order
``((x−cx)·(x−cx)) + ((y−cy)·(y−cy)) + …``; ties on distance break to the
smallest cluster id; an emptied cluster keeps its previous centroid.

Reference anchor: the reference trains IVF coarse centroids natively
(index/ivf); this is the distributed analogue (SURVEY §2.8 headroom).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_clusters(points: DataFrame, centroids: Sequence[tuple],
                    feature_cols: Sequence[str],
                    out_col: str = "cluster") -> DataFrame:
    """Nearest-centroid assignment as a PURE MAP: centroids are literals,
    array_min over (distance, cid) structs picks the argmin with
    smallest-cid tie-break. ``centroids`` is [(cid, [coords...]), ...]."""
    structs = []
    for cid, coords in centroids:
        dist = None
        for col, c in zip(feature_cols, coords):
            term = (F.col(col) - F.lit(float(c))) * \
                (F.col(col) - F.lit(float(c)))
            dist = term if dist is None else dist + term
        structs.append(F.struct(dist.alias("d"),
                                F.lit(int(cid)).alias("cid")))
    return points.withColumn(out_col, F.array_min(F.array(*structs))["cid"])


def lloyd_kmeans(df: DataFrame, feature_cols: Sequence[str], k: int = 6,
                 iterations: int = 3, id_col: str = "doc_id"):
    """Run ``iterations`` Lloyd rounds; returns (centroids, summary).

    - init: the k rows with the smallest ``id_col`` (deterministic, no
      RNG — reproducible across engines and runs).
    - round t: assign under c_{t-1} (map), recompute c_t as per-cluster
      feature means (one combinable groupBy); empty cluster keeps c_{t-1}.
    - ``centroids``: final [(cid, [coords...]), ...] (c_T).
    - ``summary``: k-row DataFrame (cluster, n, <feature> means) — n from
      the LAST assignment, coords from c_T; built driver-side from the
      k-row aggregate (the heavy work stayed distributed).
    """
    if k < 1 or iterations < 1:
        raise ValueError("k and iterations must be >= 1")
    pts = df.select(
        id_col, *[F.col(c).cast("double").alias(c) for c in feature_cols])
    init = pts.orderBy(id_col).limit(k).collect()
    if len(init) < k:
        raise ValueError(f"need at least k={k} points, got {len(init)}")
    cents = [(i, [float(r[c]) for c in feature_cols])
             for i, r in enumerate(init)]
    counts: dict = {}
    for _ in range(iterations):
        assigned = assign_clusters(pts, cents, feature_cols, "_c")
        rows = (assigned.groupBy("_c")
                .agg(*[F.avg(c).alias(c) for c in feature_cols],
                     F.count("*").alias("n")).collect())
        by_cid = {int(r["_c"]): r for r in rows}
        counts = {cid: int(by_cid[cid]["n"]) if cid in by_cid else 0
                  for cid, _ in cents}
        cents = [(cid, [float(by_cid[cid][c]) for c in feature_cols])
                 if cid in by_cid else (cid, coords)
                 for cid, coords in cents]
    spark = df.sparkSession
    schema = ", ".join(["cluster long", "n long"]
                       + [f"{c} double" for c in feature_cols])
    summary = spark.createDataFrame(
        [(cid, counts[cid], *coords) for cid, coords in cents], schema)
    return cents, summary
