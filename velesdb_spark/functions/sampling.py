"""Deterministic weighted sampling — reproducible quality-weighted
corpus subsets (training-mix construction) with NO RNG state.

Weighted reservoir sampling (Efraimidis–Spirakis A-ES) ranks rows by
u^(1/w); the float pow makes cross-engine reproducibility fragile (pow
and ln differ in final ulps across math libraries, which can flip
near-tied ranks). This module uses the pow-free DISCRETE equivalent:

    key(row) = max_{j=1..w} md5(seed ':' id ':' j)

The overall maximum over all (row, j) draws is uniform over the Σw
draws, so P(row wins the top spot) = w_row / Σw — exactly the A-ES
first pick — and taking the top-k orders rows by successive weighted
maxima (sampling without replacement). Keys are distinct md5 hex
strings compared lexicographically (fixed-length lowercase hex ⇒
lexicographic = numeric), so ties are impossible and ANY engine that
can md5 reproduces the ranking bit-for-bit.

Cost is Σw hash evaluations (JVM-side, whole-stage codegen) — right
for integer weights like capped token counts. At extreme weights,
quantize via ``cap`` (default 64): sampling proportions follow the
capped weights, which is usually the intent anyway (a 1M-token doc
should not be 20 000× likelier than a 50-token one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def weighted_key(id_col: Column, weight: Column, seed: str = "ws",
                 cap: int = 64) -> Column:
    """The max-of-w-hashes ranking key (hex string, higher = earlier)."""
    w = F.greatest(F.lit(1), F.least(weight.cast("long"), F.lit(int(cap))))
    return F.array_max(F.transform(
        F.sequence(F.lit(1), w),
        lambda j: F.md5(F.concat(F.lit(f"{seed}:"),
                                 id_col.cast("string"),
                                 F.lit(":"), j.cast("string")))))


def weighted_sample_topk(df: DataFrame, k: int, weight_col: str,
                         id_col: str = "id", seed: str = "ws",
                         cap: int = 64) -> DataFrame:
    """Top-k weighted sample: rows + their ranking key, highest first —
    deterministic for a given seed, reproducible in any md5-capable
    engine, TakeOrderedAndProject physical plan (no full sort)."""
    key = weighted_key(F.col(id_col), F.col(weight_col), seed, cap)
    return (df.withColumn("_wkey", key)
            .orderBy(F.desc("_wkey"), F.asc(id_col))
            .limit(int(k)))


def shuffle_key(id_col: Column, seed: str = "epoch0") -> Column:
    """Per-epoch pseudo-random order key: md5-derived 60-bit BIGINT of
    seed:id — engine-reproducible (DuckDB:
    CAST(('0x' || substr(md5(seed || ':' || id), 1, 15)) AS BIGINT))."""
    return F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))),
        1, 15), 16, 10).cast("bigint")


def epoch_shuffle(df: DataFrame, seed: str = "epoch0",
                  id_col: str = "id",
                  partitions: int | None = None) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    1-based global position in the order (shuffle_key, id) — a fresh
    pseudo-random permutation per seed ("epoch0", "epoch1", …), the
    standard per-epoch corpus shuffle before sequence packing.

    100 TB design: a naive ROW_NUMBER() OVER (ORDER BY key) is a
    single-partition sort. Here the position is assembled scalably:
    range-repartition on (key, id) — Spark's sampled range exchange —
    then ONE tiny per-partition-count aggregate builds broadcast prefix
    offsets, and each partition numbers its own rows with a window
    PARTITIONED BY partition id (parallel, no global exchange). The
    repartitioned input is eagerly localCheckpoint-ed so the counts job
    and the numbering job see identical partition assignment (range
    boundaries are sampled, so an uncheckpointed lineage could re-draw
    them between jobs and mis-offset every position).

    Positions are exact and deterministic: 1..N, each exactly once,
    independent of the (nondeterministic) range boundaries."""
    spark = df.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions",
                                        "200"))
    keyed = df.withColumn("_k", shuffle_key(F.col(id_col), seed))
    part = keyed.repartitionByRange(int(partitions), "_k", id_col) \
        .withColumn("_pid", F.spark_partition_id()) \
        .localCheckpoint(eager=True)
    counts = {r["_pid"]: r["n"] for r in
              part.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        "_pid int, _off long")
    from pyspark.sql import Window
    w = Window.partitionBy("_pid").orderBy("_k", id_col)
    return (part.join(F.broadcast(off_df), "_pid")
            .withColumn("pos", F.row_number().over(w) + F.col("_off"))
            .drop("_pid", "_off", "_k"))


def cap_per_group(df: DataFrame, group_col: str, k: int,
                  id_col: str = "id", seed: str = "cap",
                  salt_buckets: int = 32) -> DataFrame:
    """Keep at most ``k`` rows per group — the k smallest by
    (md5(seed:id), id) — the standard per-domain document cap in crawl
    curation (bound any one domain's share of the corpus),
    deterministic and engine-reproducible (DuckDB: QUALIFY
    ROW_NUMBER() OVER (PARTITION BY g ORDER BY md5(...), id) <= k).

    100 TB design: the textbook single window PARTITION BY group is one
    shuffle keyed on the group — and a crawl's biggest domain can be
    10^9 rows landing on one reducer. Two-phase instead: phase 1
    shuffles on (group, salt) where salt = md5-bucket(id) % S, and caps
    each salted cell to its k smallest — a superset of the global k
    smallest, since each global survivor is also among the smallest k
    of its own cell. Phase 2 re-windows over the ≤ k·S survivors per
    group, which is bounded regardless of the original group size. The
    extra exchange touches only phase-1 survivors."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    salt = (F.conv(F.substring(
        F.md5(F.concat(F.lit("salt:"), F.col(id_col).cast("string"))),
        1, 6), 16, 10).cast("long") % int(salt_buckets))
    staged = df.withColumn("_ckey", key).withColumn("_salt", salt)
    w1 = Window.partitionBy(group_col, "_salt").orderBy("_ckey", id_col)
    local = (staged.withColumn("_rn", F.row_number().over(w1))
             .filter(F.col("_rn") <= int(k)).drop("_rn", "_salt"))
    w2 = Window.partitionBy(group_col).orderBy("_ckey", id_col)
    return (local.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= int(k)).drop("_rn", "_ckey"))


def percentile_prune(df: DataFrame, score_col: str, stratum_col: str,
                     keep_frac: float = 0.75, id_col: str = "id",
                     accuracy: int = 10000,
                     seed: str = "prune") -> DataFrame:
    """Keep approximately the top ``keep_frac`` of rows per stratum by
    score — quality-threshold corpus pruning ("drop the worst quartile
    of each language").

    100 TB design: the exact spelling is percent_rank() OVER (PARTITION
    BY stratum ORDER BY score) — a full-corpus shuffle keyed on the
    stratum, and the largest stratum (half the web is English) lands on
    one reducer. Here the per-stratum cut is a percentile_approx
    threshold: ONE map-combinable aggregate with bounded sketch state
    reduces the corpus to |strata| rows, which broadcast back over a
    map-only filter — no row ever shuffles.

    Heuristic quality scores are tie-heavy (composites of a few binary
    indicators), and a cut landing on a tie value would keep all or
    none of that mass; the ranking key therefore adds a deterministic
    md5 jitter (< 1e-5, far below any real score quantum) so ties split
    uniformly and the kept fraction tracks ``keep_frac`` to within the
    sketch error."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError("keep_frac must be in (0, 1]")
    jitter = (F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
        1, 6), 16, 10).cast("double") / F.lit(1e12))
    # NB (round 10): if score_col is a derived text-quality expression,
    # compute it AFTER a spread()/repartition at the call site — a
    # projection attached to a single-file scan runs on the file's 1-2
    # splits, below any exchange this operator could add (quality_prune
    # gate: 15.6 s → 2 s at sf1 from spreading before withColumn)
    keyed = df.withColumn("_pkey",
                          F.col(score_col).cast("double") + jitter)
    thr = (keyed.groupBy(stratum_col)
           .agg(F.expr(f"percentile_approx(_pkey, {1.0 - keep_frac!r}, "
                       f"{int(accuracy)})").alias("_thr")))
    return (keyed.join(F.broadcast(thr), stratum_col)
            .filter(F.col("_pkey") >= F.col("_thr"))
            .drop("_pkey", "_thr"))
