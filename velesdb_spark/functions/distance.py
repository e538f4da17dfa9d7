"""Distance metrics as native Spark Column expressions.

Reference semantics: crates/velesdb-core/src/distance.rs —
five metrics (Cosine, Euclidean, DotProduct, Hamming, Jaccard), with
``higher_is_better`` true for Cosine/Dot/Jaccard and false for
Euclidean/Hamming (distance.rs:76-81); result ordering and similarity-
threshold comparisons flip accordingly (distance.rs:95-103,
collection/search/query/mod.rs:396-416).

Implementation notes (scale): everything here is built-in array arithmetic
(``aggregate``/``zip_with``/higher-order functions), which runs inside the JVM
per-row with no shuffle and no Python serialization — it survives whole-stage
codegen boundaries and scales linearly with partitions. Computations are done
in DOUBLE precision regardless of the stored ARRAY<FLOAT> so scores are stable
across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

METRICS = ("cosine", "euclidean", "dot", "hamming", "jaccard")

# distance.rs:76-81
HIGHER_IS_BETTER = {
    "cosine": True,
    "dot": True,
    "jaccard": True,
    "euclidean": False,
    "hamming": False,
}


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


# --- one-shot SQL expression builders (driver latency, guide §5) --------
# The Python higher-order-function API (F.aggregate / F.zip_with with
# lambdas) constructs the expression tree object-by-object over py4j:
# one dim-64 cosine score is ~100 JVM round-trips, ~0.2 s of pure driver
# time per query construction at bench scale. Parsing the SAME tree from
# one SQL string is a single round-trip. The text spells exactly what the
# Column form builds (CAST, same lambda variable names, 0.0D double
# literals), so analyzed plans and values are identical — pinned by
# tests/test_vector.py::test_staged_score_sql_fastpath_identity.

_IDENT_RE = None


def _ident_sql(name: str) -> str | None:
    """Backtick-quoted SQL identifier, or None when the column name is
    not a plain identifier (those callers keep the Column builders)."""
    global _IDENT_RE
    if _IDENT_RE is None:
        import re

        _IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    return f"`{name}`" if _IDENT_RE.match(name) else None


def _vec_double_sql(vcol_sql: str) -> str:
    return f"transform({vcol_sql}, x -> CAST(x AS DOUBLE))"


def _dot_sql(vcol_sql: str, arr_sql: str) -> str:
    return (f"aggregate(zip_with({_vec_double_sql(vcol_sql)}, {arr_sql}, "
            f"(x, y) -> x * y), 0.0D, (acc, x) -> acc + x)")


def _norm2_sql(vcol_sql: str) -> str:
    return (f"aggregate({_vec_double_sql(vcol_sql)}, 0.0D, "
            f"(acc, x) -> acc + x * x)")


def _euclid2_sql(vcol_sql: str, arr_sql: str) -> str:
    return (f"aggregate(zip_with({_vec_double_sql(vcol_sql)}, {arr_sql}, "
            f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)")


def dot_product(a: Column, b: Column) -> Column:
    """Σ a_i·b_i via zip_with + aggregate (no UDF)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm (the reference
    returns 0 for degenerate inputs rather than NaN — distance.rs cosine)."""
    na, nb = norm(a), norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
        dot_product(a, b) / (na * nb)
    )


def euclidean_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def hamming_distance(a: Column, b: Column) -> Column:
    """Count of differing positions (vectors treated element-wise; the
    reference packs bits, semantics are the same count — distance.rs)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.when(x != y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("double")


def jaccard_similarity(a: Column, b: Column) -> Column:
    """Binary Jaccard over f32 vectors: element > 0 means 'set bit'
    (distance.rs jaccard on binarized vectors). 1.0 for two empty sets."""
    both = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.when((x > 0) & (y > 0), 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    either = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.when((x > 0) | (y > 0), 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.when(either == 0, F.lit(1.0)).otherwise(
        both.cast("double") / either.cast("double")
    )


def doc_norm2(vector_col: str) -> Column:
    """Σ x², the query-independent half of a cosine score — compute it
    ONCE per row and pass its column name to staged_score(norm2_col=...)
    when scoring the same rows against many queries (knn_batch)."""
    vsql = _ident_sql(vector_col)
    if vsql is not None:
        return F.expr(_norm2_sql(vsql))
    return F.aggregate(_as_double(F.col(vector_col)), F.lit(0.0),
                       lambda acc, x: acc + x * x)


def staged_score(df, vector_col: str, query, metric: str,
                 score_col: str = "score", norm2_col: str = None):
    """metric_score against a driver-side literal query, with every
    row-level array aggregate evaluated exactly once.

    The generic Column form re-evaluates the doc norm in both the
    zero-guard and the denominator, and re-casts the literal query per
    row — higher-order array functions are interpreted (not codegen'd),
    so each duplicate is a real per-row pass. Here the dot product and
    ||doc||² land in a first projection and the final arithmetic in a
    second (CollapseProject keeps multi-referenced non-cheap expressions
    staged), the query rides as ARRAY<DOUBLE> literals (no per-row cast),
    and the query norm folds to a plan-time constant — computed with the
    same left-fold f64 order as the aggregate, so scores are
    BIT-identical to metric_score (property-tested). ~35 % less per-row
    work for cosine at dim 64.
    """
    import math

    from velesdb_spark.functions.arraylit import (double_array_lit,
                                                  double_array_sql)

    metric = metric.lower()
    q = [float(x) for x in query]
    # one-shot SQL fast path (see the builders above): same tree, one
    # py4j round-trip instead of ~100 per aggregate
    vsql = _ident_sql(vector_col)
    asql = double_array_sql(q)
    fast = vsql is not None and asql is not None

    def _lit_q():
        return double_array_lit(q)

    if metric == "cosine":
        qn2 = 0.0
        for x in q:
            qn2 += x * x
        qn = math.sqrt(qn2)
        if qn == 0.0:
            return df.withColumn(score_col, F.lit(0.0))
        if fast:
            dot = F.expr(_dot_sql(vsql, asql))
        else:
            dot = F.aggregate(
                F.zip_with(_as_double(F.col(vector_col)), _lit_q(),
                           lambda x, y: x * y),
                F.lit(0.0), lambda acc, x: acc + x)
        if norm2_col is None:
            n2 = (F.expr(_norm2_sql(vsql)) if fast
                  else F.aggregate(_as_double(F.col(vector_col)), F.lit(0.0),
                                   lambda acc, x: acc + x * x))
            staged = df.withColumns({"_dot": dot, "_n2": n2})
            n2name, drops = "_n2", ["_dot", "_n2"]
        else:
            # caller precomputed Σx² (doc_norm2) — reuse across queries
            staged = df.withColumn("_dot", dot)
            n2name, drops = norm2_col, ["_dot"]
        n2sql = _ident_sql(n2name)
        if n2sql is not None:
            # one-shot SQL final (guide §5): same CASE/SQRT tree; qn via
            # repr so the parsed double is bit-equal
            out = F.expr(f"CASE WHEN SQRT({n2sql}) = 0.0D THEN 0.0D "
                         f"ELSE `_dot` / (SQRT({n2sql}) * {qn!r}D) END")
        else:
            n2ref = F.col(n2name)
            out = F.when(F.sqrt(n2ref) == 0.0, F.lit(0.0)).otherwise(
                F.col("_dot") / (F.sqrt(n2ref) * F.lit(qn)))
        return staged.withColumn(score_col, out).drop(*drops)
    if metric in ("dot", "dotproduct", "dot_product"):
        if fast:
            return df.withColumn(score_col, F.expr(_dot_sql(vsql, asql)))
        dot = F.aggregate(
            F.zip_with(_as_double(F.col(vector_col)), _lit_q(),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)
        return df.withColumn(score_col, dot)
    if metric in ("euclidean", "l2"):
        if fast:
            return df.withColumn(
                score_col, F.sqrt(F.expr(_euclid2_sql(vsql, asql))))
        d2 = F.aggregate(
            F.zip_with(_as_double(F.col(vector_col)), _lit_q(),
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)
        return df.withColumn(score_col, F.sqrt(d2))
    # hamming/jaccard compare raw elements — the generic form already
    # runs one aggregate per component with no casts
    return df.withColumn(
        score_col, metric_score(F.col(vector_col), _lit_q(), metric))


def staged_scores_batch(df, vector_col: str, queries, metric: str,
                        names, norm2_col: str = None):
    """Score the same rows against MANY literal query vectors with at
    most two eager-analyzed projections total.

    Dataset ops analyze eagerly, so the per-query staged_score loop paid
    2-3 analysis passes per query over a plan that grows by one
    dim-sized expression tree each time (quadratic in batch size at the
    driver). Here every query's row-level aggregate lands in ONE
    withColumns (one analysis), the final arithmetic in a second, and
    the helper columns drop in one call — scores are column-for-column
    identical to the staged_score loop (same expression trees).

    ``names[i]`` is the output score column for ``queries[i]``. For
    cosine, pass ``norm2_col`` (a doc_norm2 column) so ‖doc‖² is shared
    across the batch exactly like the per-query path.
    """
    import math

    metric = metric.lower()
    qlists = [[float(x) for x in q] for q in queries]
    if metric == "cosine":
        if norm2_col is None:
            raise ValueError("staged_scores_batch(cosine) needs norm2_col")
        n2sql = _ident_sql(norm2_col)
        dots, finals, drops = {}, {}, []
        for name, q in zip(names, qlists):
            qn = math.sqrt(sum(x * x for x in q))
            if qn == 0.0:
                finals[name] = F.lit(0.0)
                continue
            dcol = f"_dot{name}"
            drops.append(dcol)
            dots[dcol] = _literal_dot(vector_col, q)
            dsql = _ident_sql(dcol)
            if n2sql is not None and dsql is not None:
                # one-shot SQL (guide §5): same CASE/SQRT tree, one parse;
                # qn spelled with repr so the parsed double is bit-equal
                finals[name] = F.expr(
                    f"CASE WHEN SQRT({n2sql}) = 0.0D THEN 0.0D "
                    f"ELSE {dsql} / (SQRT({n2sql}) * {qn!r}D) END")
            else:
                finals[name] = F.when(
                    F.sqrt(F.col(norm2_col)) == 0.0, F.lit(0.0)).otherwise(
                    F.col(dcol) / (F.sqrt(F.col(norm2_col)) * F.lit(qn)))
        out = df.withColumns(dots) if dots else df
        return out.withColumns(finals).drop(*drops)
    if metric in ("dot", "dotproduct", "dot_product"):
        return df.withColumns({
            name: _literal_dot(vector_col, q)
            for name, q in zip(names, qlists)})
    if metric in ("euclidean", "l2"):
        return df.withColumns({
            name: F.sqrt(_literal_euclid2(vector_col, q))
            for name, q in zip(names, qlists)})
    from velesdb_spark.functions.arraylit import double_array_lit

    return df.withColumns({
        name: metric_score(F.col(vector_col), double_array_lit(q), metric)
        for name, q in zip(names, qlists)})


def _literal_dot(vector_col: str, q) -> Column:
    """Σ vec_i·q_i against a literal query (fast path when expressible
    as one SQL string, Column HOFs otherwise)."""
    from velesdb_spark.functions.arraylit import (double_array_lit,
                                                  double_array_sql)

    vsql, asql = _ident_sql(vector_col), double_array_sql(q)
    if vsql is not None and asql is not None:
        return F.expr(_dot_sql(vsql, asql))
    return F.aggregate(
        F.zip_with(_as_double(F.col(vector_col)), double_array_lit(q),
                   lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)


def _literal_euclid2(vector_col: str, q) -> Column:
    from velesdb_spark.functions.arraylit import (double_array_lit,
                                                  double_array_sql)

    vsql, asql = _ident_sql(vector_col), double_array_sql(q)
    if vsql is not None and asql is not None:
        return F.expr(_euclid2_sql(vsql, asql))
    return F.aggregate(
        F.zip_with(_as_double(F.col(vector_col)), double_array_lit(q),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)


def metric_score(a: Column, b: Column, metric: str) -> Column:
    """Score column for any of the five metrics (distance.rs:64-72)."""
    metric = metric.lower()
    if metric == "cosine":
        return cosine_similarity(a, b)
    if metric in ("dot", "dotproduct", "dot_product"):
        return dot_product(a, b)
    if metric in ("euclidean", "l2"):
        return euclidean_distance(a, b)
    if metric == "hamming":
        return hamming_distance(a, b)
    if metric == "jaccard":
        return jaccard_similarity(a, b)
    raise ValueError(f"unknown metric: {metric}")


def higher_is_better(metric: str) -> bool:
    metric = metric.lower()
    if metric in ("dotproduct", "dot_product"):
        metric = "dot"
    if metric == "l2":
        metric = "euclidean"
    if metric not in HIGHER_IS_BETTER:
        raise ValueError(f"unknown metric: {metric}")
    return HIGHER_IS_BETTER[metric]


def score_order(score: Column, metric: str) -> Column:
    """Sort expression with the metric's natural 'best first' direction
    (distance.rs:95-103)."""
    return score.desc() if higher_is_better(metric) else score.asc()


def similarity_passes(score: Column, op: str, threshold: float, metric: str) -> Column:
    """similarity(field, $v) op t — for distance metrics the comparison is
    inverted (query/mod.rs:396-416): 'similarity > t' means 'distance < t'
    never literally; the reference flips > and < for lower-is-better metrics.
    """
    if not higher_is_better(metric):
        flip = {">": "<", ">=": "<=", "<": ">", "<=": ">="}
        op = flip.get(op, op)
    if op == ">":
        return score > threshold
    if op == ">=":
        return score >= threshold
    if op == "<":
        return score < threshold
    if op == "<=":
        return score <= threshold
    # Eq/NotEq use epsilon 0.001 in the reference (query/mod.rs:404-405)
    if op == "=":
        return F.abs(score - threshold) < 0.001
    if op in ("!=", "<>"):
        return F.abs(score - threshold) >= 0.001
    raise ValueError(f"unknown comparison operator: {op}")
