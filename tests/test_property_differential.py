"""Property-based differential testing (reference fuzz parity, SURVEY §5:
fuzz_velesql_parser / fuzz_distance_metrics): generate random VelesQL WHERE
trees over the orders fixture, run through parser → translator → Spark AND
the same text through DuckDB, assert identical row sets.

Bounded example counts keep the suite fast; derandomized for CI stability.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR
from velesdb_spark.velesql.translator import translate

# --- predicate grammar over orders columns --------------------------------

_NUM_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
_STR_COLS = ["o_orderstatus", "o_orderpriority"]


def _num_pred(draw):
    col = draw(st.sampled_from(_NUM_COLS))
    op = draw(st.sampled_from([">", ">=", "<", "<=", "=", "!="]))
    val = draw(st.integers(min_value=0, max_value=300000))
    return f"{col} {op} {val}"


def _str_pred(draw):
    col = draw(st.sampled_from(_STR_COLS))
    kind = draw(st.integers(min_value=0, max_value=3))
    if kind == 0:
        v = draw(st.sampled_from(["F", "O", "P", "1-URGENT", "5-LOW", "zzz"]))
        op = draw(st.sampled_from(["=", "!="]))
        return f"{col} {op} '{v}'"
    if kind == 1:
        return f"{col} IN ('F', 'O')"
    if kind == 2:
        pat = draw(st.sampled_from(["%URG%", "%LOW", "%-%", "_-____%"]))
        return f"{col} LIKE '{pat}'"
    return f"{col} IS NOT NULL"


@st.composite
def predicate(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        leaf = draw(st.booleans())
        return _num_pred(draw) if leaf else _str_pred(draw)
    a = draw(predicate(depth=depth + 1))
    b = draw(predicate(depth=depth + 1))
    combo = draw(st.sampled_from(["AND", "OR"]))
    neg = draw(st.booleans())
    expr = f"({a} {combo} {b})"
    return f"NOT {expr}" if neg else expr


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    return con


@settings(max_examples=60, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_where_tree_differential(data, catalog, oracle_con):
    pred = data.draw(predicate())
    sql = (f"SELECT o_orderkey FROM orders WHERE {pred} "
           f"ORDER BY o_orderkey LIMIT 500")
    got = [r.o_orderkey for r in translate(sql, catalog).collect()]
    want = [r[0] for r in oracle_con.execute(sql).fetchall()]
    assert got == want, f"predicate: {pred}"


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_between_and_numeric_bounds(data, catalog, oracle_con):
    lo = data.draw(st.integers(min_value=0, max_value=200000))
    hi = lo + data.draw(st.integers(min_value=0, max_value=150000))
    sql = (f"SELECT o_orderkey FROM orders WHERE o_totalprice BETWEEN {lo} AND {hi} "
           f"ORDER BY o_orderkey LIMIT 500")
    got = [r.o_orderkey for r in translate(sql, catalog).collect()]
    want = [r[0] for r in oracle_con.execute(sql).fetchall()]
    assert got == want


@settings(max_examples=25, deadline=None, derandomize=True)
@given(data=st.data())
def test_distance_metrics_vs_numpy(data, spark):
    """fuzz_distance_metrics parity: random vectors, all five metrics."""
    import math as m

    import numpy as np
    from pyspark.sql import functions as F

    from velesdb_spark.functions.distance import metric_score

    dim = data.draw(st.integers(min_value=1, max_value=16))
    fl = st.floats(min_value=-10, max_value=10, allow_nan=False,
                   allow_infinity=False, width=32)
    a = data.draw(st.lists(fl, min_size=dim, max_size=dim))
    b = data.draw(st.lists(fl, min_size=dim, max_size=dim))
    df = spark.createDataFrame([(1, a, b)], "id bigint, a array<float>, b array<float>")
    row = df.select(*[
        metric_score(F.col("a"), F.col("b"), mt).alias(mt)
        for mt in ["cosine", "euclidean", "dot", "hamming", "jaccard"]
    ]).collect()[0]

    na, nb = np.array(a, dtype=np.float32), np.array(b, dtype=np.float32)
    npa, npb = na.astype(float), nb.astype(float)
    dot = float(npa @ npb)
    norm = float(np.linalg.norm(npa) * np.linalg.norm(npb))
    want_cos = dot / norm if norm > 0 else 0.0
    assert m.isclose(row.cosine, want_cos, rel_tol=1e-6, abs_tol=1e-9)
    assert m.isclose(row.euclidean, float(np.linalg.norm(npa - npb)),
                     rel_tol=1e-6, abs_tol=1e-9)
    assert m.isclose(row.dot, dot, rel_tol=1e-6, abs_tol=1e-9)
    assert row.hamming == float((na != nb).sum())
    both = int(((na > 0) & (nb > 0)).sum())
    either = int(((na > 0) | (nb > 0)).sum())
    want_j = both / either if either else 1.0
    assert m.isclose(row.jaccard, want_j, rel_tol=1e-9)


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_groupby_having_differential(data, catalog, oracle_con):
    agg = data.draw(st.sampled_from(
        ["COUNT(*)", "SUM(o_totalprice)", "AVG(o_totalprice)",
         "MIN(o_orderkey)", "MAX(o_totalprice)"]))
    thr = data.draw(st.integers(min_value=1, max_value=2000))
    having_op = data.draw(st.sampled_from([">", "<", ">="]))
    sql = (f"SELECT o_orderpriority, COUNT(*) AS cnt FROM orders "
           f"GROUP BY o_orderpriority HAVING {agg} {having_op} {thr} "
           f"ORDER BY o_orderpriority")
    got = [(r.o_orderpriority, r.cnt) for r in translate(sql, catalog).collect()]
    want = oracle_con.execute(sql).fetchall()
    assert got == [tuple(w) for w in want], sql


@pytest.fixture(scope="module")
def oracle_con2():
    con = duckdb.connect()
    for t in ("nation", "supplier", "customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_join_types_differential(data, catalog, oracle_con2):
    """All four join types with random filters vs DuckDB."""
    how = data.draw(st.sampled_from(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]))
    thr = data.draw(st.integers(min_value=0, max_value=10000))
    side = data.draw(st.sampled_from(["n.n_regionkey < 3", f"s.s_acctbal > {thr}",
                                      "n.n_name LIKE 'A%'"]))
    sql = (f"SELECT n.n_name AS nation, s.s_name AS supp FROM nation AS n "
           f"{how} supplier AS s ON n.n_nationkey = s.s_nationkey "
           f"WHERE {side} ORDER BY nation, supp LIMIT 300")
    got = [(r.nation, r.supp) for r in translate(sql, catalog).collect()]
    # DuckDB doesn't accept AS before table alias in the same spots? it does.
    want = [tuple(r) for r in oracle_con2.execute(sql).fetchall()]
    assert got == want, sql


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_set_ops_differential(data, catalog, oracle_con2):
    op = data.draw(st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]))
    lo = data.draw(st.integers(min_value=0, max_value=20))
    sql = (f"SELECT c_nationkey FROM customer WHERE c_nationkey > {lo} "
           f"{op} SELECT s_nationkey FROM supplier")
    got = sorted(r[0] for r in translate(sql, catalog).collect())
    want = sorted(r[0] for r in oracle_con2.execute(sql).fetchall())
    assert got == want, sql


@settings(max_examples=20, deadline=None, derandomize=True)
@given(data=st.data())
def test_bfs_differential_random_graphs(data, spark):
    """Random digraphs: BFS must emit each reachable node once at minimum
    depth, excluding starts (traversal.rs/streaming.rs visited-set)."""
    from collections import deque

    from velesdb_spark.operators.graph import bfs

    n = data.draw(st.integers(min_value=3, max_value=12))
    m = data.draw(st.integers(min_value=2, max_value=30))
    edges = [(i,
              data.draw(st.integers(min_value=0, max_value=n - 1)),
              data.draw(st.integers(min_value=0, max_value=n - 1)))
             for i in range(m)]
    direction = data.draw(st.sampled_from(["out", "in", "both"]))
    max_depth = data.draw(st.integers(min_value=1, max_value=4))
    min_depth = data.draw(st.integers(min_value=1, max_value=max_depth))
    start = data.draw(st.integers(min_value=0, max_value=n - 1))

    df = spark.createDataFrame(
        [(i, s, d, "E") for i, s, d in edges],
        "id bigint, src bigint, dst bigint, label string")
    got = {(r.node_id, r.depth)
           for r in bfs(df, [start], min_depth, max_depth,
                        direction=direction).collect()}

    adj = {}
    for _, s, d in edges:
        if direction in ("out", "both"):
            adj.setdefault(s, set()).add(d)
        if direction in ("in", "both"):
            adj.setdefault(d, set()).add(s)
    dist = {start: 0}
    dq = deque([start])
    while dq:
        u = dq.popleft()
        if dist[u] >= max_depth:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    want = {(v, d) for v, d in dist.items() if min_depth <= d <= max_depth}
    assert got == want, (edges, direction, min_depth, max_depth, start)


@settings(max_examples=15, deadline=None, derandomize=True)
@given(data=st.data())
def test_bm25_differential_random_corpus(data, spark):
    """Random tiny corpora: scan-path BM25 == pure-Python formula."""
    import math as m

    from tests.test_bm25 import ref_bm25, ref_tokenize
    from velesdb_spark.functions.bm25 import bm25_scan_scores

    word = st.sampled_from(["rust", "spark", "data", "ml", "ai", "x1", "be", "a"])
    doc = st.lists(word, min_size=0, max_size=8).map(" ".join)
    docs = {i: data.draw(doc) for i in range(data.draw(
        st.integers(min_value=1, max_value=8)))}
    query = data.draw(st.lists(word, min_size=1, max_size=3).map(" ".join))

    df = spark.createDataFrame(list(docs.items()), "id bigint, text string")
    got = {r.id: r._bm25_score for r in bm25_scan_scores(df, query).collect()}
    if not any(ref_tokenize(t) for t in docs.values()):
        assert got == {}  # empty index → no results (bm25.rs:146-148)
        return
    want = ref_bm25(docs, query)
    assert set(got) == set(want), (docs, query)
    for i in got:
        assert m.isclose(got[i], want[i], rel_tol=1e-9), (docs, query)


# --- programmatic filter dicts (functions/filters.py) ---------------------


def _dict_leaf(draw):
    kind = draw(st.integers(min_value=0, max_value=5))
    if kind == 0:
        col = draw(st.sampled_from(_NUM_COLS))
        op = draw(st.sampled_from(["gt", "gte", "lt", "lte", "eq", "neq"]))
        val = draw(st.integers(min_value=0, max_value=300000))
        sqlop = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<=",
                 "eq": "=", "neq": "!="}[op]
        return ({"type": op, "field": col, "value": val},
                f"{col} {sqlop} {val}")
    col = draw(st.sampled_from(_STR_COLS))
    if kind == 1:
        v = draw(st.sampled_from(["F", "O", "1-URGENT", "zzz"]))
        return ({"type": "eq", "field": col, "value": v}, f"{col} = '{v}'")
    if kind == 2:
        return ({"type": "in", "field": col, "values": ["F", "O"]},
                f"{col} IN ('F', 'O')")
    if kind == 3:
        v = draw(st.sampled_from(["URG", "LOW", "-", "zz"]))
        return ({"type": "contains", "field": col, "value": v},
                f"contains({col}, '{v}')")
    if kind == 4:
        pat = draw(st.sampled_from(["%URG%", "%LOW", "_-____%"]))
        return ({"type": "like", "field": col, "pattern": pat},
                f"{col} LIKE '{pat}'")
    return ({"type": "is_not_null", "field": col}, f"{col} IS NOT NULL")


@st.composite
def filter_dict(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        return _dict_leaf(draw)
    (da, sa) = draw(filter_dict(depth=depth + 1))
    (db, sb) = draw(filter_dict(depth=depth + 1))
    combo = draw(st.sampled_from(["and", "or"]))
    d = {"type": combo, "conditions": [da, db]}
    s = f"({sa} {'AND' if combo == 'and' else 'OR'} {sb})"
    if draw(st.booleans()):
        return ({"type": "not", "condition": d}, f"NOT {s}")
    return (d, s)


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_filter_dict_differential(data, catalog, oracle_con):
    """Random reference-format filter dicts vs the same predicate in
    DuckDB SQL — identical row sets (orders fixture has no NULLs, so the
    definite-boolean null semantics coincide with SQL here)."""
    from velesdb_spark.functions.filters import filter_to_column

    d, sql_pred = data.draw(filter_dict())
    sdf = catalog.resolve("orders").df.filter(filter_to_column(d)) \
        .select("o_orderkey")
    got = sorted(r.o_orderkey for r in sdf.collect())
    want = sorted(r[0] for r in oracle_con.execute(
        f"SELECT o_orderkey FROM orders WHERE {sql_pred}").fetchall())
    assert got == want


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_correlated_subquery_differential(data, catalog, oracle_con2):
    """Random correlated EXISTS / NOT EXISTS / correlated-scalar shapes vs
    DuckDB — the decorrelation must agree for arbitrary inner predicates
    and comparison operators."""
    shape = data.draw(st.sampled_from(["exists", "not_exists", "scalar",
                                       "count_lhs"]))
    thr = data.draw(st.integers(min_value=0, max_value=400000))
    if shape in ("exists", "not_exists"):
        neg = "NOT " if shape == "not_exists" else ""
        inner_op = data.draw(st.sampled_from([">", "<", ">=", "="]))
        sql = (f"SELECT c_custkey FROM customer AS c WHERE {neg}EXISTS "
               f"(SELECT o_orderkey FROM orders AS o WHERE o.o_custkey = "
               f"c.c_custkey AND o_totalprice {inner_op} {thr}.0) "
               f"ORDER BY c_custkey LIMIT 100000")
        oracle = sql.replace("LIMIT 100000", "")
    elif shape == "scalar":
        agg = data.draw(st.sampled_from(["AVG", "MIN", "MAX", "SUM"]))
        op = data.draw(st.sampled_from([">", "<", ">=", "<="]))
        sql = (f"SELECT o_orderkey FROM orders AS o WHERE o_totalprice {op} "
               f"(SELECT {agg}(o_totalprice) FROM orders AS o2 "
               f"WHERE o2.o_custkey = o.o_custkey) "
               f"ORDER BY o_orderkey LIMIT 100000")
        oracle = sql.replace("o_orderkey LIMIT 100000", "o_orderkey")
    else:
        cmp_n = data.draw(st.integers(min_value=0, max_value=3))
        op = data.draw(st.sampled_from(["=", ">", "<="]))
        sql = (f"SELECT c_custkey FROM customer AS c WHERE "
               f"(SELECT COUNT(*) FROM orders AS o WHERE o.o_custkey = "
               f"c.c_custkey AND o_totalprice > {thr}.0) {op} {cmp_n} "
               f"ORDER BY c_custkey LIMIT 100000")
        oracle = sql.replace("LIMIT 100000", "")
    got = [r[0] for r in translate(sql, catalog).collect()]
    want = [r[0] for r in oracle_con2.execute(oracle).fetchall()]
    assert got == want, f"sql: {sql}"


@settings(max_examples=300, deadline=None)
@given(data=st.data())
def test_parser_fuzz_total(data):
    """Twin of the reference's fuzz_velesql_parser target: ANY input —
    byte soup, token soup, or a mutilated valid query — must either
    parse or raise VelesQLSyntaxError. Every other exception class is a
    parser crash."""
    from velesdb_spark.velesql.lexer import VelesQLSyntaxError
    from velesdb_spark.velesql.parser import parse

    mode = data.draw(st.sampled_from(["bytes", "tokens", "mutated"]))
    if mode == "bytes":
        sql = data.draw(st.text(max_size=80))
    elif mode == "tokens":
        toks = data.draw(st.lists(st.sampled_from(
            ["SELECT", "*", "FROM", "docs", "WHERE", "AND", "OR", "NOT",
             "(", ")", ",", "=", ">", "<", "'x'", "1", "1.5", "$p",
             "NEAR", "[", "]", "GROUP", "BY", "ORDER", "LIMIT", "MATCH",
             "USING", "FUSION", "UNION", "JOIN", "ON", "HAVING", "--c",
             "BETWEEN", "IN", "LIKE", "IS", "NULL", "a.b", "`q id`"]),
            max_size=25))
        sql = " ".join(toks)
    else:
        base = "SELECT a, COUNT(*) FROM docs WHERE x > 1 AND y LIKE '%z%' " \
               "GROUP BY a HAVING COUNT(*) > 2 ORDER BY a LIMIT 5"
        i = data.draw(st.integers(0, len(base) - 1))
        j = data.draw(st.integers(i, len(base)))
        sql = base[:i] + data.draw(st.text(max_size=8)) + base[j:]
    try:
        parse(sql)
    except VelesQLSyntaxError:
        pass
