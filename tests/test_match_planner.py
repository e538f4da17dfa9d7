"""MATCH planner: decision-rule parity with match_planner.rs (ported from
match_planner_tests.rs) + strategy-equivalence on a real graph — every
strategy must return identical rows, because VectorFirst/Parallel only
move WHERE the similarity threshold is evaluated (start scan vs post-
traversal), never what passes it."""

import pytest
from pyspark.sql import functions as F

from velesdb_spark.plans import match_planner as mp
from velesdb_spark.velesql import ast
from velesdb_spark.velesql.parser import parse
from velesdb_spark.velesql.translator import Catalog
from velesdb_spark.operators.graph import translate_match


def _stats(**kw):
    # match_planner_tests.rs default_stats()
    base = dict(total_nodes=1000, total_edges=5000, avg_degree=5.0,
                label_count=10, label_selectivity=0.1)
    base.update(kw)
    return mp.PlannerStats(**base)


def _mq(has_similarity, limit=10, threshold=0.8, field="a.embedding"):
    where = None
    if has_similarity:
        where = ast.Similarity(field_name=field, vector=(0.1, 0.2),
                               op=">", threshold=threshold)
    return ast.MatchQuery(
        nodes=(ast.NodePattern(alias="a", labels=("Person",)),
               ast.NodePattern(alias="b")),
        rels=(ast.RelPattern(types=("KNOWS",), direction="out"),),
        where=where,
        returns=(ast.ReturnItem(expr="a"),),
        limit=limit)


def test_graph_first_for_pure_graph():
    strat = mp.plan(_mq(False), _stats())
    assert isinstance(strat, mp.GraphFirst)
    assert strat.start_labels == ("Person",)
    assert strat.max_depth == 1


def test_vector_first_for_start_similarity():
    strat = mp.plan(_mq(True), _stats())
    assert isinstance(strat, mp.VectorFirst)
    assert strat.similarity_alias == "a"
    assert strat.threshold == pytest.approx(0.8)


def test_graph_first_for_non_start_similarity_small_stats():
    # similarity on the target alias; small/sparse stats → GraphFirst
    strat = mp.plan(_mq(True, field="b.embedding"),
                    _stats(total_nodes=100, avg_degree=1.0))
    assert isinstance(strat, mp.GraphFirst)


def test_parallel_for_large_dense_high_threshold():
    # match_planner.rs should_use_parallel: >10k nodes, degree >5, t >0.8
    strat = mp.plan(_mq(True, field="b.embedding", threshold=0.9),
                    _stats(total_nodes=50_000, avg_degree=8.0))
    assert isinstance(strat, mp.Parallel)
    assert isinstance(strat.graph_hint, mp.GraphFirst)
    assert strat.vector_hint.threshold == pytest.approx(0.9)


def test_estimate_selectivity():
    assert mp.estimate_selectivity(0.9) == pytest.approx(0.1, abs=0.01)
    assert mp.estimate_selectivity(0.5) == pytest.approx(0.5, abs=0.01)
    assert mp.estimate_selectivity(1.5) == 0.01  # floor


def test_estimate_top_k_clamped():
    q = _mq(True, limit=10)
    k = mp.estimate_top_k(q, _stats(), 0.8)
    # limit=10, graph_factor=min(1/0.1,10)=10, selectivity=1-0.8
    # (0.1999…96 in f64) → ceil(500.0000…6) = 501, same as the
    # reference's f64 arithmetic
    assert k == 501
    assert mp.estimate_top_k(q, _stats(), 0.999999) == 10 * 100  # cap
    # zero degree → graph_factor 2.0
    assert mp.estimate_top_k(q, _stats(avg_degree=0.0), 0.5) == 40


def test_count_hops():
    assert mp.count_hops(_mq(False)) == 1
    q = ast.MatchQuery(
        nodes=(ast.NodePattern(alias="a"), ast.NodePattern(alias="b"),
               ast.NodePattern(alias="c")),
        rels=(ast.RelPattern(max_depth=3), ast.RelPattern(max_depth=1)),
        returns=(ast.ReturnItem(expr="a"),))
    assert mp.count_hops(q) == 4


def test_explain_strings():
    g = mp.explain_strategy(mp.GraphFirst(start_labels=("Person",),
                                          max_depth=3))
    assert "GraphFirst" in g and "Person" in g
    v = mp.explain_strategy(mp.VectorFirst(similarity_alias="doc",
                                           top_k=100, threshold=0.85))
    assert "VectorFirst" in v and "doc" in v
    p = mp.explain_strategy(mp.Parallel(
        graph_hint=mp.GraphFirst(), vector_hint=mp.VectorFirst()))
    assert "Parallel" in p and "GraphFirst" in p and "VectorFirst" in p


def test_conjunctive_similarities_skips_or_not():
    sim = ast.Similarity(field_name="a.embedding", vector=(1.0,),
                         op=">", threshold=0.5)
    other = ast.Compare(column="a.age", op=">", value=10)
    assert mp.conjunctive_similarities(ast.And((sim, other))) == [sim]
    assert mp.conjunctive_similarities(ast.Or((sim, other))) == []
    assert mp.conjunctive_similarities(ast.Not(sim)) == []
    nested = ast.And((other, ast.And((sim,))))
    assert mp.conjunctive_similarities(nested) == [sim]


# ---------------------------------------------------------------- execution


@pytest.fixture(scope="module")
def vg(spark):
    nodes = spark.createDataFrame(
        [
            (1, ["Person"], "alice", [1.0, 0.0]),
            (2, ["Person"], "bob", [0.9, 0.1]),
            (3, ["Person"], "carol", [0.0, 1.0]),
            (4, ["Doc"], "d4", [0.5, 0.5]),
            (5, ["Doc"], "d5", [0.0, 0.0]),
        ],
        "id bigint, labels array<string>, name string, embedding array<double>",
    )
    edges = spark.createDataFrame(
        [
            (100, 1, 4, "WROTE", 1.0),
            (101, 2, 4, "WROTE", 1.0),
            (102, 3, 5, "WROTE", 1.0),
            (103, 1, 5, "CITES", 1.0),
        ],
        "id bigint, src bigint, dst bigint, label string, weight double",
    )
    cat = Catalog()
    cat.register("nodes", nodes)
    cat.register("edges", edges)
    return cat


MATCH_SIM = ("MATCH (a:Person)-[:WROTE]->(b) "
             "WHERE similarity(a.embedding, $v) >= 0.8 "
             "RETURN a.name AS name, b.name AS doc ORDER BY name, doc")


def _run(cat, sql, strategy, params):
    q = parse(sql)
    return sorted(
        tuple(r) for r in
        translate_match(q, cat, params, strategy=strategy).collect())


def test_strategies_return_identical_rows(vg):
    params = {"v": [1.0, 0.0]}
    q = parse(MATCH_SIM)
    default = mp.plan(q, mp.PlannerStats())
    assert isinstance(default, mp.VectorFirst)  # sim on start alias
    rows_vf = _run(vg, MATCH_SIM, default, params)
    rows_gf = _run(vg, MATCH_SIM,
                   mp.GraphFirst(start_labels=("Person",), max_depth=1),
                   params)
    rows_par = _run(vg, MATCH_SIM,
                    mp.Parallel(vector_hint=default), params)
    assert rows_vf == rows_gf == rows_par
    # cosine(a1)=1.0, cosine(a2)≈0.994 → alice+bob rows pass, carol not
    assert rows_vf == [("alice", "d4"), ("bob", "d4")]


def test_or_nested_similarity_not_prefiltered(vg):
    # similarity under OR must NOT be pushed to the start scan: carol
    # fails the threshold but passes name='carol'.
    sql = ("MATCH (a:Person)-[:WROTE]->(b) "
           "WHERE similarity(a.embedding, $v) >= 0.8 OR a.name = 'carol' "
           "RETURN a.name AS name ORDER BY name")
    params = {"v": [1.0, 0.0]}
    q = parse(sql)
    strat = mp.plan(q, mp.PlannerStats())
    rows = _run(vg, sql, strat, params)
    assert rows == [("alice",), ("bob",), ("carol",)]


def test_match_translation_stays_pure(vg, spark):
    """Planning with default stats + VectorFirst prefilter must not run
    Spark jobs at translation time."""
    sc = spark.sparkContext
    group = "match-planner-purity"
    sc.setJobGroup(group, "purity", True)
    try:
        q = parse(MATCH_SIM)
        df = translate_match(q, vg, {"v": [1.0, 0.0]})
        df.explain(True)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setJobGroup("", "")
    assert jobs == []


def test_collection_match_plan(spark):
    from velesdb_spark.database import Collection

    col = Collection(spark, "mp_nodes", df=spark.createDataFrame(
        [(1, [1.0, 0.0], ["Person"], "a"), (2, [0.0, 1.0], ["Doc"], "b")],
        "id bigint, vector array<float>, labels array<string>, name string"))
    col.add_edges(spark.createDataFrame(
        [(1, 1, 2, "WROTE")], "id bigint, src bigint, dst bigint, label string"))
    strat, line = col.match_plan(
        "MATCH (a:Person)-[:WROTE]->(b) RETURN a.name")
    assert isinstance(strat, mp.GraphFirst)
    assert "GraphFirst" in line and "Person" in line
