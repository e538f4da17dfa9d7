"""Structured EXPLAIN plan parity — every shape from the reference's
velesql/explain_tests.rs (24 tests), executed against plans/queryplan.py.

These are pure plan-construction tests: no SparkSession, no I/O."""

import json

import pytest

from velesdb_spark.plans.queryplan import (ActualStats, ExplainOutput,
                                           FilterPlan, FilterStrategy,
                                           IndexLookupPlan, IndexType,
                                           LimitPlan, MatchTraversalPlan,
                                           QueryPlan, TableScanPlan,
                                           VectorSearchPlan,
                                           compare_op_as_str)
from velesdb_spark.velesql.parser import parse


def test_plan_from_simple_select():
    """explain_tests.rs:9-35: plain scan → no index, no filter strategy,
    positive cost."""
    plan = QueryPlan.from_select(parse("SELECT * FROM documents LIMIT 10"))
    assert plan.index_used is None
    assert plan.filter_strategy == FilterStrategy.NONE
    assert plan.estimated_cost_ms > 0.0


def test_plan_from_vector_search():
    """explain_tests.rs:37-64: NEAR → Hnsw index report, cost < 1.0."""
    plan = QueryPlan.from_select(
        parse("SELECT * FROM embeddings WHERE vector NEAR $query LIMIT 5"))
    assert plan.index_used == IndexType.HNSW
    assert plan.estimated_cost_ms < 1.0


def test_plan_with_filter():
    """explain_tests.rs:66-100: vector search AND comparison → index used,
    filter strategy set."""
    plan = QueryPlan.from_select(parse(
        "SELECT * FROM docs WHERE vector NEAR $v AND category = 'tech' "
        "LIMIT 10"))
    assert plan.index_used == IndexType.HNSW
    assert plan.filter_strategy != FilterStrategy.NONE


def test_plan_to_tree_format():
    """explain_tests.rs:102-132: tree text carries the header, node name,
    collection, and index line."""
    plan = QueryPlan.from_select(
        parse("SELECT * FROM documents WHERE vector NEAR $q LIMIT 10"))
    tree = plan.to_tree()
    assert "Query Plan:" in tree
    assert "VectorSearch" in tree
    assert "Collection: documents" in tree
    assert "Index used: HNSW" in tree


def test_plan_to_json():
    """explain_tests.rs:134-160."""
    plan = QueryPlan.from_select(parse("SELECT * FROM test LIMIT 5"))
    j = plan.to_json()
    assert '"estimated_cost_ms"' in j
    assert '"root"' in j
    json.loads(j)  # well-formed


def test_plan_with_offset():
    """explain_tests.rs:162-188."""
    plan = QueryPlan.from_select(
        parse("SELECT * FROM items LIMIT 10 OFFSET 20"))
    tree = plan.to_tree()
    assert "Offset: 20" in tree
    assert "Limit: 10" in tree


def test_filter_strategy_post_filter_default():
    """explain_tests.rs:190-223: a single filter condition = 50%
    selectivity → PostFilter."""
    plan = QueryPlan.from_select(parse(
        "SELECT * FROM docs WHERE vector NEAR $v AND status = 'active' "
        "LIMIT 10"))
    assert plan.filter_strategy == FilterStrategy.POST_FILTER


def test_index_type_as_str():
    """explain_tests.rs:225-230 + 338-341."""
    assert IndexType.as_str(IndexType.HNSW) == "HNSW"
    assert IndexType.as_str(IndexType.FLAT) == "Flat"
    assert IndexType.as_str(IndexType.BINARY_QUANTIZATION) == "BinaryQuantization"
    assert IndexType.as_str(IndexType.PROPERTY) == "PropertyIndex"


def test_compare_op_as_str():
    """explain_tests.rs:232-240 (plus <> normalization)."""
    assert compare_op_as_str("=") == "="
    assert compare_op_as_str("!=") == "!="
    assert compare_op_as_str("<>") == "!="
    assert compare_op_as_str(">") == ">"
    assert compare_op_as_str(">=") == ">="
    assert compare_op_as_str("<") == "<"
    assert compare_op_as_str("<=") == "<="


def test_plan_display_impl():
    """explain_tests.rs:242-267: str(plan) == to_tree()."""
    plan = QueryPlan.from_select(parse("SELECT * FROM test LIMIT 5"))
    assert "Query Plan:" in str(plan)
    assert str(plan) == plan.to_tree()


def test_index_lookup_plan_creation():
    """explain_tests.rs:273-286."""
    plan = IndexLookupPlan(label="Person", property="email",
                           value="alice@example.com")
    assert plan.label == "Person"
    assert plan.property == "email"
    assert plan.value == "alice@example.com"


def test_index_lookup_node_cost():
    """explain_tests.rs:288-313: IndexLookup cost << TableScan cost."""
    il = QueryPlan(root=IndexLookupPlan("Person", "email", "t@t.com"),
                   estimated_cost_ms=0.0001, index_used=IndexType.PROPERTY)
    scan = QueryPlan(root=TableScanPlan(collection="Person"),
                     estimated_cost_ms=1.0)
    assert il.estimated_cost_ms < scan.estimated_cost_ms


def test_index_lookup_render_tree():
    """explain_tests.rs:315-336: IndexLookup(label.property) + Value +
    Index used: PropertyIndex."""
    plan = QueryPlan(
        root=IndexLookupPlan("Person", "email", "alice@example.com"),
        estimated_cost_ms=0.0001, index_used=IndexType.PROPERTY)
    tree = plan.to_tree()
    assert "IndexLookup(Person.email)" in tree
    assert "Value: alice@example.com" in tree
    assert "Index used: PropertyIndex" in tree


def test_index_lookup_json_serialization():
    """explain_tests.rs:343-365."""
    plan = QueryPlan(root=IndexLookupPlan("Document", "category", "tech"),
                     estimated_cost_ms=0.0001, index_used=IndexType.PROPERTY)
    j = plan.to_json()
    assert "IndexLookup" in j
    assert "Document" in j
    assert "category" in j
    assert "tech" in j


def test_match_traversal_plan_node():
    """explain_tests.rs:371-385: depth-3 traversal cost in (0.1, 1.0)."""
    mt = MatchTraversalPlan(
        strategy="GraphFirst: Traverse from nodes with labels [Person], "
                 "max depth 3",
        start_labels=["Person"], max_depth=3, relationship_count=2)
    cost = QueryPlan.node_cost(mt)
    assert 0.1 < cost < 1.0


def test_render_match_traversal():
    """explain_tests.rs:387-404."""
    mt = MatchTraversalPlan(strategy="GraphFirst: max depth 2",
                            start_labels=["Document"], max_depth=2,
                            relationship_count=1)
    out: list = []
    QueryPlan.render_node(mt, out, "", True)
    text = "".join(out)
    assert "MatchTraversal" in text
    assert "GraphFirst" in text
    assert "Document" in text
    assert "Max Depth: 2" in text


def test_render_match_traversal_with_similarity():
    """explain_tests.rs:406-422."""
    mt = MatchTraversalPlan(strategy="VectorFirst: top-100 candidates",
                            max_depth=1, has_similarity=True,
                            similarity_threshold=0.85)
    out: list = []
    QueryPlan.render_node(mt, out, "", True)
    text = "".join(out)
    assert "MatchTraversal" in text
    assert "VectorFirst" in text
    assert "Similarity Threshold: 0.85" in text


def test_match_traversal_cost_with_depth():
    """explain_tests.rs:424-448: deeper traversal costs more."""
    shallow = MatchTraversalPlan(strategy="GraphFirst", max_depth=1,
                                 relationship_count=1)
    deep = MatchTraversalPlan(strategy="GraphFirst", max_depth=5,
                              relationship_count=5)
    assert QueryPlan.node_cost(deep) > QueryPlan.node_cost(shallow)


def test_explain_output_struct():
    """explain_tests.rs:450-474."""
    plan = QueryPlan(root=TableScanPlan(collection="test"),
                     estimated_cost_ms=1.0)
    output = ExplainOutput(plan=plan, actual_stats=ActualStats(
        actual_rows=100, actual_time_ms=0.5, loops=1,
        nodes_visited=50, edges_traversed=25))
    assert output.actual_stats.actual_rows == 100
    assert output.actual_stats.actual_time_ms < 1.0
    j = json.loads(output.to_json())
    assert j["actual_stats"]["edges_traversed"] == 25


def test_filter_strategy_default():
    """explain_tests.rs:476-480."""
    assert FilterStrategy.default() == FilterStrategy.NONE


def test_filter_strategy_as_str():
    """explain_tests.rs:482-493."""
    assert FilterStrategy.as_str(FilterStrategy.NONE) == "none"
    assert FilterStrategy.as_str(FilterStrategy.PRE_FILTER) == \
        "pre-filtering (high selectivity)"
    assert FilterStrategy.as_str(FilterStrategy.POST_FILTER) == \
        "post-filtering (low selectivity)"


def test_node_cost_calculations():
    """explain_tests.rs:495-519: exact node-cost constants."""
    assert abs(QueryPlan.node_cost(
        VectorSearchPlan(collection="test", ef_search=100, candidates=50))
        - 0.05) < 1e-5
    assert abs(QueryPlan.node_cost(LimitPlan(count=10)) - 0.001) < 1e-5
    assert abs(QueryPlan.node_cost(TableScanPlan(collection="test"))
               - 1.0) < 1e-5
    assert abs(QueryPlan.node_cost(IndexLookupPlan("Person", "id", "123"))
               - 0.0001) < 1e-6
    # Filter cost depends on selectivity (explain.rs:317)
    assert abs(QueryPlan.node_cost(FilterPlan("a = ?", 0.5)) - 0.005) < 1e-9


def test_estimate_selectivity():
    """explain_tests.rs:521-533: 0.5^n, strictly decreasing."""
    s0 = QueryPlan.estimate_selectivity([])
    s1 = QueryPlan.estimate_selectivity(["a = ?"])
    s2 = QueryPlan.estimate_selectivity(["a = ?", "b = ?"])
    assert s0 > s1 > s2
    assert s0 == 1.0 and s1 == 0.5 and s2 == 0.25


# ---- beyond the rs file: from_select/from_match details the reference
# asserts implicitly elsewhere

def test_filter_conditions_spelling():
    """explain.rs:250-293 analyze_condition: the Filter node's conditions
    string uses the reference's exact placeholder spellings."""
    plan = QueryPlan.from_select(parse(
        "SELECT * FROM docs WHERE category = 'tech' AND score > 5 "
        "AND name LIKE 'a%' AND tag IN ('x','y') "
        "AND price BETWEEN 1 AND 2 AND note IS NOT NULL "
        "AND body MATCH 'query' LIMIT 5"))
    f = [n for n in plan.root if isinstance(n, FilterPlan)][0]
    assert f.conditions == ("category = ? AND score > ? AND name LIKE ? "
                            "AND tag IN (...) AND price BETWEEN ? AND ? "
                            "AND note IS NOT NULL AND body MATCH ?")
    assert abs(f.selectivity - 0.5 ** 7) < 1e-12


def test_two_filters_prefilter():
    """explain.rs:212-216: selectivity 0.25 ≤ 0.1 is false → PostFilter;
    four filters (0.0625) → PreFilter."""
    post = QueryPlan.from_select(parse(
        "SELECT * FROM docs WHERE vector NEAR $v AND a = 1 AND b = 2 "
        "LIMIT 5"))
    assert post.filter_strategy == FilterStrategy.POST_FILTER
    pre = QueryPlan.from_select(parse(
        "SELECT * FROM docs WHERE vector NEAR $v AND a = 1 AND b = 2 "
        "AND c = 3 AND d = 4 LIMIT 5"))
    assert pre.filter_strategy == FilterStrategy.PRE_FILTER


def test_from_match_graph_first():
    """explain.rs:332-408 from_match: a label-anchored pattern plans
    GraphFirst; the traversal node carries labels/depth/rel count."""
    q = parse("MATCH (a:Person)-[:KNOWS*1..3]->(b) RETURN b LIMIT 10")
    plan = QueryPlan.from_match(q)
    nodes = plan.root if isinstance(plan.root, list) else [plan.root]
    mt = nodes[0]
    assert isinstance(mt, MatchTraversalPlan)
    assert mt.start_labels == ["Person"]
    assert mt.max_depth == 3
    assert mt.relationship_count == 1
    assert not mt.has_similarity
    assert plan.index_used is None
    tree = plan.to_tree()
    assert "Limit: 10" in tree and "Max Depth: 3" in tree


def test_from_match_vector_first():
    """A similarity-anchored unlabeled pattern plans VectorFirst: index
    reported, threshold rendered."""
    q = parse("MATCH (a)-[:REL]->(b) WHERE similarity(a.vector, $v) > 0.85 "
              "RETURN b LIMIT 5")
    plan = QueryPlan.from_match(q)
    nodes = plan.root if isinstance(plan.root, list) else [plan.root]
    mt = nodes[0]
    assert mt.has_similarity
    assert plan.index_used == IndexType.HNSW
    assert "Similarity Threshold: 0.85" in plan.to_tree()


def test_vector_search_candidates_from_limit():
    """explain.rs:197: candidates = limit, default 50."""
    p = QueryPlan.from_select(
        parse("SELECT * FROM e WHERE vector NEAR $v LIMIT 7"))
    nodes = p.root if isinstance(p.root, list) else [p.root]
    assert nodes[0].candidates == 7
    p = QueryPlan.from_select(parse("SELECT * FROM e WHERE vector NEAR $v"))
    nodes = p.root if isinstance(p.root, list) else [p.root]
    assert isinstance(nodes[0], VectorSearchPlan)


def test_collection_explain_json_format(spark):
    """Collection.explain(format='json') returns the REST
    /query/explain JSON shape: root node tree, estimated_cost_ms,
    index_used, filter_strategy."""
    from velesdb_spark.database import Collection

    df = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 1.0])],
                               "id bigint, vector array<double>")
    coll = Collection(spark, "t", df=df)
    j = json.loads(coll.explain(
        "SELECT id FROM t WHERE vector NEAR [1.0, 0.0] LIMIT 5",
        format="json"))
    assert j["index_used"] == "Hnsw"
    assert "estimated_cost_ms" in j and "root" in j
    tags = [list(n)[0] for n in j["root"]["Sequence"]] \
        if "Sequence" in j["root"] else [list(j["root"])[0]]
    assert "VectorSearch" in tags
    with pytest.raises(ValueError, match="json"):
        coll.explain("SELECT id FROM t UNION SELECT id FROM t",
                     format="json")
