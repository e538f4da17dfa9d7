"""Translator correctness vs DuckDB oracle on the driver's testdata."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle
from velesdb_spark.velesql.translator import (Catalog, TranslationError,
                                              translate)


def test_filter_order_limit(catalog, duck):
    sdf = translate(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0 "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20", catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0 "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20")


def test_in_between_like(catalog, duck):
    sdf = translate(
        "SELECT p_partkey, p_name FROM part WHERE p_size BETWEEN 10 AND 20 "
        "AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') AND p_name LIKE '%al%' "
        "ORDER BY p_partkey LIMIT 50", catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT p_partkey, p_name FROM part WHERE p_size BETWEEN 10 AND 20 "
        "AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') AND p_name LIKE '%al%' "
        "ORDER BY p_partkey LIMIT 50")


def test_neq_matches_missing(spark, duck):
    """Reference Neq is true on NULL (filter/matching.rs:14-16)."""
    from velesdb_spark.velesql.translator import Catalog

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id bigint, v string")
    cat = Catalog().register("t", df)
    out = translate("SELECT id FROM t WHERE v != 'a' ORDER BY id", cat)
    assert [r.id for r in out.collect()] == [2, 3]


def test_aggregates(catalog, duck):
    sdf = translate(
        "SELECT l_returnflag, COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty, "
        "AVG(l_extendedprice) AS avg_price, MIN(l_discount) AS min_disc, "
        "MAX(l_tax) AS max_tax FROM lineitem GROUP BY l_returnflag "
        "ORDER BY l_returnflag", catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT l_returnflag, COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty, "
        "AVG(l_extendedprice) AS avg_price, MIN(l_discount) AS min_disc, "
        "MAX(l_tax) AS max_tax FROM lineitem GROUP BY l_returnflag "
        "ORDER BY l_returnflag")


def test_having_and_or(catalog, duck):
    sdf = translate(
        "SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey "
        "HAVING COUNT(*) > 10 AND SUM(o_totalprice) > 500000.0 "
        "ORDER BY n DESC, o_custkey LIMIT 10", catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey "
        "HAVING COUNT(*) > 10 AND SUM(o_totalprice) > 500000.0 "
        "ORDER BY n DESC, o_custkey LIMIT 10")


def test_having_requires_group_by(catalog):
    with pytest.raises(TranslationError):
        translate("SELECT COUNT(*) FROM orders HAVING COUNT(*) > 1", catalog)


def test_default_agg_names(catalog):
    sdf = translate("SELECT COUNT(*), SUM(o_totalprice), AVG(o_totalprice) "
                    "FROM orders", catalog)
    assert sdf.columns == ["count", "sum_o_totalprice", "avg_o_totalprice"]


def test_count_col_nonnull(spark):
    from velesdb_spark.velesql.translator import Catalog

    df = spark.createDataFrame([(1, 1.0), (2, None), (3, 3.0)], "id bigint, v double")
    cat = Catalog().register("t", df)
    out = translate("SELECT COUNT(v) AS n FROM t", cat).collect()
    assert out[0].n == 2


def test_having_subquery_bound(catalog, duck):
    """HAVING <agg> op (SELECT ...) — lazy 1-row join, values vs DuckDB."""
    sql = ("SELECT o_custkey, SUM(o_totalprice) AS s FROM orders "
           "GROUP BY o_custkey "
           "HAVING SUM(o_totalprice) > (SELECT MAX(o_totalprice) FROM orders) "
           "ORDER BY s DESC, o_custkey LIMIT 20")
    assert_matches_oracle(translate(sql, catalog), duck, sql)


def test_in_list_with_subquery_element(catalog, duck):
    """IN (literal, (SELECT ...)) — subquery element as a lazy scalar."""
    sql = ("SELECT o_orderkey FROM orders WHERE o_custkey IN "
           "(1, (SELECT MIN(c_custkey) FROM customer)) "
           "ORDER BY o_orderkey LIMIT 20")
    assert_matches_oracle(translate(sql, catalog), duck, sql)


def test_join_inner(catalog, duck):
    sdf = translate(
        "SELECT c.c_name AS name, n.n_name AS nation FROM customer AS c "
        "JOIN nation AS n ON c.c_nationkey = n.n_nationkey "
        "ORDER BY name LIMIT 30", catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT c.c_name AS name, n.n_name AS nation FROM customer c "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "ORDER BY name LIMIT 30")


def test_join_left_outer(catalog, duck):
    sdf = translate(
        "SELECT n.n_name AS nation, s.s_name AS supp FROM nation AS n "
        "LEFT JOIN supplier AS s ON n.n_nationkey = s.s_nationkey "
        "ORDER BY nation, supp", catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT n.n_name AS nation, s.s_name AS supp FROM nation n "
        "LEFT JOIN supplier s ON n.n_nationkey = s.s_nationkey "
        "ORDER BY nation, supp")


def test_self_join(catalog, duck):
    sdf = translate(
        "SELECT a.n_name AS n1, b.n_name AS n2 FROM nation AS a "
        "JOIN nation AS b ON a.n_regionkey = b.n_regionkey "
        "WHERE a.n_name < b.n_name ORDER BY n1, n2 LIMIT 40", catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT a.n_name AS n1, b.n_name AS n2 FROM nation a "
        "JOIN nation b ON a.n_regionkey = b.n_regionkey "
        "WHERE a.n_name < b.n_name ORDER BY n1, n2 LIMIT 40")


def test_set_ops(catalog, duck):
    sdf = translate(
        "SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier",
        catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier")
    sdf2 = translate(
        "SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier",
        catalog)
    assert_matches_oracle(sdf2, duck,
        "SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier")


def test_distinct(catalog, duck):
    sdf = translate("SELECT DISTINCT o_orderpriority FROM orders "
                    "ORDER BY o_orderpriority", catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority")


def test_scalar_subquery(catalog, duck):
    sdf = translate(
        "SELECT o_orderkey FROM orders WHERE o_totalprice > "
        "(SELECT AVG(o_totalprice) FROM orders) ORDER BY o_orderkey LIMIT 25",
        catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT o_orderkey FROM orders WHERE o_totalprice > "
        "(SELECT AVG(o_totalprice) FROM orders) ORDER BY o_orderkey LIMIT 25")


def test_exists_correlated(catalog, duck):
    """EXISTS decorrelated to a flag join (subquery_optimizer.rs:10-42
    PerRow surface, executed set-at-a-time)."""
    sdf = translate(
        "SELECT c_custkey FROM customer AS c WHERE EXISTS "
        "(SELECT o_orderkey FROM orders AS o WHERE o.o_custkey = c.c_custkey "
        "AND o_totalprice > 200000.0) ORDER BY c_custkey LIMIT 100000", catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT c_custkey FROM customer c WHERE EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o_totalprice > 200000.0) ORDER BY c_custkey")


def test_not_exists_correlated(catalog, duck):
    sdf = translate(
        "SELECT s_suppkey FROM supplier AS s WHERE NOT EXISTS "
        "(SELECT n_nationkey FROM nation AS n WHERE n.n_nationkey = "
        "s.s_nationkey AND n_regionkey = 0) ORDER BY s_suppkey LIMIT 100000",
        catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT s_suppkey FROM supplier s WHERE NOT EXISTS "
        "(SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey "
        "AND n_regionkey = 0) ORDER BY s_suppkey")


def test_correlated_scalar_subquery(catalog, duck):
    """col > (SELECT AVG(...) WHERE inner.k = outer.k) — groupBy + left
    join decorrelation, one shuffle on the correlation key."""
    sdf = translate(
        "SELECT o_orderkey FROM orders AS o WHERE o_totalprice > "
        "(SELECT AVG(o_totalprice) FROM orders AS o2 "
        "WHERE o2.o_custkey = o.o_custkey) ORDER BY o_orderkey LIMIT 100000",
        catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT o_orderkey FROM orders o WHERE o_totalprice > "
        "(SELECT AVG(o_totalprice) FROM orders o2 "
        "WHERE o2.o_custkey = o.o_custkey) ORDER BY o_orderkey")


def test_correlated_count_lhs(catalog, duck):
    """(SELECT COUNT(*) ...) = 0 LHS form — empty groups must read as
    COUNT=0, not NULL (the decorrelation count bug)."""
    sdf = translate(
        "SELECT c_custkey FROM customer AS c WHERE "
        "(SELECT COUNT(*) FROM orders AS o WHERE o.o_custkey = c.c_custkey "
        "AND o_totalprice > 300000.0) = 0 ORDER BY c_custkey LIMIT 100000",
        catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT c_custkey FROM customer c WHERE "
        "(SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o_totalprice > 300000.0) = 0 ORDER BY c_custkey")


def test_scalar_subquery_lazy(catalog, spark):
    """Non-correlated scalar subqueries stay lazy: translation builds a
    broadcast 1-row join instead of collecting the scalar eagerly (round-1
    verdict 'what's wrong' item 4), and the plan shows no driver-side
    constant derived from a job."""
    calls = []
    orig = type(catalog.resolve("orders").df).collect

    def spy(self):
        calls.append(1)
        return orig(self)

    from pyspark.sql import DataFrame
    DataFrame.collect = spy
    try:
        sdf = translate(
            "SELECT o_orderkey FROM orders WHERE o_totalprice > "
            "(SELECT AVG(o_totalprice) FROM orders) ORDER BY o_orderkey "
            "LIMIT 25", catalog)
        assert not calls, "translation ran a Spark job eagerly"
    finally:
        DataFrame.collect = orig
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row scalar join
    rows = [r.o_orderkey for r in sdf.collect()]
    assert len(rows) == 25


def test_exists_non_correlated(catalog, duck):
    """Non-correlated EXISTS folds to an all-or-nothing filter via a lazy
    1-row flag join — both the non-empty and empty probe outcomes."""
    sdf = translate(
        "SELECT c_custkey FROM customer WHERE EXISTS "
        "(SELECT o_orderkey FROM orders WHERE o_totalprice > 100000.0) "
        "ORDER BY c_custkey LIMIT 20", catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT c_custkey FROM customer WHERE EXISTS "
        "(SELECT 1 FROM orders WHERE o_totalprice > 100000.0) "
        "ORDER BY c_custkey LIMIT 20")
    empty = translate(
        "SELECT c_custkey FROM customer WHERE EXISTS "
        "(SELECT o_orderkey FROM orders WHERE o_totalprice < 0.0) "
        "ORDER BY c_custkey LIMIT 20", catalog)
    assert empty.count() == 0
    not_empty = translate(
        "SELECT c_custkey FROM customer WHERE NOT EXISTS "
        "(SELECT o_orderkey FROM orders WHERE o_totalprice < 0.0) "
        "ORDER BY c_custkey LIMIT 20", catalog)
    assert not_empty.count() == 20


def test_between_subquery_bounds(catalog, duck):
    sdf = translate(
        "SELECT o_orderkey FROM orders WHERE o_totalprice BETWEEN "
        "(SELECT AVG(o_totalprice) FROM orders) AND "
        "(SELECT MAX(o_totalprice) FROM orders) "
        "ORDER BY o_orderkey LIMIT 30", catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT o_orderkey FROM orders WHERE o_totalprice BETWEEN "
        "(SELECT AVG(o_totalprice) FROM orders) AND "
        "(SELECT MAX(o_totalprice) FROM orders) "
        "ORDER BY o_orderkey LIMIT 30")


def test_subquery_op_subquery(catalog, duck):
    """(SELECT..) op (SELECT..) — both sides lazy 1-row broadcast joins."""
    sdf = translate(
        "SELECT o_orderkey FROM orders WHERE "
        "(SELECT MIN(o_totalprice) FROM orders) < "
        "(SELECT AVG(o_totalprice) FROM orders) "
        "ORDER BY o_orderkey LIMIT 10", catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT o_orderkey FROM orders WHERE "
        "(SELECT MIN(o_totalprice) FROM orders) < "
        "(SELECT AVG(o_totalprice) FROM orders) "
        "ORDER BY o_orderkey LIMIT 10")


def test_translation_runs_zero_jobs(catalog, spark):
    """translate() + explain() must be pure plan construction: every
    subquery shape builds lazy joins, never a driver-side collect. Spark
    jobs started during translation would land in this job group."""
    shapes = [
        "SELECT o_orderkey FROM orders WHERE o_totalprice > "
        "(SELECT AVG(o_totalprice) FROM orders) LIMIT 5",
        "SELECT c_custkey FROM customer WHERE EXISTS "
        "(SELECT o_orderkey FROM orders WHERE o_totalprice > 0.0) LIMIT 5",
        "SELECT c_custkey FROM customer WHERE NOT EXISTS "
        "(SELECT o_orderkey FROM orders WHERE o_totalprice < 0.0) LIMIT 5",
        "SELECT o_orderkey FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 0.0) LIMIT 5",
        "SELECT o_orderkey FROM orders WHERE o_totalprice BETWEEN "
        "(SELECT AVG(o_totalprice) FROM orders) AND "
        "(SELECT MAX(o_totalprice) FROM orders) LIMIT 5",
        "SELECT o_orderkey FROM orders WHERE "
        "(SELECT MIN(o_totalprice) FROM orders) < "
        "(SELECT AVG(o_totalprice) FROM orders) LIMIT 5",
        "SELECT c_custkey FROM customer AS c WHERE EXISTS "
        "(SELECT o_orderkey FROM orders AS o "
        "WHERE o.o_custkey = c.c_custkey) LIMIT 5",
        "SELECT o_orderkey FROM orders AS o WHERE o_totalprice > "
        "(SELECT AVG(o_totalprice) FROM orders AS o2 "
        "WHERE o2.o_custkey = o.o_custkey) LIMIT 5",
        # value positions: HAVING bound and IN-list element — the last
        # formerly-eager translation paths
        "SELECT o_custkey, SUM(o_totalprice) AS s FROM orders "
        "GROUP BY o_custkey "
        "HAVING SUM(o_totalprice) > (SELECT AVG(o_totalprice) FROM orders) "
        "LIMIT 5",
        "SELECT o_orderkey FROM orders WHERE o_custkey IN "
        "(1, (SELECT MIN(c_custkey) FROM customer)) LIMIT 5",
        # dual-precision restructure (coarse prune + exact re-rank) must
        # also be pure plan construction; the query vector must be 64-dim
        # now that E004 validates dimensions eagerly (translator.py:_check_dim)
        "SELECT vec_id FROM embeddings WHERE vector NEAR "
        "[" + ", ".join(f"{v:.6f}" for v in _unit_vec(3)) + "]"
        " LIMIT 5 WITH (quantization = 'dual')",
    ]
    sc = spark.sparkContext
    group = "translation-purity-check"
    sc.setJobGroup(group, "assert no jobs during translate/explain")
    try:
        for sql in shapes:
            df = translate(sql, catalog)
            df._jdf.queryExecution().executedPlan().toString()
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setJobGroup("", "")
    assert jobs == [], f"translation/explain started Spark jobs: {jobs}"


def test_correlated_plans_are_hash_joins(catalog):
    """Decorrelated EXISTS/scalar must plan as hash joins on the
    correlation key — a nested-loop (per-row re-execution) plan would be
    the scale-killer the decorrelation exists to avoid."""
    for sql in [
        "SELECT c_custkey FROM customer AS c WHERE EXISTS "
        "(SELECT o_orderkey FROM orders AS o WHERE o.o_custkey = c.c_custkey)",
        "SELECT o_orderkey FROM orders AS o WHERE o_totalprice > "
        "(SELECT AVG(o_totalprice) FROM orders AS o2 "
        "WHERE o2.o_custkey = o.o_custkey)",
    ]:
        plan = translate(sql, catalog) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_correlated_in_subquery(catalog, duck):
    """x IN (SELECT y FROM t WHERE t.k = outer.k): correlation equalities
    become extra keys on the membership flag join."""
    sdf = translate(
        "SELECT o_orderkey FROM orders AS o WHERE o_orderkey IN "
        "(SELECT o_orderkey FROM orders AS o2 WHERE o2.o_custkey = "
        "o.o_custkey AND o_totalprice > 200000.0) "
        "ORDER BY o_orderkey LIMIT 100000", catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT o_orderkey FROM orders o WHERE o_orderkey IN "
        "(SELECT o_orderkey FROM orders o2 WHERE o2.o_custkey = "
        "o.o_custkey AND o_totalprice > 200000.0) ORDER BY o_orderkey")


def test_correlated_unsupported_predicate(catalog):
    """Non-equality correlation is rejected with a clear error."""
    with pytest.raises(TranslationError, match="conjunctive equality"):
        translate(
            "SELECT c_custkey FROM customer AS c WHERE EXISTS "
            "(SELECT o_orderkey FROM orders AS o WHERE o.o_totalprice > "
            "c.c_acctbal)", catalog)


def test_params(catalog, duck):
    sdf = translate("SELECT o_orderkey FROM orders WHERE o_orderstatus = $st "
                    "ORDER BY o_orderkey LIMIT 10", catalog, {"st": "O"})
    assert_matches_oracle(sdf, duck,
        "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O' "
        "ORDER BY o_orderkey LIMIT 10")


def test_offset(catalog, duck):
    sdf = translate("SELECT o_orderkey FROM orders ORDER BY o_orderkey "
                    "LIMIT 10 OFFSET 5", catalog)
    assert_matches_oracle(sdf, duck,
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 5")


def test_max_groups_guard(catalog):
    with pytest.raises(TranslationError):
        translate("SELECT o_custkey, COUNT(*) FROM orders GROUP BY o_custkey "
                  "WITH (max_groups=3)", catalog)


def test_max_groups_first_declared_wins(catalog):
    """extract_max_groups_limit (aggregation.rs:705-713) takes the FIRST
    of max_groups/group_limit in WITH-option declaration order — here
    group_limit=3 is declared first and must win over the permissive
    max_groups=1000000 that follows."""
    with pytest.raises(TranslationError, match="max_groups=3"):
        translate("SELECT o_custkey, COUNT(*) FROM orders GROUP BY o_custkey "
                  "WITH (group_limit=3, max_groups=1000000)", catalog)
    # reversed declaration order: the permissive key comes first → no error
    translate("SELECT o_custkey, COUNT(*) FROM orders GROUP BY o_custkey "
              "WITH (max_groups=1000000, group_limit=3)", catalog)


def test_max_groups_zero_clamps_to_one(catalog):
    """aggregation.rs:710 clamps the parsed value with max(1) — so
    WITH (max_groups=0) means 'at most 1 group', never 'guard off'."""
    with pytest.raises(TranslationError, match="max_groups=1"):
        translate("SELECT o_custkey, COUNT(*) FROM orders GROUP BY o_custkey "
                  "WITH (max_groups=0)", catalog)


def test_in_subquery(catalog, spark):
    """IN (SELECT ...) membership — flag-join translation composes with OR."""
    import duckdb

    out = translate(
        "SELECT o_orderkey FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0) "
        "OR o_totalprice > 400000.0 ORDER BY o_orderkey LIMIT 50", catalog)
    got = [r.o_orderkey for r in out.collect()]
    sf = catalog.resolve("orders").df.inputFiles()[0].rsplit("/", 1)[0]
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf.replace('file:', '')}/{t}.parquet'")
    want = [r[0] for r in con.execute(
        "SELECT o_orderkey FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0) "
        "OR o_totalprice > 400000.0 ORDER BY o_orderkey LIMIT 50").fetchall()]
    assert got == want


def test_temporal_now_interval(catalog, duck):
    """NOW()/INTERVAL resolve to epoch seconds (values.rs:102-122);
    now_epoch pins the clock so the result is deterministic, and the
    comparison works natively against a TIMESTAMP column."""
    sdf = translate(
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE ts >= NOW() - INTERVAL '7 days' AND ts < NOW() "
        "GROUP BY event_type ORDER BY event_type", catalog,
        now_epoch=1706659200)  # 2024-01-31T00:00:00Z
    assert_matches_oracle(sdf, duck,
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-24 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-31 00:00:00' "
        "GROUP BY event_type ORDER BY event_type")


def test_temporal_interval_arith_units():
    """INTERVAL unit table matches values.rs:148-163; NOW()±INTERVAL stays
    a point in time, INTERVAL+INTERVAL stays a duration."""
    from velesdb_spark.velesql.parser import parse_interval
    from velesdb_spark.velesql.translator import TemporalEpoch, Translator

    assert parse_interval("90 seconds") == 90
    assert parse_interval("2 hours") == 7200
    assert parse_interval("1 week") == 604800
    tr = Translator(None, now_epoch=1000)
    from velesdb_spark.velesql import ast as A

    v = tr.value(A.TemporalArith(A.Now(), "-", A.Interval(600)))
    assert v == 400 and isinstance(v, TemporalEpoch)
    d = tr.value(A.TemporalArith(A.Interval(600), "+", A.Interval(60)))
    assert d == 660 and not isinstance(d, TemporalEpoch)


def test_temporal_partition_pruning(spark, catalog, tmp_path_factory):
    """The 100 TB design for temporal predicates: events date-partitioned →
    NOW()/INTERVAL filters prune partitions at the source (the reference's
    temporal index analogue). Asserts the physical plan scans only the
    matching date partitions."""
    out = str(tmp_path_factory.mktemp("evpart") / "events_by_day")
    ev = catalog.resolve("events").df
    ev.withColumn("day", F.to_date("ts")).write \
        .partitionBy("day").mode("overwrite").parquet(out)

    part = spark.read.parquet(out)
    from velesdb_spark.velesql.translator import Catalog
    cat = Catalog().register("events", part, partition_date_col="day")
    # the translator derives the day-bound automatically from the temporal
    # predicate when partition_date_col is declared
    pruned = translate(
        "SELECT event_id FROM events WHERE ts >= NOW() - INTERVAL '2 days' "
        "LIMIT 100000", cat, now_epoch=1706659200)  # 2024-01-31T00:00:00Z
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "2024-01-29" in plan
    # and the result equals the unpartitioned query
    base = translate(
        "SELECT event_id FROM events WHERE ts >= NOW() - INTERVAL '2 days' "
        "LIMIT 100000", Catalog().register("events", ev),
        now_epoch=1706659200)
    assert sorted(r.event_id for r in pruned.collect()) == \
        sorted(r.event_id for r in base.collect())


def test_groupby_nested_path_null_group(spark):
    """groupby_tests.rs:480-521 — GROUP BY metadata.source: docs whose
    nested path is missing consolidate into ONE NULL group whose
    COUNT(*) counts them; present values group normally. Also the
    round-8 _flat regression: the aggregated output column is literally
    named 'metadata.source', which the final projection / ORDER BY must
    reference backtick-quoted, not re-parse as struct access."""
    from velesdb_spark.velesql.translator import Catalog

    rows = [(1, ("web",)), (2, (None,)), (3, (None,)), (4, ("app",)),
            (5, ("web",))]
    df = spark.createDataFrame(
        rows, "id bigint, metadata struct<source: string>")
    cat = Catalog().register("events_m", df)
    out = translate(
        "SELECT metadata.source, COUNT(*) FROM events_m "
        "GROUP BY metadata.source ORDER BY COUNT(*) DESC", cat)
    assert out.columns == ["metadata.source", "count"]
    got = [(r["metadata.source"], r["count"]) for r in out.collect()]
    assert got == [(None, 2), ("web", 2), ("app", 1)] or \
        got == [("web", 2), (None, 2), ("app", 1)]
    # HAVING on an aggregate over a nested arg + ORDER BY nested key
    out2 = translate(
        "SELECT metadata.source FROM events_m "
        "GROUP BY metadata.source HAVING COUNT(*) > 1 "
        "ORDER BY metadata.source ASC", cat)
    vals = [r["metadata.source"] for r in out2.collect()]
    assert vals == [None, "web"] or vals == ["web", None]


def test_distinct_consolidates_nulls(spark):
    """distinct_tests.rs:203-238 — SELECT DISTINCT over a column where
    some rows lack the value: exactly one NULL row comes back alongside
    the distinct present values."""
    from velesdb_spark.velesql.translator import Catalog

    df = spark.createDataFrame(
        [(1, "A"), (2, None), (3, "A"), (4, None)],
        "id bigint, category string")
    cat = Catalog().register("products", df)
    out = translate("SELECT DISTINCT category FROM products", cat)
    got = sorted((r.category or "") for r in out.collect())
    assert got == ["", "A"]


def test_aggregate_params_resolved(spark):
    """aggregation_params_tests.rs:15-96 (Bug 5) — $params in the WHERE
    of an aggregate query must filter before aggregation, for both the
    flat and grouped forms."""
    from velesdb_spark.velesql.translator import Catalog

    df = spark.createDataFrame(
        [(1, "electronics", 100.0), (2, "electronics", 200.0),
         (3, "books", 50.0)],
        "id bigint, category string, price double")
    cat = Catalog().register("products", df)
    out = translate(
        "SELECT COUNT(*), SUM(price) FROM products WHERE category = $cat",
        cat, {"cat": "electronics"})
    row = out.collect()[0]
    assert out.columns == ["count", "sum_price"]
    assert row["count"] == 2 and abs(row["sum_price"] - 300.0) < 1e-9
    out2 = translate(
        "SELECT category, AVG(price) FROM products WHERE price > $min "
        "GROUP BY category", cat, {"min": 60.0})
    got = {r["category"]: r["avg_price"] for r in out2.collect()}
    assert got == {"electronics": 150.0}


def test_case_insensitive_keywords_execute_identically(catalog):
    """complex_parser_tests.rs:395-427 — keyword casing never changes
    the translated result."""
    variants = [
        "SELECT lang, COUNT(*) FROM documents "
        "GROUP BY lang HAVING COUNT(*) > 5 ORDER BY lang",
        "select lang, count(*) from documents "
        "group by lang having count(*) > 5 order by lang",
        "Select lang, Count(*) From documents "
        "Group By lang Having Count(*) > 5 Order By lang",
    ]
    results = [tuple(map(tuple, translate(v, catalog).collect()))
               for v in variants]
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0


def test_special_characters_in_string_literals(catalog):
    """complex_parser_tests.rs:462-466 — commas/bangs and doubled-quote
    escapes inside literals survive tokenization and compare correctly."""
    sdf = translate(
        "SELECT doc_id FROM documents WHERE source = 'no, match!' "
        "OR source = 'it''s absent' LIMIT 10", catalog)
    assert sdf.count() == 0
    sdf2 = translate(
        "SELECT doc_id, source FROM documents WHERE source = 'src3' "
        "OR source = 'no, match!' ORDER BY doc_id LIMIT 10", catalog)
    rows = sdf2.collect()
    assert rows and all(r["source"] == "src3" for r in rows)


# ---- reference-suite rotation, round 10: validation_parity_tests.rs ----

def _unit_vec(seed, dim=64):
    import math
    vals = [math.sin(seed * 131 + i * 17) for i in range(dim)]
    n = math.sqrt(sum(v * v for v in vals))
    return [v / n for v in vals]


def test_vector_types_or_metadata_all_accepted(catalog):
    """validation_parity_tests.rs:159-188 test_parity_all_vector_types
    _counted: a SINGLE vector-search condition (similarity / NEAR /
    NEAR_FUSED) OR a metadata comparison must pass validation for every
    vector type."""
    v = _unit_vec(7)
    for where in (
            "similarity(vector, $v) > 0.8 OR label = 3",
            "vector NEAR $v OR label = 3",
            "vector NEAR_FUSED [$v] USING FUSION 'average' OR label = 3"):
        df = translate(f"SELECT vec_id FROM embeddings WHERE {where} "
                       "LIMIT 5", catalog, {"v": v})
        assert df.count() > 0, where


def test_similarity_or_similarity_executes(catalog, duck):
    """validation_parity_tests.rs:127-146 rejects similarity() OR
    similarity() (the reference would need a union of two ANN searches).
    DOCUMENTED DIVERGENCE: here the disjunction is a single exact
    distributed filter, so it executes — and must match the SQL oracle."""
    a, b = _unit_vec(7), _unit_vec(11)

    def cos(v):
        num = " + ".join(f"embedding[{i+1}] * ({x!r})"
                         for i, x in enumerate(v))
        sq = " + ".join(f"embedding[{i+1}] * embedding[{i+1}]"
                        for i in range(len(v)))
        return f"(({num}) / sqrt({sq}))"

    sdf = translate(
        "SELECT vec_id FROM embeddings WHERE similarity(vector, $a) > 0.3 "
        "OR similarity(vector, $b) > 0.3 ORDER BY vec_id LIMIT 100000",
        catalog, {"a": a, "b": b})
    assert_matches_oracle(sdf, duck,
        f"SELECT vec_id FROM embeddings WHERE {cos(a)} > 0.3 "
        f"OR {cos(b)} > 0.3 ORDER BY vec_id LIMIT 100000")


def test_multiple_similarity_with_and_allowed(catalog):
    """validation_parity_tests.rs:105-125: similarity() AND similarity()
    is allowed (cascade) — parity on the accept side."""
    df = translate(
        "SELECT vec_id FROM embeddings WHERE similarity(vector, $a) > -0.5 "
        "AND similarity(vector, $b) > -0.5 LIMIT 5",
        catalog, {"a": _unit_vec(7), "b": _unit_vec(11)})
    assert df.count() > 0


def test_dimension_mismatch_rejected_eagerly(catalog):
    """E004 DimensionMismatch parity (error.rs): a query vector whose
    length differs from the collection's declared dim is rejected at
    translation — zip_with would otherwise score it silently wrong."""
    import pytest

    for sql in (
            "SELECT vec_id FROM embeddings WHERE vector NEAR $v LIMIT 5",
            "SELECT vec_id FROM embeddings "
            "WHERE similarity(vector, $v) > 0.1 LIMIT 5",
            "SELECT vec_id FROM embeddings "
            "ORDER BY similarity(vector, $v) DESC LIMIT 5",
            "SELECT vec_id FROM embeddings WHERE vector NEAR_FUSED [$v] "
            "USING FUSION 'average' LIMIT 5"):
        with pytest.raises(TranslationError) as ei:
            translate(sql, catalog, {"v": [1.0, 2.0, 3.0]})
        assert ei.value.code == "E004", sql
    # the declared dim passes
    assert translate(
        "SELECT vec_id FROM embeddings WHERE vector NEAR $v LIMIT 5",
        catalog, {"v": [0.1] * 64}).count() == 5


def test_secondary_vector_field_dim_not_enforced(spark):
    """The collection-level dim governs only the declared vector column
    (collection/types.rs: one dim per collection): ORDER BY
    similarity(other_vec, ...) over a secondary vector field of a
    DIFFERENT dimensionality must not raise E004."""
    df = spark.createDataFrame(
        [(1, [1.0] * 4, [1.0] * 2), (2, [0.5] * 4, [0.0, 1.0])],
        "id bigint, vector array<double>, thumb array<double>")
    cat = Catalog().register("t", df, dim=4)
    # declared column: wrong dim still rejected
    with pytest.raises(TranslationError) as ei:
        translate("SELECT id FROM t ORDER BY similarity(vector, $v) DESC "
                  "LIMIT 5", cat, {"v": [1.0, 2.0]})
    assert ei.value.code == "E004"
    # secondary field: 2-dim query vector against the 2-dim thumb passes
    rows = translate(
        "SELECT id FROM t ORDER BY similarity(thumb, $v) DESC LIMIT 5",
        cat, {"v": [1.0, 0.0]}).collect()
    assert [r.id for r in rows] == [1, 2]


def test_max_groups_non_integer_values_ignored(catalog):
    """extract_max_groups_limit honors WithValue::Integer ONLY — a
    string '3' or a float 3.0 is never coerced; the guard stays off (and
    a later integer-valued spelling in declaration order still wins)."""
    # string value: no guard, query runs
    assert translate(
        "SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey "
        "WITH (max_groups='3')", catalog).count() > 3
    # float value: ignored too
    assert translate(
        "SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey "
        "WITH (group_limit=3.0)", catalog).count() > 3
    # non-integer first spelling is skipped; the integer one still binds
    with pytest.raises(TranslationError, match="max_groups=3"):
        translate(
            "SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey "
            "WITH (max_groups='9', group_limit=3)", catalog)
