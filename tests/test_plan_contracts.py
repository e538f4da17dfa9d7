"""Plan-shape contracts for the round-10 optimizer-fence fixes.

Four independent 10-700x slowdowns shared one cause (PARITY.md round-10
table): Catalyst rewrites (CollapseProject alias substitution, filter
pushdown, InferFiltersFromGenerate) DUPLICATED an expensive derived
expression — higher-order-function copies get fresh lambda-variable ids
so codegen CSE can never dedup them, and pushed copies land BELOW the
parallelizing repartition (single-file scan = 1-2 splits). The fixes are
contracts about OPTIMIZER BEHAVIOR, not semantics — a Spark upgrade
could silently reintroduce the class (e.g. constant-fold the rand()*0
fence, or re-enable the excluded rule). These tests pin the optimized
plan shape per fenced operator:

1. the expensive expression appears exactly N times (one per scan branch),
2. never inside a Filter node (filters read the materialized attribute),
3. each occurrence sits ABOVE the parallelizing Repartition on its branch,
4. the nondeterminism fence survives optimization where one is used.
"""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: the tokenize/shingle pipeline head (functions/dedup.py _shingles /
#: text_analysis tokenization) — the expensive HOF the class duplicated
TOKENIZE = "split(lower("


def _olines(df):
    return df._jdf.queryExecution().optimizedPlan().toString().splitlines()


def _node(line: str) -> str:
    """Strip tree-drawing prefixes (':- ', '+- ', ': ', indent)."""
    return line.lstrip(" :+-")


def _assert_expensive_above_exchange(lines, pattern, expect_count,
                                     forbid_in=("Filter", "Sort", "Join")):
    """The shared contract: `pattern` occurs exactly expect_count times,
    never in a Filter/Sort/Join node, and between each occurrence and its
    leaf Relation there is a Repartition (the expensive node evaluates
    once, after the parallelizing exchange)."""
    hits = [i for i, l in enumerate(lines) if pattern in l]
    assert len(hits) == expect_count, \
        (f"{pattern!r} appears {len(hits)}x, expected {expect_count} — an "
         f"optimizer rewrite duplicated the expensive expression:\n"
         + "\n".join(lines))
    for i in hits:
        node = _node(lines[i])
        for bad in forbid_in:
            assert not node.startswith(bad), \
                (f"{pattern!r} inlined into a {bad} node (line {i}) — the "
                 f"{bad.lower()} must read the materialized attribute:\n"
                 + "\n".join(lines))
        # walk down this branch to the leaf; a Repartition must separate
        # the expensive node from the scan
        below = []
        for j in range(i + 1, len(lines)):
            below.append(_node(lines[j]))
            if below[-1].startswith("Relation"):
                break
        assert any(b.startswith("Repartition") for b in below), \
            (f"{pattern!r} (line {i}) sits on the scan with no Repartition "
             f"below it — it would run on the file's 1-2 splits:\n"
             + "\n".join(lines))


@pytest.fixture(scope="module")
def gate_queries():
    import __spark_entry__ as e

    return e.queries()


def test_fuzzy_trigram_plan_contract(spark, gate_queries):
    """trigram.py:67-87: ONE score projection (array_intersect) above the
    Repartition; the filter and top-k sort read the score attribute; the
    rand()*0 fence survives optimization (if a future Spark constant-
    folds it, pushdown re-inlines the score below the exchange and this
    fails)."""
    lines = _olines(gate_queries["fuzzy_trigram"](spark, SF_DIR))
    _assert_expensive_above_exchange(lines, "array_intersect", 1)
    assert sum("rand(" in l for l in lines) >= 1, \
        "the rand()*0 fence was folded away:\n" + "\n".join(lines)


def test_quality_prune_plan_contract(spark, gate_queries):
    """__spark_entry__ _quality_prune: the quality_score expression
    evaluates once per scan branch (threshold branch + keep branch),
    each above its Repartition; the inferred isnotnull constraint reads
    the fenced attribute, never the full expression."""
    lines = _olines(gate_queries["quality_prune"](spark, SF_DIR))
    _assert_expensive_above_exchange(lines, TOKENIZE, 2)
    assert sum("rand(" in l for l in lines) >= 1


def test_span_dedup_plan_contract(spark, gate_queries):
    """packing.py dedup_spans: the token-block posexplode evaluates the
    tokenize pipeline once per side of the first-occurrence self-join,
    above the Repartition; no filter inlines it (the excluded
    InferFiltersFromGenerate would have added size(tokenize(...))>0
    below the exchange)."""
    lines = _olines(gate_queries["span_dedup"](spark, SF_DIR))
    _assert_expensive_above_exchange(lines, TOKENIZE, 2)


def test_decontam_plan_contract(spark, gate_queries):
    """decontam.py: session.py excludes InferFiltersFromGenerate — the
    rule inferred size(shingles(text))>0 from the explode and pushed a
    full shingle-pipeline copy below the repartition (91 s -> 6.7 s at
    sf1). Pin the exclusion AND the resulting shape: one tokenize per
    corpus branch (train + eval), none inside a Filter."""
    excluded = spark.conf.get("spark.sql.optimizer.excludedRules", "")
    assert "InferFiltersFromGenerate" in excluded
    lines = _olines(gate_queries["decontam_clean"](spark, SF_DIR))
    _assert_expensive_above_exchange(lines, TOKENIZE, 2)


def test_minhash_signature_plan_contract(spark, gate_queries):
    """dedup.py:102-175 postings-style minhash: the shingle pipeline
    materializes ONCE above the Repartition; the per-seed min-hash
    transform reads the shingle ATTRIBUTE (multi-referencing an
    attribute is free; an inlineable aliased HOF expression is not —
    the collapsed mega-expression cost ~32 ms/doc, ~700x)."""
    lines = _olines(gate_queries["minhash_first_hash"](spark, SF_DIR))
    _assert_expensive_above_exchange(lines, TOKENIZE, 1)


def test_minhash_banding_plan_contract(spark):
    """dedup.py:134-189 banded LSH candidates: the tokenize+shingle
    pipeline appears once per self-join side (2 scans), each above its
    Repartition; the per-seed min-aggregate reads the EXPLODED shingle
    attribute and the band explode reads the min ATTRIBUTES — no node
    re-derives the pipeline. (dedup_clusters itself checkpoints eagerly
    for the CC loop, so the contract is pinned on the lazy candidate
    generator the cluster gates consume.)"""
    from velesdb_spark.functions import staging
    from velesdb_spark.functions.dedup import minhash_lsh_candidates

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    try:
        cand = minhash_lsh_candidates(docs, text_col="text", id_col="doc_id")
        lines = _olines(cand)
        _assert_expensive_above_exchange(lines, TOKENIZE, 2)
        # the min-agg consumes the exploded attribute, not the pipeline:
        # every Aggregate node is tokenize-free (checked by the contract)
        # and sits above a Generate explode of the shingle attribute
        agg_lines = [i for i, l in enumerate(lines)
                     if _node(l).startswith("Aggregate") and "min(" in l]
        assert agg_lines, "postings min-aggregate missing:\n" + "\n".join(lines)
        for i in agg_lines:
            assert _node(lines[i + 1]).startswith("Generate explode"), \
                "min-agg not fed by the shingle explode:\n" + "\n".join(lines)
    finally:
        staging.release_staged()


def test_infer_generate_filters_escape_hatch(spark):
    """session.py's InferFiltersFromGenerate exclusion is a choice, not a
    trap: infer_generate_filters_enabled() re-enables the rule for one
    query — an explode over a genuinely empty-heavy STORED array gets
    its inferred size(e)>0 row-skip back — and restores the exclusion on
    exit (even on error)."""
    from velesdb_spark.session import (_INFER_GENERATE_RULE,
                                       infer_generate_filters_enabled)

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)],
        "id bigint, tags array<string>")

    def _explode_plan():
        from pyspark.sql import functions as F

        return df.select("id", F.explode("tags").alias("t")) \
            ._jdf.queryExecution().optimizedPlan().toString()

    # excluded (default): no inferred size filter
    assert "size(" not in _explode_plan()
    with infer_generate_filters_enabled(spark):
        assert _INFER_GENERATE_RULE not in spark.conf.get(
            "spark.sql.optimizer.excludedRules", "")
        # rule back on: the inferred size(tags)>0 filter appears
        assert "size(" in _explode_plan()
    # restored after the block
    assert _INFER_GENERATE_RULE in spark.conf.get(
        "spark.sql.optimizer.excludedRules", "")
    assert "size(" not in _explode_plan()
    # restored on error too
    with pytest.raises(RuntimeError):
        with infer_generate_filters_enabled(spark):
            raise RuntimeError("boom")
    assert _INFER_GENERATE_RULE in spark.conf.get(
        "spark.sql.optimizer.excludedRules", "")


def test_rrf_pooled_single_recon_pass_contract(spark, gate_queries):
    """apply_rrf_pooled (translator.py): rank reconstruction for ALL m
    fusion components must run as ONE scored pass joined against the
    component-tagged threshold union — exactly one
    BroadcastNestedLoopJoin in the physical plan (the per-component loop
    planned m of them, each re-scanning the scored relation). Guards the
    r11 merge so a refactor can't silently reintroduce the m passes."""
    import re

    from velesdb_spark.functions.staging import release_staged

    try:
        df = gate_queries["near_fused_rrf"](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        bnlj = set(re.findall(r"\((\d+)\) BroadcastNestedLoopJoin", plan))
        assert len(bnlj) == 1, \
            f"expected 1 unique BNLJ (merged recon pass), got {len(bnlj)}"
    finally:
        release_staged()
