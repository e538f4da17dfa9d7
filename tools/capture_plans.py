"""Capture .explain("formatted") output for headline (or named) queries.

Usage: python tools/capture_plans.py <outdir> [suffix] [name1,name2,...]

Writes <outdir>/<query>_<suffix>.txt for each query (suffix defaults to
"before"). Pure plan capture: no actions are executed beyond what plan
construction itself requires (graph/BFS queries run their iterative
driver loop, which is part of plan construction for them).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from velesdb_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "groupby_agg", "tpch_q3", "having_filter", "join_two_dims",
    "scalar_subquery", "correlated_subquery", "knn_cosine", "batch_knn",
    "similarity_threshold", "bm25_topk", "hybrid_rrf",
    "graph_match_2hop", "graph_bfs", "minhash_first_hash",
    "ngram_jaccard", "exact_dedup", "events_hourly",
]


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = (sys.argv[3].split(",") if len(sys.argv) > 3 else HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("velesdb-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {exc}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
