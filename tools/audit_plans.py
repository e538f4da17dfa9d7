"""Audit optimized plan shape of every registered query for red flags.

Usage: python tools/audit_plans.py <out.json> [sf_dir]

For each queries() entry: builds the DataFrame (no action beyond what
construction requires), renders the formatted plan, and records
counts of Exchange / Python-eval nodes / CartesianProduct / per-table
scan multiplicity plus plan size. Used to spot duplicate expensive
subtrees and boundary crossings (guide SS2, SS4).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from velesdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("velesdb-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    report = {}
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            report[name] = {"error": str(exc)[:200]}
            continue
        scans = re.findall(r"Scan parquet \[?[^\]\n ]*", plan)
        per_table = {}
        for s in scans:
            per_table[s] = per_table.get(s, 0) + 1
        report[name] = {
            "exchange": plan.count("Exchange"),
            "python": sum(plan.count(n) for n in (
                "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                "FlatMapGroupsInPandas", "MapInArrow")),
            "cartesian": plan.count("CartesianProduct"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "scan_total": len(scans),
            "scan_max_per_table": max(per_table.values()) if per_table else 0,
            "inmem": plan.count("InMemoryTableScan"),
            "plan_lines": plan.count("\n"),
        }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(f"wrote {out_path} ({len(report)} queries)")


if __name__ == "__main__":
    main()
