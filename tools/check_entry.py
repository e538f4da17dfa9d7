"""Local mini-driver: run every __spark_entry__ query against its DuckDB
oracle (row count + column names + order-insensitive values) at a given SF.

Usage: python tools/check_entry.py [sf_dir] [name1,name2,...]
(the optional second arg restricts the sweep to the named queries)
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from velesdb_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 6) + 0.0
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        return v

    return sorted(tuple(norm(v) for v in r) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("check-entry", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if len(sys.argv) > 2:
        only = set(sys.argv[2].split(","))
        missing = only - set(qs)
        if missing:
            print(f"unknown queries: {sorted(missing)}")
            sys.exit(2)
        qs = {k: v for k, v in qs.items() if k in only}
    ok = bad = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = [c.lower() for c in sdf.columns]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc(limit=3)
            bad += 1
            continue
        if name not in oracles:
            print(f"okNR {name}: rows={len(srows)} (no oracle) {time.time()-t0:.1f}s")
            ok += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0].lower() for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            bad += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            bad += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}")
            bad += 1
            continue
        sc, oc = canon(srows), canon(orows)
        if sc != oc:
            diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {diff}")
            bad += 1
            continue
        print(f"ok   {name}: rows={len(srows)} {time.time()-t0:.1f}s")
        ok += 1

    # smoke entry()
    try:
        e = entry_mod.entry(spark)
        n = len(e.collect())
        print(f"ok   entry(): rows={n}")
    except Exception:
        print("FAIL entry()")
        traceback.print_exc(limit=3)
        bad += 1
    print(f"\n{ok} ok, {bad} failed")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
