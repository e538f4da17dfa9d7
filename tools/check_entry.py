"""Local mini-driver: run every __spark_entry__ query against its DuckDB
oracle (row count + column names + order-insensitive values) at a given SF.

Usage: python tools/check_entry.py [sf_dir] [name1,name2,...] [--json out.json]
(the optional second arg restricts the sweep to the named queries; --json
writes a CORRECTNESS-shaped record per query for committed evidence)
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

    # sort key stringifies so rows containing NULLs (unorderable against
    # str/int in Python) still canonicalize deterministically
    return sorted((tuple(norm(v) for v in r) for r in rows),
                  key=lambda t: tuple(repr(v) for v in t))


def main():
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    sys.argv = [sys.argv[0]] + args
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
    records: dict = {}

    def rec(name, **kw):
        base = {"rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": None, "oracle_rows": None, "err": None,
                "sec": None}
        base.update(kw)
        records[name] = base

    from velesdb_spark.functions.dedup import release_staged

    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = [c.lower() for c in sdf.columns]
            release_staged()  # free any shingle caches the query persisted
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc(limit=3)
            rec(name, err="spark error", sec=round(time.time() - t0, 1))
            bad += 1
            continue
        if name not in oracles:
            dt = round(time.time() - t0, 1)
            print(f"okNR {name}: rows={len(srows)} (no oracle) {dt}s")
            rec(name, rows_match=True, spark_rows=len(srows),
                err="rows-only (no oracle)", sec=dt)
            ok += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0].lower() for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            rec(name, err=f"oracle error: {e}", spark_rows=len(srows),
                sec=round(time.time() - t0, 1))
            bad += 1
            continue
        dt = round(time.time() - t0, 1)
        rows_match = len(srows) == len(orows)
        schema_match = scols == ocols
        hash_match = None
        if not schema_match:
            print(f"FAIL {name}: columns {scols} vs {ocols}")
        elif not rows_match:
            print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}")
        else:
            sc, oc = canon(srows), canon(orows)
            hash_match = sc == oc
            if not hash_match:
                diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
                print(f"FAIL {name}: values differ, e.g. {diff}")
        rec(name, rows_match=rows_match, schema_match=schema_match,
            hash_match=hash_match, spark_rows=len(srows),
            oracle_rows=len(orows), sec=dt)
        if schema_match and rows_match and hash_match:
            print(f"ok   {name}: rows={len(srows)} {dt}s")
            ok += 1
        else:
            bad += 1

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
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "queries": records}, f, indent=1)
        print(f"wrote {json_out}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
