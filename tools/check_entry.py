"""Local mini-driver: run every __spark_entry__ query against its DuckDB
oracle (row count + column names + order-insensitive values) at a given SF.

Usage: python tools/check_entry.py [sf_dir] [name1,name2,...]
           [--json out.json] [--strict] [--lint-only]

- The optional second arg restricts the sweep to the named queries.
- --json writes a CORRECTNESS-shaped record per query for committed evidence.
- Oracle TYPE LINT (always on): every oracle is DESCRIBEd and any output
  column whose DuckDB type is HUGEINT / UHUGEINT / DECIMAL / UBIGINT fails
  the query outright — those export to Arrow as int128/decimal128/uint64 and
  the driver's hasher renders them differently from Spark's bigint/double
  even when every value is numerically equal (the exact defect behind the
  three round-8 driver-reds). Wrap such sums in CAST(... AS BIGINT) or
  CAST(... AS DOUBLE) in the oracle SQL.
- --strict compares at the driver's fidelity: DuckDB's Arrow result vs
  Spark's Arrow result, dtype-class-sensitive, floats compared bit-exact
  (no round(v, 6) masking). Use for committed evidence sweeps.
- --lint-only runs only the DESCRIBE lint over all selected oracles (no
  Spark execution; seconds, not minutes).
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


# DuckDB output types that export to Arrow as int128 / decimal128 / uint64 —
# value-equal to Spark's bigint/double yet hashed differently by the driver.
_BANNED_TYPE_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT")


def lint_oracle(con, sql):
    """DESCRIBE the oracle; return a list of 'col: TYPE' offenders."""
    desc = con.execute("DESCRIBE " + sql).fetchall()
    return [f"{col}: {typ}" for col, typ, *_ in desc
            if typ.upper().startswith(_BANNED_TYPE_PREFIXES)]


def _dtype_class(t):
    """Canonical dtype class for an Arrow type: catches int-vs-decimal /
    int-vs-float drift while ignoring benign string/large_string and
    tz-annotation differences between the two engines' Arrow exports."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return f"list<{_dtype_class(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{_dtype_class(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def _strict_norm(v):
    """Normalize one Arrow-pylist value for strict compare: tz-aware
    timestamps to naive UTC, lists to tuples, floats kept bit-exact."""
    import datetime
    import math as _m

    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    if isinstance(v, list):
        return tuple(_strict_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _strict_norm(x)) for k, x in v.items()))
    if isinstance(v, float) and _m.isnan(v):
        return "NaN"
    return v


def strict_compare(spark_tbl, oracle_tbl):
    """Driver-fidelity compare of two Arrow tables (columns sorted by name,
    rows order-insensitive). Returns (ok, reason)."""
    s_names = sorted(n.lower() for n in spark_tbl.column_names)
    o_names = sorted(n.lower() for n in oracle_tbl.column_names)
    if s_names != o_names:
        return False, f"columns {s_names} vs {o_names}"
    lower_s = {n.lower(): n for n in spark_tbl.column_names}
    lower_o = {n.lower(): n for n in oracle_tbl.column_names}
    for n in s_names:
        st = spark_tbl.schema.field(lower_s[n]).type
        ot = oracle_tbl.schema.field(lower_o[n]).type
        sc, oc = _dtype_class(st), _dtype_class(ot)
        # an all-NULL oracle column (e.g. empty result) is typed null by
        # duckdb's arrow export; treat as wildcard
        if sc != oc and "null" not in (sc, oc):
            return False, f"dtype[{n}]: spark {sc} ({st}) vs oracle {oc} ({ot})"
    srows = [tuple(_strict_norm(r[lower_s[n]]) for n in s_names)
             for r in spark_tbl.to_pylist()]
    orows = [tuple(_strict_norm(r[lower_o[n]]) for n in s_names)
             for r in oracle_tbl.to_pylist()]
    key = lambda t: tuple(repr(v) for v in t)  # noqa: E731
    srows.sort(key=key)
    orows.sort(key=key)
    if srows != orows:
        diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        return False, f"strict values differ, e.g. {diff}"
    return True, ""


def main():
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    strict = "--strict" in args
    if strict:
        args.remove("--strict")
    lint_only = "--lint-only" in args
    if lint_only:
        args.remove("--lint-only")
    sys.argv = [sys.argv[0]] + args
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
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

    if lint_only:
        nbad = 0
        for name in qs:
            if name not in oracles:
                continue
            try:
                offenders = lint_oracle(con, oracles[name])
            except Exception as e:
                print(f"LINT-ERR {name}: {e}")
                nbad += 1
                continue
            if offenders:
                print(f"LINT {name}: {offenders}")
                nbad += 1
        print(f"lint: {nbad} offender(s) in {len(qs)} queries")
        sys.exit(1 if nbad else 0)

    spark = get_spark("check-entry", cpus=8)
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
            if strict:
                stbl = sdf.toArrow()
                n_spark = stbl.num_rows
                scols = [c.lower() for c in stbl.column_names]
            else:
                srows = [tuple(r) for r in sdf.collect()]
                n_spark = len(srows)
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
            print(f"okNR {name}: rows={n_spark} (no oracle) {dt}s")
            rec(name, rows_match=True, spark_rows=n_spark,
                err="rows-only (no oracle)", sec=dt)
            ok += 1
            continue
        try:
            offenders = lint_oracle(con, oracles[name])
        except Exception as e:
            offenders = []
            print(f"warn {name}: DESCRIBE lint failed: {e}")
        if offenders:
            print(f"FAIL {name}: oracle type lint {offenders}")
            rec(name, err=f"oracle type lint: {offenders}",
                spark_rows=n_spark, sec=round(time.time() - t0, 1))
            bad += 1
            continue
        try:
            res = con.execute(oracles[name])
            if strict:
                otbl = res.arrow()
            else:
                ocols = [d[0].lower() for d in res.description]
                orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            rec(name, err=f"oracle error: {e}", spark_rows=n_spark,
                sec=round(time.time() - t0, 1))
            bad += 1
            continue
        dt = round(time.time() - t0, 1)
        if strict:
            n_oracle = otbl.num_rows
            rows_match = n_spark == n_oracle
            schema_match = scols == [c.lower() for c in otbl.column_names]
            hash_match = None
            if not rows_match or not schema_match:
                print(f"FAIL {name}: rows {n_spark} vs {n_oracle} / "
                      f"columns {scols} vs {otbl.column_names}")
            else:
                hash_match, reason = strict_compare(stbl, otbl)
                if not hash_match:
                    print(f"FAIL {name}: {reason}")
            rec(name, rows_match=rows_match, schema_match=schema_match,
                hash_match=hash_match, spark_rows=n_spark,
                oracle_rows=n_oracle, sec=dt, strict=True)
            if rows_match and schema_match and hash_match:
                print(f"ok   {name}: rows={n_spark} {dt}s (strict)")
                ok += 1
            else:
                bad += 1
            continue
        rows_match = n_spark == len(orows)
        schema_match = scols == ocols
        hash_match = None
        if not schema_match:
            print(f"FAIL {name}: columns {scols} vs {ocols}")
        elif not rows_match:
            print(f"FAIL {name}: rows {n_spark} vs {len(orows)}")
        else:
            sc, oc = canon(srows), canon(orows)
            hash_match = sc == oc
            if not hash_match:
                diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
                print(f"FAIL {name}: values differ, e.g. {diff}")
        rec(name, rows_match=rows_match, schema_match=schema_match,
            hash_match=hash_match, spark_rows=n_spark,
            oracle_rows=len(orows), sec=dt)
        if schema_match and rows_match and hash_match:
            print(f"ok   {name}: rows={n_spark} {dt}s")
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
