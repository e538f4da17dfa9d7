"""Deterministic TPC-H-ish fixture generator — extends the driver's
testdata (TESTDATA.md / FIXTURES.md schemas) to scale factors the driver
did not materialize (sf1+), so the oracle sweep and bench can run at the
next data decade (round-5/6 verdict #1).

Matches /root/testdata/sf* in schema, value ranges, and scaling rules
(measured from the driver's sf0.001/0.01/0.1 files):

  rows(sf): customer 150k*sf, supplier 10k*sf, part 200k*sf,
  orders 1.5M*sf, lineitem ~4.07/order (per-order fanout 1..7),
  events 1M*sf (users = customers/10), documents max(500, 50k*sf),
  embeddings max(500, 20k*sf); region/nation fixed.

Seeded per (table, chunk) so tables generate independently, chunked so
sf1 (~6.1M lineitem) stays in bounded memory, written as one parquet
file per table via pyarrow (row groups per chunk). NOT for regenerating
/root/testdata (read-only, driver-owned) — writes to a caller-given dir.

Usage: python tools/gen_testdata.py <out_dir> <sf> [--seed 42]
         [--docs-vocab closed|zipf] [--tables t1,t2,...]

``--docs-vocab zipf`` switches the documents table to an OPEN
vocabulary: word ranks drawn from a Zipf(1.3) power law (unbounded
tail, word "w{rank}"), the real-web-corpus shape where most shingles
are rare (df ≈ 1) — the regime the prefix-filtering dedup join is
built for, which the closed 31-word vocabulary cannot exhibit (its
rarest bigram still has df ≈ 88 at sf1). ``--tables`` restricts
generation to the named tables (e.g. only documents for dedup
benches).
"""

from __future__ import annotations

import os
import sys

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
CHUNK = 1_000_000

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ADJECTIVES = ["small", "red", "blue", "hot", "old", "large", "new", "cold"]
NOUNS = ["widget", "gizmo", "anvil", "bolt", "plate", "rod", "ring", "gear"]
PTYPES = ["STANDARD", "LARGE", "MEDIUM", "SMALL", "PROMO", "ECONOMY"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
DOC_VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data",
             "dup", "fast", "filter", "group", "hash", "join", "key",
             "line", "merge", "order", "part", "query", "row", "scan",
             "slow", "small", "sort", "spark", "stream", "table", "the",
             "value", "vector", "window"]
LANGS = ["en", "zh", "es", "de", "fr"]
LANG_W = [0.44, 0.15, 0.145, 0.14, 0.125]

DAY_US = 86_400_000_000
EPOCH_1995 = np.datetime64("1995-01-01", "us").astype("int64")
ORDER_DAYS = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")) \
    .astype("timedelta64[D]").astype("int64")
EV_START = np.datetime64("2024-01-01", "us").astype("int64")
EV_SPAN_US = 30 * DAY_US
EMB_DIM = 64
N_CLUSTERS = 10


def _rng(table: str, chunk: int = 0) -> np.random.Generator:
    # zlib.crc32, NOT hash(): str hash is salted per-process and would
    # break run-to-run determinism
    return np.random.default_rng(
        [SEED, zlib.crc32(table.encode()) & 0x7FFFFFFF, chunk])


def counts(sf: float) -> dict[str, int]:
    return {
        "customer": int(150_000 * sf),
        "supplier": int(10_000 * sf),
        "part": int(200_000 * sf),
        "orders": int(1_500_000 * sf),
        "events": int(1_000_000 * sf),
        "documents": max(500, int(50_000 * sf)),
        "embeddings": max(500, int(20_000 * sf)),
    }


def _ts_us(int64_us: np.ndarray) -> pa.Array:
    return pa.array(int64_us, type=pa.timestamp("us"))


def _write(out_dir: str, name: str, batches) -> int:
    path = os.path.join(out_dir, f"{name}.parquet")
    writer, total = None, 0
    for batch in batches:
        tbl = pa.table(batch)
        if writer is None:
            writer = pq.ParquetWriter(path, tbl.schema)
        writer.write_table(tbl)
        total += tbl.num_rows
    writer.close()
    print(f"  {name}: {total} rows")
    return total


def gen_region(out_dir):
    _write(out_dir, "region", [{
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS}])


def gen_nation(out_dir):
    _write(out_dir, "nation", [{
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}])


def gen_customer(out_dir, n):
    def batches():
        for lo in range(0, n, CHUNK):
            hi = min(lo + CHUNK, n)
            r = _rng("customer", lo)
            ids = np.arange(lo, hi, dtype=np.int64)
            yield {
                "c_custkey": ids,
                "c_name": [f"Customer#{i:09d}" for i in ids],
                "c_nationkey": pa.array(
                    r.integers(0, 25, hi - lo), pa.int32()),
                "c_acctbal": np.round(
                    r.uniform(-1000.0, 10000.0, hi - lo), 2),
                "c_mktsegment": [SEGMENTS[j] for j in
                                 r.integers(0, 5, hi - lo)],
            }
    _write(out_dir, "customer", batches())


def gen_supplier(out_dir, n):
    r = _rng("supplier")
    ids = np.arange(n, dtype=np.int64)
    _write(out_dir, "supplier", [{
        "s_suppkey": ids,
        "s_name": [f"Supplier#{i:09d}" for i in ids],
        "s_nationkey": pa.array(r.integers(0, 25, n), pa.int32()),
        "s_acctbal": np.round(r.uniform(-1000.0, 10000.0, n), 2)}])


def gen_part(out_dir, n):
    def batches():
        for lo in range(0, n, CHUNK):
            hi = min(lo + CHUNK, n)
            r = _rng("part", lo)
            ids = np.arange(lo, hi, dtype=np.int64)
            adj = r.integers(0, len(ADJECTIVES), hi - lo)
            noun = r.integers(0, len(NOUNS), hi - lo)
            yield {
                "p_partkey": ids,
                "p_name": [f"{ADJECTIVES[a]} {NOUNS[b]}"
                           for a, b in zip(adj, noun)],
                "p_brand": [f"Brand#{j}" for j in
                            r.integers(1, 26, hi - lo)],
                "p_type": [PTYPES[j] for j in
                           r.integers(0, len(PTYPES), hi - lo)],
                "p_size": pa.array(r.integers(1, 51, hi - lo), pa.int32()),
                # driver pattern: 900.0 + 0.1*k cycling within [900, 1000)
                "p_retailprice": np.round(900.0 + (ids % 1000) * 0.1, 2),
            }
    _write(out_dir, "part", batches())


def _order_dates(n_orders: int) -> np.ndarray:
    """Day-granular o_orderdate for ALL orders, one deterministic draw —
    regenerated identically by gen_lineitem for shipdate correlation."""
    r = _rng("orderdates")
    return EPOCH_1995 + r.integers(0, ORDER_DAYS + 1, n_orders) * DAY_US


def _line_fanout(n_orders: int) -> np.ndarray:
    """Per-order lineitem count 1..7 (driver avg ~4.07/order)."""
    r = _rng("fanout")
    return r.integers(1, 8, n_orders)


def gen_orders(out_dir, n, n_cust):
    dates = _order_dates(n)

    def batches():
        for lo in range(0, n, CHUNK):
            hi = min(lo + CHUNK, n)
            r = _rng("orders", lo)
            ids = np.arange(lo, hi, dtype=np.int64)
            yield {
                "o_orderkey": ids,
                "o_custkey": r.integers(0, n_cust, hi - lo),
                "o_orderstatus": [("P", "O", "F")[j] for j in
                                  r.integers(0, 3, hi - lo)],
                "o_totalprice": np.round(
                    r.uniform(1000.0, 500000.0, hi - lo), 2),
                "o_orderdate": _ts_us(dates[lo:hi]),
                "o_orderpriority": [PRIORITIES[j] for j in
                                    r.integers(0, 5, hi - lo)],
            }
    _write(out_dir, "orders", batches())


def gen_lineitem(out_dir, n_orders, n_part, n_supp):
    dates = _order_dates(n_orders)
    fan = _line_fanout(n_orders)
    order_chunk = max(1, CHUNK // 4)  # ~4 lines/order → ~CHUNK rows/batch

    def batches():
        for lo in range(0, n_orders, order_chunk):
            hi = min(lo + order_chunk, n_orders)
            r = _rng("lineitem", lo)
            f = fan[lo:hi]
            m = int(f.sum())
            okey = np.repeat(np.arange(lo, hi, dtype=np.int64), f)
            # l_linenumber: 1..count within each order
            linenum = (np.arange(m, dtype=np.int64)
                       - np.repeat(np.cumsum(f) - f, f) + 1)
            odate = np.repeat(dates[lo:hi], f)
            yield {
                "l_orderkey": okey,
                "l_partkey": r.integers(0, n_part, m),
                "l_suppkey": r.integers(0, n_supp, m),
                "l_linenumber": pa.array(linenum, pa.int32()),
                "l_quantity": r.integers(1, 51, m).astype(np.float64),
                "l_extendedprice": np.round(
                    r.uniform(900.0, 105000.0, m), 2),
                "l_discount": np.round(r.integers(0, 11, m) * 0.01, 2),
                "l_tax": np.round(r.integers(0, 9, m) * 0.01, 2),
                "l_returnflag": [("A", "N", "R")[j] for j in
                                 r.integers(0, 3, m)],
                "l_linestatus": [("F", "O")[j] for j in
                                 r.integers(0, 2, m)],
                "l_shipdate": _ts_us(odate + r.integers(1, 96, m) * DAY_US),
            }
    _write(out_dir, "lineitem", batches())


def gen_events(out_dir, n, n_users):
    # ts ascending with event_id (driver invariant: lag(ts) over
    # (order by event_id) is monotone) — draw uniform offsets, sort
    def batches():
        r = _rng("events")
        offs = np.sort(r.integers(0, EV_SPAN_US, n))
        for lo in range(0, n, CHUNK):
            hi = min(lo + CHUNK, n)
            rc = _rng("events", lo + 1)
            m = hi - lo
            yield {
                "event_id": np.arange(lo, hi, dtype=np.int64),
                "ts": _ts_us(EV_START + offs[lo:hi]),
                "user_id": rc.integers(0, n_users, m),
                "event_type": [EVENT_TYPES[j] for j in
                               rc.integers(0, 5, m)],
                "value": np.round(
                    np.maximum(rc.exponential(50.0, m), 0.01), 2),
                "props": [f'{{"k": {k}}}' for k in
                          rc.integers(0, 100, m)],
            }
    _write(out_dir, "events", batches())


def gen_documents(out_dir, n, vocab="closed"):
    def batches():
        for lo in range(0, n, 100_000):
            hi = min(lo + 100_000, n)
            r = _rng("documents", lo)
            texts, langs, sources = [], [], []
            for i in range(lo, hi):
                nw = int(r.integers(10, 100))
                if vocab == "zipf":
                    # open vocabulary: unbounded power-law ranks; the
                    # head ("w1", "w2", …) gives common shingles, the
                    # tail gives df≈1 shingles — both regimes present
                    ranks = r.zipf(1.3, nw)
                    texts.append(" ".join(f"w{rk}" for rk in ranks))
                    langs.append(LANGS[int(r.choice(5, p=LANG_W))])
                    sources.append(f"src{int(r.integers(0, 20))}")
                    continue
                words = r.integers(0, len(DOC_VOCAB), nw)
                texts.append(" ".join(DOC_VOCAB[w] for w in words))
                langs.append(LANGS[int(r.choice(5, p=LANG_W))])
                sources.append(f"src{int(r.integers(0, 20))}")
            yield {
                "doc_id": np.arange(lo, hi, dtype=np.int64),
                "text": texts,
                "lang": langs,
                "source": sources,
                "n_chars": np.array([len(t) for t in texts],
                                    dtype=np.int64),
            }
    _write(out_dir, "documents", batches())


def gen_embeddings(out_dir, n):
    # 10 loose clusters on the unit sphere (driver: cos-to-centroid
    # ≈ 0.14) — near-dup gates synthesize their own duplicates, so the
    # fixture only needs cluster structure, not planted pairs
    rc = _rng("emb_centers")
    centers = rc.standard_normal((N_CLUSTERS, EMB_DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    alpha = 0.141  # cos-to-centroid mean ≈ alpha/sqrt(alpha²+1) ≈ 0.14

    def batches():
        for lo in range(0, n, 200_000):
            hi = min(lo + 200_000, n)
            r = _rng("embeddings", lo)
            m = hi - lo
            labels = r.integers(0, N_CLUSTERS, m)
            g = r.standard_normal((m, EMB_DIM)) / np.sqrt(EMB_DIM)
            v = g + alpha * centers[labels]
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            v = v.astype(np.float32)
            yield {
                "vec_id": np.arange(lo, hi, dtype=np.int64),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(v.reshape(-1)), EMB_DIM).cast(
                        pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
    _write(out_dir, "embeddings", batches())


def main():
    global SEED
    args = [a for a in sys.argv[1:]]
    vocab, only = "closed", None
    if "--seed" in args:
        i = args.index("--seed")
        SEED = int(args[i + 1])
        del args[i:i + 2]
    if "--docs-vocab" in args:
        i = args.index("--docs-vocab")
        vocab = args[i + 1]
        del args[i:i + 2]
        if vocab not in ("closed", "zipf"):
            print("--docs-vocab must be closed or zipf")
            sys.exit(2)
    if "--tables" in args:
        i = args.index("--tables")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    out_dir, sf = args[0], float(args[1])
    os.makedirs(out_dir, exist_ok=True)
    c = counts(sf)
    print(f"generating sf={sf} into {out_dir} "
          f"(seed={SEED}, vocab={vocab}, tables={only or 'all'})")

    def want(t):
        return only is None or t in only

    if want("region"):
        gen_region(out_dir)
    if want("nation"):
        gen_nation(out_dir)
    if want("customer"):
        gen_customer(out_dir, c["customer"])
    if want("supplier"):
        gen_supplier(out_dir, c["supplier"])
    if want("part"):
        gen_part(out_dir, c["part"])
    if want("orders"):
        gen_orders(out_dir, c["orders"], c["customer"])
    if want("lineitem"):
        gen_lineitem(out_dir, c["orders"], c["part"], c["supplier"])
    if want("events"):
        gen_events(out_dir, c["events"], max(1, c["customer"] // 10))
    if want("documents"):
        gen_documents(out_dir, c["documents"], vocab)
    if want("embeddings"):
        gen_embeddings(out_dir, c["embeddings"])
    print("done")


if __name__ == "__main__":
    main()
