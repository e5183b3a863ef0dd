"""Generate an sf1.0-LIKE dataset for LOCAL measurement only.

The driver generates its own sf1.0 at measurement time; this script
reproduces the *structural* properties that drive query cost (row counts,
key cardinalities, value distributions, vocabulary, near-dup structure,
single-row-group-per-million-rows parquet layout) so optimizations can be
measured at the driver's scale before the driver runs. It is NOT
byte-identical to the driver's data and is never used for correctness
oracles (those run at sf0.01 against /root/testdata).

Structural facts mirrored from /root/testdata/sf{0.001,0.01,0.1}:
  - scaling: lineitem 6k/60k/600k -> 6M; orders x10 of that /4; events
    1k/10k/100k -> 1M; documents 500/500/5000 -> 50k; embeddings
    500/500/2000 -> 20k; customer 150/1.5k/15k -> 150k; users = customers/10
  - documents: 31-word vocabulary, 10..100 words/doc uniform, lang
    {en 41%, zh/es/fr/de ~15%}, source src0..src19 round-robin,
    ~0.16% exact-dup texts, planted near-dup (mutated-copy) pairs at a
    rate that reproduces ~linear growth of the jaccard>=0.5 pair set
  - embeddings: iid Gaussian unit vectors (the sf0.1 cosine histogram is
    exactly the random-unit-vector Beta tail: 920 pairs >=0.4 at n=2000)
  - events: 30-day exponential-gap timeline, value ~ Exp(mean 50)
    rounded, event_type uniform over 5, props = '{"k": <0..99>}'
  - parquet: pyarrow defaults (single row group per ~1Mi rows), same as
    the fixture files.

Usage: python tools/gen_sfdata_local.py [out_dir] [scale]
  default out_dir /root/sfdata/sf1.0, scale 1.0 (relative to sf1.0)
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path)
    f = pq.ParquetFile(path)
    print(f"{name}: {f.metadata.num_rows} rows, {f.num_row_groups} rgs, "
          f"{os.path.getsize(path)} bytes")


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    words = np.array(VOCAB)
    lens = rng.integers(10, 101, size=n)
    texts: list[str] = []
    for i in range(n):
        texts.append(" ".join(words[rng.integers(0, len(words), size=lens[i])]))
    # planted structure: ~0.5% mutated near-copies (jaccard>=0.5 pairs),
    # ~0.16% exact copies — of an earlier doc
    n_near = int(n * 0.005)
    n_exact = int(n * 0.0016)
    for _ in range(n_near):
        i = int(rng.integers(1, n))
        j = int(rng.integers(0, i))
        toks = texts[j].split()
        k = max(1, len(toks) // 20)  # mutate ~5% of tokens
        for _ in range(k):
            toks[int(rng.integers(0, len(toks)))] = str(
                words[int(rng.integers(0, len(words)))]
            )
        texts[i] = " ".join(toks)
    for _ in range(n_exact):
        i = int(rng.integers(1, n))
        j = int(rng.integers(0, i))
        texts[i] = texts[j]
    lang = rng.choice(LANGS, size=n, p=LANG_P)
    source = np.array([f"src{i % 20}" for i in range(n)])
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(lang),
        "source": pa.array(source),
        "n_chars": pa.array(n_chars),
    })


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64) -> pa.Table:
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n).astype(np.int64)),
    })


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    span_us = 30 * 86400 * 1_000_000
    gaps = rng.exponential(span_us / n, size=n)
    ts = (np.datetime64("2024-01-01T00:00:00", "us")
          + np.cumsum(gaps).astype("timedelta64[us]"))
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, n_users, size=n).astype(np.int64)),
        "event_type": pa.array(rng.choice(
            ["click", "view", "purchase", "signup", "error"], size=n)),
        "value": pa.array(np.round(rng.exponential(50.0, size=n), 2)),
        "props": pa.array([f'{{"k": {k}}}'
                           for k in rng.integers(0, 100, size=n)]),
    })


def gen_orders(rng: np.random.Generator, n: int, n_cust: int) -> pa.Table:
    d0 = np.datetime64("1995-01-01")
    days = rng.integers(0, 2404, size=n)
    return pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, size=n).astype(np.int64)),
        "o_orderstatus": pa.array(rng.choice(["P", "O", "F"], size=n)),
        "o_totalprice": pa.array(np.round(
            rng.uniform(1000.0, 500000.0, size=n), 2)),
        "o_orderdate": pa.array((d0 + days).astype("datetime64[us]")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            size=n)),
    })


def gen_lineitem(rng: np.random.Generator, n: int, n_orders: int,
                 n_part: int, n_supp: int) -> pa.Table:
    d0 = np.datetime64("1995-01-01")
    return pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_orders, size=n).astype(np.int64)),
        "l_partkey": pa.array(rng.integers(0, n_part, size=n).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, size=n).astype(np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 8, size=n).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, size=n).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(
            rng.uniform(900.0, 105000.0, size=n), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, size=n) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, size=n) / 100.0, 2)),
        "l_returnflag": pa.array(rng.choice(["N", "R", "A"], size=n)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], size=n)),
        "l_shipdate": pa.array(
            (d0 + rng.integers(0, 2499, size=n)).astype("datetime64[us]")),
    })


def gen_customer(rng: np.random.Generator, n: int) -> pa.Table:
    return pa.table({
        "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
        "c_nationkey": pa.array(rng.integers(0, 25, size=n).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-999.0, 9999.0, size=n), 2)),
        "c_mktsegment": pa.array(rng.choice(
            ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"],
            size=n)),
    })


def gen_part(rng: np.random.Generator, n: int) -> pa.Table:
    adjs = ["large", "hot", "cold", "small", "new", "old"]
    nouns = ["ring", "bolt", "nut", "gear", "pin", "rod"]
    return pa.table({
        "p_partkey": pa.array(np.arange(n, dtype=np.int64)),
        "p_name": pa.array([f"{adjs[i % 6]} {nouns[(i // 6) % 6]}"
                            for i in range(n)]),
        "p_brand": pa.array([f"Brand#{int(b)}"
                             for b in rng.integers(1, 26, size=n)]),
        "p_type": pa.array(rng.choice(
            ["LARGE", "ECONOMY", "STANDARD", "SMALL", "PROMO"], size=n)),
        "p_size": pa.array(rng.integers(1, 51, size=n).astype(np.int32)),
        "p_retailprice": pa.array(np.round(
            900.0 + np.arange(n) % 1000 / 10.0, 2)),
    })


def gen_supplier(rng: np.random.Generator, n: int) -> pa.Table:
    return pa.table({
        "s_suppkey": pa.array(np.arange(n, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
        "s_nationkey": pa.array(rng.integers(0, 25, size=n).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-999.0, 9999.0, size=n), 2)),
    })


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/sfdata/sf1.0"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    s = scale
    n_cust = int(150_000 * s)
    n_orders = int(1_500_000 * s)
    write(out_dir, "documents", gen_documents(rng, int(50_000 * s)))
    write(out_dir, "embeddings", gen_embeddings(rng, int(20_000 * s)))
    write(out_dir, "events", gen_events(rng, int(1_000_000 * s), n_cust // 10))
    write(out_dir, "orders", gen_orders(rng, n_orders, n_cust))
    write(out_dir, "lineitem", gen_lineitem(
        rng, int(6_000_000 * s), n_orders, int(200_000 * s), int(10_000 * s)))
    write(out_dir, "customer", gen_customer(rng, n_cust))
    write(out_dir, "part", gen_part(rng, int(200_000 * s)))
    write(out_dir, "supplier", gen_supplier(rng, int(10_000 * s)))
    for t in ("nation", "region"):
        shutil.copy(f"/root/testdata/sf0.1/{t}.parquet",
                    os.path.join(out_dir, f"{t}.parquet"))
        print(f"{t}: copied from sf0.1")


if __name__ == "__main__":
    main()
