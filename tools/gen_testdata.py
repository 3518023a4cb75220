"""Deterministic synthetic testdata generator for scale sweeps beyond sf0.1.

The driver's parquet dirs (TESTDATA.md) are read-only and stop at sf0.1;
the multi-SF replica sweep (VERDICT r5 #1) wants sf1+.  This reproduces the
same star schema with statistically-similar domains — every column a catalog
query predicates on (region names, order statuses, event types, the Jan-2024
event window, doc sources/langs, 64-dim unit embeddings, ...) is covered —
at any SF, seeded, chunked so sf1 (~6M lineitem) streams through bounded
memory.

Scaling follows the driver's observed curve: linear for the relational
tables and events; documents/embeddings continue the sf0.1 -> x10 step
(50k / 20k at sf1).

Usage:  python tools/gen_testdata.py SF OUTDIR      # e.g. 1 /tmp/sfgen/sf1
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "HOUSEHOLD", "BUILDING", "MACHINERY", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["small", "red", "blue", "green", "large", "shiny", "matte", "heavy"]
NOUN = ["ring", "widget", "bolt", "gear", "cog", "pin", "plate", "rod"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "en", "en", "en", "de", "es", "zh", "fr"]  # ~en-heavy mix
VOCAB = (
    "the a key agg row scan slow fast table value part hash batch window "
    "spark order data column join small line customer query merge big "
    "stream filter sort group vector b"
).split()

DAY_US = 86_400_000_000


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _money(rng, n, lo, hi):
    return np.round(rng.uniform(lo, hi, n), 2)


def gen(sf: float, outdir: str, seed: int = 42) -> None:
    os.makedirs(outdir, exist_ok=True)
    n_cust = max(10, int(150_000 * sf))
    n_supp = max(5, int(10_000 * sf))
    n_part = max(20, int(200_000 * sf))
    n_orders = max(100, int(1_500_000 * sf))
    n_events = max(100, int(1_000_000 * sf))
    n_docs = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    rng = np.random.default_rng(seed)

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": _money(rng, n_cust, -1000, 10_000),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": _money(rng, n_supp, -1000, 10_000),
    }))
    n_serial = max(1, n_part // 3300)
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        # name-pool cardinality scales with the table so per-name
        # multiplicity (and the fuzzy-match pair count) stays at the
        # driver's sf0.1 level instead of growing quadratically
        "p_name": [
            f"{ADJ[a]} {NOUN[b]}" + (f" v{s}" if n_serial > 1 else "")
            for a, b, s in zip(rng.integers(0, len(ADJ), n_part),
                               rng.integers(0, len(NOUN), n_part),
                               rng.integers(0, n_serial, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": _money(rng, n_part, 900, 1000),
    }))

    # orders: dates span 1995-01-01 .. 2001-08-01 (midnight-day timestamps)
    date_lo = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    n_days = int((np.datetime64("2001-08-01") - np.datetime64("1995-01-01")) / np.timedelta64(1, "D"))
    odays = rng.integers(0, n_days + 1, n_orders)
    odate_us = date_lo + odays * DAY_US
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
        "o_orderstatus": np.array(["P", "F", "O"])[rng.integers(0, 3, n_orders)],
        "o_totalprice": _money(rng, n_orders, 1000, 500_000),
        "o_orderdate": pa.array(odate_us, pa.timestamp("us")),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_orders)],
    }))

    # lineitem: Poisson(4) lines per order (zeros -> orders without items),
    # streamed in chunks through one parquet writer
    per_order = rng.poisson(4.0, n_orders).clip(0, 13)
    li_path = os.path.join(outdir, "lineitem.parquet")
    writer = None
    total_li = 0
    chunk = 500_000
    for lo in range(0, n_orders, chunk):
        hi = min(lo + chunk, n_orders)
        counts = per_order[lo:hi]
        okeys = np.repeat(np.arange(lo, hi), counts)
        m = len(okeys)
        if m == 0:
            continue
        linenum = np.concatenate([np.arange(1, c + 1) for c in counts if c > 0])
        qty = rng.integers(1, 51, m).astype(np.float64)
        unit = rng.uniform(500, 3000, m)
        ship_off = rng.integers(1, 121, m)
        tbl = pa.table({
            "l_orderkey": pa.array(okeys, pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, m), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, m), pa.int64()),
            "l_linenumber": pa.array(linenum, pa.int32()),
            "l_quantity": qty,
            "l_extendedprice": np.round(qty * unit, 2),
            "l_discount": np.round(rng.integers(0, 11, m) * 0.01, 2),
            "l_tax": np.round(rng.integers(0, 9, m) * 0.01, 2),
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, m)],
            "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, m)],
            "l_shipdate": pa.array(
                odate_us[okeys] + ship_off * DAY_US, pa.timestamp("us")
            ),
        })
        if writer is None:
            writer = pq.ParquetWriter(li_path, tbl.schema)
        writer.write_table(tbl)
        total_li += m
    if writer is not None:
        writer.close()
    print(f"  lineitem: {total_li} rows")

    # events: nanosecond timestamps (the driver's TIMESTAMP(NANOS) quirk),
    # sorted over the fixed Jan-2024 30-day window
    ev_lo = np.datetime64("2024-01-01").astype("datetime64[ns]").astype(np.int64)
    span_ns = 30 * 86_400 * 1_000_000_000
    ts = ev_lo + np.sort(rng.integers(0, span_ns, n_events))
    n_users = max(10, int(15_000 * sf))
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_events), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_events)],
        # skewed low like the driver's (median ~35, p99 ~224): an
        # exponential keeps conversion-style thresholds (value >= 150)
        # partial instead of trivially true for every user
        "value": np.maximum(
            0.01, np.round(np.minimum(rng.exponential(50, n_events), 500), 2)
        ),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_events)],
    }))

    # documents: vocab text, en-heavy lang labels, 20 fixed sources.
    # Every 20th doc is a lightly-perturbed copy of its predecessor — the
    # driver's data plants exactly this near-duplicate structure (25
    # high-jaccard pairs per 500 docs), which the MinHash/SimHash dedup
    # queries need to return non-zero candidates.
    vocab = np.array(VOCAB)
    lens = rng.integers(8, 81, n_docs)
    texts = []
    for i, L in enumerate(lens):
        if i % 20 == 19 and i > 0:
            words = texts[i - 1].split()
            for pos in rng.integers(0, len(words), 2):
                words[pos] = vocab[rng.integers(0, len(vocab))]
            texts.append(" ".join(words))
        else:
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), L)]))
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[rng.integers(0, len(LANGS), n_docs)],
        "source": [f"src{i % 20}" for i in range(n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 64-dim unit-norm gaussian, labels 0..9
    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sfgen/sf{sys.argv[1] if len(sys.argv) > 1 else '1'}"
    print(f"generating sf={sf} -> {outdir}")
    gen(sf, outdir)
    print("done")
