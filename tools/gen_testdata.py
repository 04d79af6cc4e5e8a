"""Synthetic testdata generator — schema- and distribution-compatible
with the driver's /root/testdata tables, for scale factors the driver
doesn't ship (sf1 scaling runs: VERDICT r2 next-round item 3).

Faithful to the shipped sf0.01/sf0.1 data in everything a plan's cost
model sees: row-count ratios between tables, key domains and join
fan-outs, group cardinalities (5 mktsegments, 25 brands, 6 types, 5
event types, 31-word document vocab, 30-day event window, ~0.2% exact
document dups, unit-norm 64-dim embeddings), value ranges. NOT
byte-identical to the driver's generator (seed/stream differ) — sf1
results are for measuring scaling exponents, never for the
correctness gate, which runs only on driver-shipped data.

Usage: python tools/gen_testdata.py <sf> <out_dir>
"""

from __future__ import annotations

import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query a big key window row table stream merge data "
    "vector join index code"
).split()  # 31 tokens, mirroring the shipped corpus vocabulary
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PNAME_A = ["large", "hot", "small", "cold", "dim", "bright", "smooth", "rough"]
PNAME_B = ["ring", "bolt", "washer", "spring", "gear", "plate", "rod", "cap"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

DAY_US = 86_400_000_000


def _ts_col(us: np.ndarray) -> pa.Array:
    return pa.array(us, type=pa.timestamp("us"))


def write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, f"{out}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


def main(sf: float, out: str) -> None:
    import os

    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(15_000 * sf)

    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    write(out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{PNAME_A[i % 8]} {PNAME_B[(i // 8) % 8]}" for i in range(n_part)
        ],
        "p_brand": pa.array([f"Brand#{i % 25 + 1}" for i in range(n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    t0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    span_days = 2404  # orders span 1995-01-01 .. 2001-08-01
    odate = t0 + rng.integers(0, span_days, n_ord) * DAY_US
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_col(odate),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    lkeys = rng.integers(0, n_ord, n_li)
    lkeys.sort()
    sdate = t0 + rng.integers(1, span_days + 95, n_li) * DAY_US
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(lkeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_col(sdate),
    }))

    ev0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    ets = ev0 + rng.integers(0, 30 * DAY_US, n_ev)
    ets.sort()
    write(out, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": _ts_col(ets),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.minimum(np.round(rng.exponential(50.0, n_ev), 6), 600.0),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    lens = rng.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens]
    # ~0.2% planted exact duplicates (the dedup families need real prey)
    for i in rng.choice(n_doc, max(1, n_doc // 500), replace=False):
        if i > 0:
            texts[int(i)] = texts[int(i) - 1]
    write(out, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array([f"src{i % 20}" for i in range(n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    emb = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2])
