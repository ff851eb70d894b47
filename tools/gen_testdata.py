"""Scale-up generator for the driver's synthetic test tables.

Reproduces the SHAPES of /root/testdata/sf* (schemas, domains, key
cardinalities, skew, duplicate structure, cluster structure — profiled
from the sf0.1 parquet) at any scale factor, so the exact-oracle gates
can be verified at ~sf1 (10x the driver's own verification SF) and the
banded/blocked operators' candidate-growth claims re-measured. The
driver's own files are read-only and never touched; output goes to a
fresh directory.

Usage:
  python tools/gen_testdata.py --sf 1.0 --out /tmp/sf1
  python tools/check_correctness.py /tmp/sf1 <gates...>

Deterministic (numpy PCG, seed 42 + per-table offsets); peak memory is
one table at a time (lineitem at sf1 = 6M rows, ~700 MB arrays).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_WORDS = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()
_LANGS = ["en", "de", "es", "zh", "fr"]
_LANG_P = [0.8, 0.05, 0.05, 0.05, 0.05]
_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
_ADJ = ["large", "hot", "blue", "old", "new", "red", "small", "cold"]
_NOUN = ["ring", "bolt", "plate", "wheel", "cog", "pin", "rod", "cap"]
_PTYPES = ["LARGE", "STANDARD", "ECONOMY", "PROMO", "MEDIUM", "SMALL"]
_PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_SEG = ["MACHINERY", "FURNITURE", "HOUSEHOLD", "BUILDING", "AUTOMOBILE"]


def _write(out, name, table):
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts(days_from, spread_days, rng, n, epoch="2024-01-01"):
    base = np.datetime64(epoch) + np.timedelta64(int(days_from), "D")
    us = rng.integers(0, int(spread_days * 86_400_000_000), n, dtype=np.int64)
    return (base.astype("datetime64[us]") + us.astype("timedelta64[us]")).astype(
        "datetime64[us]"
    )


def generate(sf: float, out: str, seed: int = 42):
    os.makedirs(out, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li_per = 4  # ~4 lineitems/order -> 6M at sf1
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_vec = int(20_000 * sf)

    # region / nation: fixed dimensions at every scale
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    rng = np.random.default_rng(seed)
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": pa.array(np.array(_SEG)[rng.integers(0, 5, n_cust)]),
    }))

    rng = np.random.default_rng(seed + 1)
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))

    rng = np.random.default_rng(seed + 2)
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{_ADJ[a]} {_NOUN[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(_PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
    }))

    rng = np.random.default_rng(seed + 3)
    o_date = _ts(0, 2404, rng, n_ord, epoch="1995-01-01")
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(900, 500_000, n_ord), 2),
        "o_orderdate": pa.array(o_date.astype("datetime64[D]").astype("datetime64[us]")),
        "o_orderpriority": pa.array(np.array(_PRIO)[rng.integers(0, 5, n_ord)]),
    }))

    rng = np.random.default_rng(seed + 4)
    counts = rng.integers(1, 2 * n_li_per, n_ord)  # 1..7, mean ~4
    okey = np.repeat(np.arange(n_ord), counts)
    n_li = len(okey)
    lineno = np.concatenate([np.arange(1, c + 1) for c in counts]).astype(np.int32)
    ship_lag = rng.integers(1, 95, n_li).astype("timedelta64[D]")
    ship = (
        np.repeat(o_date.astype("datetime64[D]"), counts) + ship_lag
    ).astype("datetime64[us]")
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(lineno, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(ship),
    }))

    # events: 30 days, zipf-ish user skew over sf-scaled user pool
    rng = np.random.default_rng(seed + 5)
    n_users = int(15_000 * sf)
    ts = np.sort(_ts(0, 30, rng, n_ev))
    users = rng.zipf(1.3, n_ev) % n_users
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(np.array(_EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50, n_ev).clip(0, 600), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: word-salad text with injected exact dups (~0.2%) and
    # near-dups (~2%, few-word mutations) so dedup gates have real work
    rng = np.random.default_rng(seed + 6)
    lens = rng.integers(8, 100, n_doc)
    words = np.array(_WORDS)
    texts = [" ".join(words[rng.integers(0, len(words), ln)]) for ln in lens]
    n_exact, n_near = max(2, n_doc // 500), max(4, n_doc // 50)
    for i in rng.integers(0, n_doc, n_exact):
        texts[(i + 7) % n_doc] = texts[i]
    for i in rng.integers(0, n_doc, n_near):
        toks = texts[i].split()
        for j in rng.integers(0, len(toks), max(1, len(toks) // 20)):
            toks[j] = words[rng.integers(0, len(words))]
        texts[(i + 13) % n_doc] = " ".join(toks)
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(_LANGS)[rng.choice(5, n_doc, p=_LANG_P)]),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))

    # embeddings: 10 gaussian clusters on the unit sphere, d=64
    rng = np.random.default_rng(seed + 7)
    d, k = 64, 10
    centers = rng.normal(size=(k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, n_vec)
    vecs = centers[labels] * 0.35 + rng.normal(size=(n_vec, d))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    print(f"generating sf={args.sf} into {args.out}")
    generate(args.sf, args.out, args.seed)


if __name__ == "__main__":
    main()
