"""Synthesize a 10×-sf0.1 local dataset (≈ sf1.0) for scale-curve
measurement — VERDICT r12 item 1: the driver ships no sf1.0 testdata,
so the 0.1→1.0 decade of the 100 TB story was unmeasured.

The generator mirrors /root/testdata's schemas and value
distributions (seed=42, numpy + pyarrow, no Spark): TPC-H-ish star
tables with the same key ranges ×10, the events stream on the same
Jan-2024 30-day horizon (the late-audit staging contract), documents
over the same 31-word vocabulary with exact-dup clones, and
L2-normalized 64-d embeddings in 10 label clusters.  It does NOT try
to replicate the driver's exact rows — the scale curve measures
wall-time shape, not oracle values (oracle checks stay at the
driver's scales).

Usage: python scripts/gen_scale.py [mult] [out_dir]
  mult default 10 (relative to sf0.1), out default REPO/.scale/sf1.0
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows", flush=True)


def main() -> None:
    mult = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(ROOT, ".scale", "sf1.0")
    )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(15_000 * mult)
    n_supp = int(1_000 * mult)
    n_part = int(20_000 * mult)
    n_ord = int(150_000 * mult)
    n_li = int(600_000 * mult)
    n_ev = int(100_000 * mult)
    n_doc = int(5_000 * mult)
    n_emb = int(2_000 * mult)

    # region / nation: fixed dimensions, copied shapes
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": pa.array(rng.choice(segs, n_cust)),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))

    adjs = ["large", "hot", "blue", "small", "dark", "light", "red",
            "green"]
    nouns = ["ring", "bolt", "case", "drum", "gear", "plate", "rod",
             "cap"]
    types = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO",
             "MEDIUM"]
    ai = rng.integers(0, len(adjs), n_part)
    ni = rng.integers(0, len(nouns), n_part)
    _write(out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{adjs[a]} {nouns[b]}" for a, b in zip(ai, ni)],
        "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, n_part)],
        "p_type": pa.array(rng.choice(types, n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(
            900.0 + 0.1 * (np.arange(n_part) % 2001), 2),
    }))

    day_us = 86_400_000_000
    o_epoch_1995 = np.datetime64("1995-01-01").astype(
        "datetime64[us]").astype(np.int64)
    o_dates = o_epoch_1995 + rng.integers(0, 2400, n_ord) * day_us
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"]
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], n_ord,
                                             p=[0.49, 0.49, 0.02])),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": pa.array(o_dates, pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(prios, n_ord)),
    }))

    l_dates = o_epoch_1995 + rng.integers(1, 2500, n_li) * day_us
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n_li)),
        "l_shipdate": pa.array(l_dates, pa.timestamp("us")),
    }))

    # events: same 30-day Jan-2024 horizon (ev_stream_late_audit's
    # staging guard requires every ts inside it), ~67 events/user
    n_users = int(1_500 * mult)
    ev_epoch = np.datetime64("2024-01-01").astype(
        "datetime64[us]").astype(np.int64)
    horizon_us = 30 * day_us
    ts = ev_epoch + np.sort(
        rng.integers(0, horizon_us - day_us // 24, n_ev))
    etypes = ["click", "view", "purchase", "signup", "error"]
    _write(out, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(rng.choice(etypes, n_ev)),
        "value": np.round(rng.exponential(60.0, n_ev).clip(0, 999), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: the sf0.1 vocabulary, 10-100 words, 20 sources,
    # 5 langs, ~0.5% exact-dup clones and ~1% near-dup mutations so
    # the dedup family has real work at this scale too
    vocab = np.array(
        "batch part spark line column order small sort fast value scan "
        "a hash slow group agg filter query big key window row table "
        "stream merge data plan join scale node disk".split())
    assert len(vocab) == 31
    langs = ["en", "zh", "de", "fr", "es"]
    lens = rng.integers(10, 101, n_doc)
    texts = [
        " ".join(vocab[rng.integers(0, 31, ln)]) for ln in lens
    ]
    for i in range(0, n_doc, 200):  # exact dups
        texts[(i + 17) % n_doc] = texts[i]
    for i in range(100, n_doc, 100):  # near dups (1-word mutation)
        w = texts[i].split(" ")
        w[len(w) // 2] = str(vocab[i % 31])
        texts[(i + 31) % n_doc] = " ".join(w)
    _write(out, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(langs, n_doc,
                                    p=[0.6, 0.1, 0.1, 0.1, 0.1])),
        "source": pa.array([f"src{i}" for i in
                            rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 10 gaussian clusters on the unit sphere (labels),
    # matching the L2-normalized 64-d layout
    labels = rng.integers(0, 10, n_emb)
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = centers[labels] + rng.normal(0, 0.35, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype(np.float32)],
            pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))
    print(f"done -> {out}", flush=True)


if __name__ == "__main__":
    main()
