#!/usr/bin/env python
"""Deterministic synthetic testdata generator for scale factors the
driver does not ship.

/root/testdata provides sf0.001/0.01/0.1 (read-only, TESTDATA.md).
VERDICT r05 item 2 asks for sf1 scaling evidence; this script mirrors
the driver tables' schemas and distributions (profiled from sf0.1 —
see the constants below) at an arbitrary sf, seed-pinned, so the
headline bench can run a 3-point scaling ladder 0.01 / 0.1 / 1.

Row counts scale linearly with sf except `region`/`nation`, which are
fixed-size dims copied verbatim from the driver's sf0.1 (their content
does not scale in TPC-H either). Distribution fidelity targets the
PLAN shape (key cardinalities, join fan-outs, value domains, planted
near-duplicates for the dedup tiers, cluster structure for the ANN
tiers) — there is no oracle at sf1; correctness is graded at sf0.01.

Usage:  python tools/gen_testdata.py 1.0 testdata_local/sf1
"""
from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DRIVER_SF01 = "/root/testdata/sf0.1"

# rows per table at sf=1.0 (10x the driver's sf0.1 counts)
COUNTS = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
FLAGS = ["A", "N", "R"]
LINESTATUS = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
# documents: en ~41%, the rest ~15% each (sf0.1 profile)
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
ADJ = ["large", "hot", "blue", "small", "red", "green", "cold", "dark"]
NOUN = ["ring", "bolt", "screw", "plate", "wheel", "gear", "pin", "cap"]

EPOCH_1995 = np.datetime64("1995-01-01")
ORDER_DAYS = (np.datetime64("2001-08-01") - EPOCH_1995).astype(int)
EV_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")
EV_SPAN_US = 30 * 24 * 3600 * 1_000_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _days_ts(days: np.ndarray) -> pa.Array:
    ts = EPOCH_1995 + days.astype("timedelta64[D]")
    return pa.array(ts.astype("datetime64[us]"))


def _doc_vocab() -> list[str]:
    """Reuse the driver corpus's exact 31-word vocabulary so text-stat
    distributions (token entropy, vocab coverage, Zipf fits) carry the
    same support at sf1."""
    import duckdb

    rows = duckdb.sql(
        f"select distinct w from (select unnest(string_split(text, ' ')) w "
        f"from '{DRIVER_SF01}/documents.parquet') order by 1"
    ).fetchall()
    return [r[0] for r in rows if r[0]]


def generate(sf: float, out_dir: str, only: set[str] | None = None) -> None:
    """``only``: restrict to {"documents", "embeddings"} (the two
    tables the dedup/ANN scaling ladders read) — the big-SF ladder
    points (sf10, round 9) don't need 60M lineitem rows. The TPC-H
    block is all-or-nothing because its tables share generated keys
    (lineitem reads orders' dates). NOTE: a filtered run draws from a
    different RNG stream position than a full run at the same sf — a
    ladder dir is its own dataset, not a subset of a full dir."""
    rng = np.random.default_rng(42)
    os.makedirs(out_dir, exist_ok=True)
    n = {t: max(1, int(c * sf)) for t, c in COUNTS.items()}
    if only is not None and only - {"documents", "embeddings"}:
        raise ValueError(
            "only= supports exactly the ladder tables documents/embeddings; "
            f"got {sorted(only)}"
        )
    if only is not None:
        _ladder_tables(sf, out_dir, n, rng, only)
        return

    # fixed-size dims: copy the driver's files verbatim
    for t in ("region", "nation"):
        shutil.copy(os.path.join(DRIVER_SF01, f"{t}.parquet"), out_dir)
        print(f"  {t}: copied from driver sf0.1")

    nc = n["customer"]
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, nc), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, nc)]),
    }))

    ns = n["supplier"]
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 10000, ns), 2),
    }))

    npart = n["part"]
    pk = np.arange(npart)
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(pk, pa.int64()),
        "p_name": pa.array(
            [f"{ADJ[i % 8]} {NOUN[(i // 8) % 8]}" for i in range(npart)]
        ),
        "p_brand": pa.array([f"Brand#{1 + (i % 25)}" for i in range(npart)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, npart)]),
        "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
        "p_retailprice": np.round(900.0 + (pk % 1000) * 0.1, 1),
    }))

    no = n["orders"]
    odays = rng.integers(0, ORDER_DAYS + 1, no)
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(no), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, no)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, no), 2),
        "o_orderdate": _days_ts(odays),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, no)]),
    }))

    nl = n["lineitem"]
    l_ok = rng.integers(0, no, nl)
    # shipdate correlates with the parent order date (+1..95d), the
    # TPC-H shape the date-window queries rely on
    ship = odays[l_ok] + rng.integers(1, 96, nl)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_ok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, npart, nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, nl), pa.int32()),
        "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, nl), 2),
        "l_discount": rng.integers(0, 11, nl) / 100.0,
        "l_tax": rng.integers(0, 9, nl) / 100.0,
        "l_returnflag": pa.array(np.array(FLAGS)[rng.integers(0, 3, nl)]),
        "l_linestatus": pa.array(np.array(LINESTATUS)[rng.integers(0, 2, nl)]),
        "l_shipdate": _days_ts(ship),
    }))

    ne = n["events"]
    n_users = max(1, int(1500 * sf * 10))  # 1500 at sf0.1
    ts_us = np.sort(rng.integers(0, EV_SPAN_US, ne))
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(ne), pa.int64()),
        "ts": pa.array(EV_EPOCH + ts_us.astype("timedelta64[us]")),
        "user_id": pa.array(rng.integers(0, n_users, ne), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, ne)]),
        "value": np.round(np.minimum(rng.exponential(50, ne), 600.0), 2),
        "props": pa.array(
            [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, ne)]
        ),
    }))

    _gen_documents(out_dir, n["documents"], rng)
    _gen_embeddings(out_dir, n["embeddings"], rng)


def _ladder_tables(sf, out_dir, n, rng, only: set[str]) -> None:
    if "documents" in only:
        _gen_documents(out_dir, n["documents"], rng)
    if "embeddings" in only:
        _gen_embeddings(out_dir, n["embeddings"], rng)


def _gen_documents(out_dir: str, nd: int, rng) -> None:
    vocab = np.array(_doc_vocab())
    lengths = rng.integers(8, 105, nd)  # words per doc → n_chars ~44..577
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lengths
    ]
    # planted duplicate structure for the dedup tiers: ~1% near-dups
    # (1-2 word edits of an earlier doc) + ~0.2% exact dups
    for i in rng.choice(np.arange(nd // 10, nd), max(1, nd // 100), replace=False):
        src = texts[int(i) - nd // 10].split()
        for _ in range(int(rng.integers(1, 3))):
            src[int(rng.integers(0, len(src)))] = str(
                vocab[int(rng.integers(0, len(vocab)))]
            )
        texts[int(i)] = " ".join(src)
    for i in rng.choice(np.arange(1, nd), max(1, nd // 500), replace=False):
        texts[int(i)] = texts[int(i) - 1]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[rng.choice(5, nd, p=LANG_P)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, nd)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))


def _gen_embeddings(out_dir: str, nv: int, rng) -> None:
    labels = rng.integers(0, 10, nv)
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = centers[labels] + rng.normal(0, 0.35, (nv, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype(np.float32)],
            pa.list_(pa.float32()),
        ),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"testdata_local/sf{sf:g}"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    print(f"generating sf={sf} -> {out}" + (f" (only {sorted(only)})" if only else ""))
    generate(sf, out, only)
    print("done")
