"""Recall-vs-nprobe curve for the STORED IVF index (VERDICT r09 item 6).

``ann_ivf_query_stored`` carries the nprobe knob, but until round 10
the recall-vs-nprobe trade was only measured for the in-query tier.
This script pins the dial: build the index once, then for each nprobe
measure recall@k against ``knn_bruteforce`` ground truth (the exact
baseline the ANN tiers are defined against) and the probe's wall time
— recall is the fraction of exact top-k (query, neighbor) pairs the
probe returns, computed as a Spark join (no driver-side set math over
the result bulk).

Usage:
  python tools/bench_ivf_recall.py [embeddings_parquet] \
      [--nprobe 1,2,4,8] [--k 10] [--out BENCH_IVF_RECALL.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", default="testdata_local/sf1/embeddings.parquet")
    ap.add_argument("--nprobe", default="1,2,4,8")
    ap.add_argument("--frac", default=None,
                    help="comma list of probe_frac values; when set, the "
                         "curve is measured on the FRACTION dial "
                         "(nprobe = ceil(frac*cells)) instead of fixed "
                         "nprobe — run at two SFs to see the fraction "
                         "hold where fixed nprobe decays (round 11)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--qmod", type=int, default=199,
                    help="query set = vec_id %% qmod == 0")
    ap.add_argument("--tier", default="float", choices=["float", "int8", "both"],
                    help="probe tier: the float stored probe, the "
                         "int8 code-space probe + exact re-rank "
                         "(round 12 — the 4x read lever on the same "
                         "dial), or both side by side per dial value")
    ap.add_argument("--rerank", type=int, default=4,
                    help="int8 tier shortlist factor (rerank_factor*k "
                         "candidates re-ranked in float)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ffi_etl_spark.operators.similarity import (
        ann_ivf_query_stored,
        ann_ivf_query_stored_int8,
        ivf_index_tables,
        knn_bruteforce,
        write_ivf_assignments,
    )
    from ffi_etl_spark.session import get_session

    spark = get_session("bench-ivf-recall")
    # single-row-group input normalization (the r09 lesson): without
    # the repartition every narrow corpus stage is ONE task
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    emb = spark.read.parquet(args.src).repartition(nparts).localCheckpoint()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") % args.qmod == 0).localCheckpoint()
    n_q = queries.count()

    root = tempfile.mkdtemp(prefix="ivf_recall_bench_")
    cpath, apath = os.path.join(root, "centroids"), os.path.join(root, "assignments")
    centroids, assignments = ivf_index_tables(
        emb, store_codes=args.tier != "float"
    )
    centroids.write.parquet(cpath)
    write_ivf_assignments(assignments, apath)
    model = spark.read.parquet(cpath)
    index = spark.read.parquet(apath)
    cells = model.count()

    col_bytes: dict = {}
    if args.tier != "float":
        # the IO contract, from the parquet footers themselves: the
        # code-space probe reads the _codes column chunks where the
        # float probe reads embedding (+vec_norm). Wall time on a
        # page-cached local disk understates this — at 100 TB on
        # object storage the scan is byte-bound and THIS ratio is the
        # probe-cost cut.
        import pyarrow.parquet as pq

        for root_dir, _dirs, files in os.walk(apath):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(root_dir, fn)).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        name = c.path_in_schema.split(".")[0]
                        col_bytes[name] = col_bytes.get(name, 0) + c.total_compressed_size
        flt = col_bytes.get("embedding", 0) + col_bytes.get("vec_norm", 0)
        cod = col_bytes.get("_codes", 0) + col_bytes.get("_cn2", 0)
        col_bytes = {
            "float_probe_bytes": flt,
            "codes_probe_bytes": cod,
            "read_cut": round(flt / cod, 2) if cod else None,
        }

    # exact ground truth, pinned once — the intentionally-quadratic
    # oracle arm (q·n dots), bounded by the query sample size
    exact = knn_bruteforce(emb, queries, k=args.k).select(
        "query_id", "neighbor_id"
    ).localCheckpoint(eager=True)
    n_exact = exact.count()

    rows = []
    if args.frac is not None:
        import math

        dials = [("probe_frac", float(x)) for x in args.frac.split(",")]
    else:
        dials = [("nprobe", int(x)) for x in args.nprobe.split(",")]
    for kind, dial in dials:
        kw = {kind: dial}
        row = {kind: dial}
        if kind == "probe_frac":
            import math as _m

            row["effective_nprobe"] = max(1, _m.ceil(dial * cells))
        if args.tier in ("float", "both"):
            t0 = time.monotonic()
            ann = ann_ivf_query_stored(
                model, index, queries, k=args.k, **kw
            ).select("query_id", "neighbor_id").localCheckpoint(eager=True)
            row["probe_sec"] = round(time.monotonic() - t0, 2)
            hits = ann.join(exact, ["query_id", "neighbor_id"], "inner").count()
            row["recall_at_k"] = round(hits / n_exact, 4)
        if args.tier in ("int8", "both"):
            t0 = time.monotonic()
            ann8 = ann_ivf_query_stored_int8(
                model, index, queries, k=args.k,
                rerank_factor=args.rerank, **kw
            ).select("query_id", "neighbor_id").localCheckpoint(eager=True)
            row["int8_probe_sec"] = round(time.monotonic() - t0, 2)
            hits8 = ann8.join(exact, ["query_id", "neighbor_id"], "inner").count()
            row["int8_recall_at_k"] = round(hits8 / n_exact, 4)
            row["int8_rerank_factor"] = args.rerank
        rows.append(row)
        print(json.dumps(rows[-1]), flush=True)

    summary = {
        "src": args.src, "n_vectors": n, "n_queries": n_q, "k": args.k,
        "cells": cells, "curve": rows,
    }
    if col_bytes:
        summary["scan_bytes"] = col_bytes
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
