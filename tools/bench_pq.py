"""PQ family bench (round 12): compression vs recall vs wall time.

Measures, on one corpus, the three candidate-scoring tiers that share
the SQ code domain — exact code-space kNN (the baseline the PQ gates
are defined against), pure ADC, and ADC + exact-code re-rank at a
ladder of shortlist factors — plus the STORAGE ledger from the parquet
footers themselves: float vectors vs SQ codes vs packed PQ ids. The
storage ratio is the scale-free claim (it is what a 100 TB embedding
store pays per candidate); wall time on a warm single node is the
compute side of the trade.

Usage:
  python tools/bench_pq.py [embeddings_parquet] [--qmod 199] [--k 10] \
      [--rerank 2,4,8] [--out BENCH_PQ.json]
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


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, fn))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", default="testdata_local/sf1/embeddings.parquet")
    ap.add_argument("--qmod", type=int, default=199)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--rerank", default="2,4,8")
    ap.add_argument("--ksub", type=int, default=16,
                    help="subcentroids per subspace: 16 = the 4-bit "
                         "gate setting; larger corpora want 64-256 "
                         "(recall scales with code capacity)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ffi_etl_spark.operators.quantize import (
        knn_int8_codes,
        pq_adc_rerank_topk,
        pq_adc_topk,
        pq_pack_codes,
        pq_train_encode,
        quantize_codes_long,
        quantize_embeddings_int8,
    )
    from ffi_etl_spark.session import get_session

    spark = get_session("bench-pq")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    emb = spark.read.parquet(args.src).repartition(nparts).localCheckpoint()
    n = emb.count()
    probes = [r["vec_id"] for r in emb.filter(
        F.col("vec_id") % args.qmod == 0
    ).select("vec_id").collect()]

    codes = quantize_codes_long(emb).localCheckpoint(eager=True)
    t0 = time.monotonic()
    codebooks, encoded = pq_train_encode(codes, k_sub=args.ksub)
    encoded = encoded.localCheckpoint(eager=True)
    train_sec = round(time.monotonic() - t0, 2)
    codebooks = codebooks.localCheckpoint(eager=True)

    # storage ledger from real parquet files
    root = tempfile.mkdtemp(prefix="pq_bench_")
    emb.select("vec_id", "embedding").write.parquet(os.path.join(root, "flt"))
    quantize_embeddings_int8(emb).write.parquet(os.path.join(root, "sq"))
    pq_pack_codes(encoded).write.parquet(os.path.join(root, "pq"))
    storage = {
        "float_bytes": _dir_bytes(os.path.join(root, "flt")),
        "sq_bytes": _dir_bytes(os.path.join(root, "sq")),
        "pq_bytes": _dir_bytes(os.path.join(root, "pq")),
    }
    storage["float_over_pq"] = round(storage["float_bytes"] / storage["pq_bytes"], 1)
    storage["sq_over_pq"] = round(storage["sq_bytes"] / storage["pq_bytes"], 1)

    def timed(fn):
        t0 = time.monotonic()
        got = fn().localCheckpoint(eager=True)
        return got, round(time.monotonic() - t0, 2)

    exact, exact_sec = timed(lambda: knn_int8_codes(emb, probes, k=args.k))
    exact_pairs = exact.select(
        F.col("pid"), F.col("vec_id")
    ).localCheckpoint(eager=True)
    n_exact = exact_pairs.count()

    rows = []
    adc, adc_sec = timed(
        lambda: pq_adc_topk(codebooks, encoded, codes, probes, k=args.k)
    )
    hits = adc.select("pid", "vec_id").join(
        exact_pairs, ["pid", "vec_id"]
    ).count()
    rows.append({"tier": "adc", "sec": adc_sec,
                 "recall_at_k": round(hits / n_exact, 4)})
    for rf in [int(x) for x in args.rerank.split(",")]:
        rr, rr_sec = timed(
            lambda rf=rf: pq_adc_rerank_topk(
                codebooks, encoded, codes, probes, k=args.k, rerank_factor=rf
            )
        )
        hits = rr.select("pid", "vec_id").join(
            exact_pairs, ["pid", "vec_id"]
        ).count()
        rows.append({"tier": f"adc_rerank{rf}", "sec": rr_sec,
                     "recall_at_k": round(hits / n_exact, 4)})

    summary = {
        "src": args.src, "n_vectors": n, "n_probes": len(probes),
        "k": args.k, "k_sub": args.ksub, "train_sec": train_sec,
        "exact_code_knn_sec": exact_sec,
        "tiers": rows, "storage": storage,
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
