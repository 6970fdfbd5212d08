"""Per-batch cost curve of the streaming ANN ingest (round 11).

The ANN twin of tools/bench_stream_ingest.py (VERDICT r10 item 5): the
100 TB question for `stream_ann_ingest` is the SHAPE of per-batch cost
as the stored index grows — the design claim is each batch pays
|batch|·K cosines (one K-row model broadcast) + the stored-id
anti-join + the touched cells' write/compaction, so batch N should
cost roughly what batch 2 did even though the index is N× larger, and
the stored-probe latency should stay flat because the per-cell file
count is bounded (layout-aware appends + counter-driven compaction).
Measured end to end through the REAL sink (foreachBatch + parquet
state + torn-swap recovery path), not a stripped re-implementation:

  * the vector corpus is split into `n_batches` equal slices by
    vec_id; batch 1 is the BOOTSTRAP (trains the quantizer);
  * each slice lands as a JSON file and drains with
    trigger(availableNow) — one full stream lifecycle per batch;
  * after each drain, a fixed 1%-sample query set probes the STORED
    index (ann_ivf_query_stored, trust_layout) and its wall time rides
    the record — the consumer-visible latency the compaction exists to
    bound;
  * per-batch wall time, stored rows, probe time, and the max
    files-per-cell print as one JSON line per batch.

Usage:
  python tools/bench_stream_ann.py [embeddings_parquet] [n_batches] \
      [--compact-files-per-cell 16] [--out INGEST_ANN_rN.json]
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
    ap.add_argument("src", nargs="?",
                    default="testdata_local/sf10/embeddings.parquet")
    ap.add_argument("n_batches", nargs="?", type=int, default=10)
    ap.add_argument("--compact-files-per-cell", type=int, default=16)
    ap.add_argument("--qmod", type=int, default=199,
                    help="probe query set = vec_id %% qmod == 0 of batch 1")
    ap.add_argument("--drift", action="store_true",
                    help="after the trickle, land one more batch with a "
                         "planted drift trip (sim_floor above 1.0) under "
                         "rebuild_on_drift and time the rebuild+swap — "
                         "the remedy's one n*sqrt(n) cost, measured")
    ap.add_argument("--store-codes", action="store_true",
                    help="round 13 (VERDICT r12 item 4): maintain the "
                         "int8-coded IVF layout through the sink "
                         "(store_codes=True — bootstrap fits the codebook, "
                         "appends code under it, rebuilds re-fit) and probe "
                         "each batch with ann_ivf_query_stored_int8, so the "
                         "decade ladder measures the coded layout's "
                         "compaction + probe costs end to end")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ffi_etl_spark.operators.similarity import (
        ann_ivf_query_stored,
        ann_ivf_query_stored_int8,
    )
    from ffi_etl_spark.operators.stored_state import bucket_file_counts
    from ffi_etl_spark.streaming.ann_ingest import stream_ann_ingest
    from ffi_etl_spark.session import get_session

    spark = get_session("bench-stream-ann")
    emb = spark.read.parquet(args.src).select("vec_id", "embedding")
    n = emb.count()
    per = (n + args.n_batches - 1) // args.n_batches
    bounds = [(b * per, (b + 1) * per) for b in range(args.n_batches)]

    root = tempfile.mkdtemp(prefix="stream_ann_bench_")
    inbox = os.path.join(root, "inbox")
    os.makedirs(inbox)
    index_root = os.path.join(root, "index")
    queries = (
        emb.where((F.col("vec_id") < per) & (F.col("vec_id") % args.qmod == 0))
        .localCheckpoint(eager=True)
    )
    n_q = queries.count()

    curve: list[dict] = []
    try:
        for b, (lo, hi) in enumerate(bounds):
            rows = (
                emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
                .toPandas()
                .to_dict("records")
            )
            with open(os.path.join(inbox, f"b{b}.json"), "w") as f:
                for r in rows:
                    f.write(json.dumps(
                        {"vec_id": int(r["vec_id"]),
                         "embedding": [float(x) for x in r["embedding"]]}
                    ) + "\n")
            stream = spark.readStream.schema(
                "vec_id long, embedding array<double>"
            ).json(inbox)
            t0 = time.perf_counter()
            q = (
                stream_ann_ingest(
                    stream,
                    index_root,
                    os.path.join(root, "ckpt"),
                    quantize_bits=20,
                    compact_files_per_cell=args.compact_files_per_cell,
                    store_codes=args.store_codes,
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            dt = time.perf_counter() - t0

            stored = spark.read.parquet(os.path.join(index_root, "assignments"))
            model = spark.read.parquet(os.path.join(index_root, "centroids"))
            counts = bucket_file_counts(stored, "centroid_id")
            probe_fn = (
                ann_ivf_query_stored_int8 if args.store_codes
                else ann_ivf_query_stored
            )
            t1 = time.perf_counter()
            probed = probe_fn(
                model, stored, queries, trust_layout=True
            ).count()
            probe_sec = time.perf_counter() - t1
            rec = {
                "batch": b,
                "batch_vecs": len(rows),
                "sec": round(dt, 2),
                "stored_rows": stored.count(),
                "probe_sec": round(probe_sec, 2),
                "probe_rows": probed,
                "max_files_per_cell": max(counts.values()) if counts else 0,
            }
            curve.append(rec)
            print(json.dumps(rec), flush=True)
    except BaseException:
        shutil.rmtree(root, ignore_errors=True)
        raise

    # the drift phase reuses the live index; cleanup happens after it
    drift_rec = None
    if args.drift:
        # one more 1000-vector batch, every vector "drifted" (floor
        # above 1.0): the sink re-materializes over stored ∪ batch and
        # swaps. The measured time is the remedy's whole bill — train
        # + full re-assignment + layout-aware write + two renames.
        rows = (
            emb.where(F.col("vec_id") < 1000)
            .toPandas().to_dict("records")
        )
        with open(os.path.join(inbox, "drift.json"), "w") as f:
            for r in rows:
                f.write(json.dumps(
                    {"vec_id": int(r["vec_id"]) + 10_000_000,
                     "embedding": [float(x) for x in r["embedding"]]}
                ) + "\n")
        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).json(inbox)
        t0 = time.perf_counter()
        q = (
            stream_ann_ingest(
                stream, index_root, os.path.join(root, "ckpt"),
                quantize_bits=20,
                compact_files_per_cell=args.compact_files_per_cell,
                max_below_floor_share=0.5, sim_floor=1.0001,
                rebuild_on_drift=True,
                store_codes=args.store_codes,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rebuild_sec = time.perf_counter() - t0
        stored = spark.read.parquet(os.path.join(index_root, "assignments"))
        model = spark.read.parquet(os.path.join(index_root, "centroids"))
        t1 = time.perf_counter()
        probe_fn(model, stored, queries, trust_layout=True).count()
        drift_rec = {
            "rebuild_sec": round(rebuild_sec, 2),
            "rows_after": stored.count(),
            "cells_after": model.count(),
            "probe_sec_after": round(time.perf_counter() - t1, 2),
        }
        print(json.dumps({"drift_rebuild": drift_rec}), flush=True)
    shutil.rmtree(root, ignore_errors=True)

    artifact = {
        "src": args.src, "n_vectors": n, "n_batches": args.n_batches,
        "n_queries": n_q,
        "compact_files_per_cell": args.compact_files_per_cell,
        "store_codes": args.store_codes,
        "curve": curve,
    }
    # slope over the APPEND batches only (batch 0 is the bootstrap
    # train, a different code path)
    secs = [r["sec"] for r in curve[1:]]
    if len(secs) >= 6:
        artifact["slope"] = round(sum(secs[-3:]) / sum(secs[:3]), 3)
        psecs = [r["probe_sec"] for r in curve[1:]]
        artifact["probe_slope"] = round(sum(psecs[-3:]) / sum(psecs[:3]), 3)
    if drift_rec is not None:
        artifact["drift_rebuild"] = drift_rec
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
    print(json.dumps({k: v for k, v in artifact.items() if k != "curve"}))


if __name__ == "__main__":
    main()
