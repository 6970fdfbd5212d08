"""Per-batch cost curve of the streaming dedup ingest (round 8).

The 100 TB question for `stream_dedup_ingest` is not one batch's wall
clock — it is the SHAPE of per-batch cost as the standing corpus grows:
the design claim (SCALING.md) is that each batch pays |batch|
signatures + a probe join against stored state, so batch N should cost
roughly what batch 1 did even though the corpus is N× larger. This
script measures that curve end to end through the REAL sink
(foreachBatch + parquet state, adaptive default split), not a stripped
re-implementation:

  * the synthetic high-ambient corpus (tools/gen_testdata.py) is split
    into `n_batches` equal slices by doc_id;
  * each slice lands as a JSON file and is drained with
    trigger(availableNow) — one full stream lifecycle per batch, so the
    measured time includes the reconcile probe, the layout gate, the
    state append, everything a production micro-batch pays;
  * per-batch wall time, corpus size, state size and found pairs print
    as one JSON line per batch.

Usage: python tools/bench_stream_ingest.py [docs_parquet] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "testdata_local/sf1/documents.parquet"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from ffi_etl_spark.session import get_session
    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    spark = get_session("bench-stream-ingest")
    docs = spark.read.parquet(src).select("doc_id", "text")
    n = docs.count()
    per = (n + n_batches - 1) // n_batches

    root = tempfile.mkdtemp(prefix="stream_ingest_bench_")
    inbox = os.path.join(root, "inbox")
    os.makedirs(inbox)
    corpus_path = os.path.join(root, "corpus")
    pairs_path = os.path.join(root, "pairs")
    sigs_path = os.path.join(root, "sigs")

    try:
        for b in range(n_batches):
            lo, hi = b * per, (b + 1) * per
            rows = (
                docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
                .toPandas()
                .to_dict("records")
            )
            with open(os.path.join(inbox, f"b{b}.json"), "w") as f:
                for r in rows:
                    f.write(json.dumps(r) + "\n")
            stream = spark.readStream.schema("doc_id long, text string").json(inbox)
            t0 = time.perf_counter()
            q = (
                stream_dedup_ingest(
                    stream,
                    corpus_path,
                    pairs_path,
                    os.path.join(root, "ckpt"),
                    sigs_path=sigs_path,
                    fast=True,
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            dt = time.perf_counter() - t0
            corpus_n = spark.read.parquet(corpus_path).count()
            sigs_n = spark.read.parquet(sigs_path).count()
            try:
                pairs_n = spark.read.parquet(pairs_path).count()
            except Exception:
                pairs_n = 0
            print(
                json.dumps(
                    {
                        "batch": b,
                        "batch_docs": len(rows),
                        "sec": round(dt, 2),
                        "corpus_docs": corpus_n,
                        "state_rows": sigs_n,
                        "pairs_total": pairs_n,
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
