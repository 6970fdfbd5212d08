"""Streaming lifecycle of the persisted ANN index (round 10).

The batch lifecycle (`examples/ann_index_maintenance.py`) driven
through Structured Streaming instead: vectors land as JSON files in a
watch directory, and `stream_ann_ingest` maintains the
`ivf_index_tables` layout — bootstrap build on the first micro-batch,
adopt-never-retrain appends, per-cell compaction, replay idempotence
via the stored-id anti-join. Run it twice with the same --input and
the second run appends nothing.

Run:

    python examples/stream_ann_index.py \
        [--input /root/testdata/sf0.01/embeddings.parquet] \
        [--index ./stream_ivf_index] [--batches 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ffi_etl_spark.operators.similarity import ann_ivf_query_stored
from ffi_etl_spark.streaming.ann_ingest import stream_ann_ingest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01/embeddings.parquet")
    ap.add_argument("--index", default="./stream_ivf_index")
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--store-codes", action="store_true",
                    help="maintain the int8-coded layout (codes "
                         "column + codebook) through bootstrap, "
                         "appends, and any drift rebuild — serves "
                         "the code-space probe tier "
                         "(ann_ivf_query_stored_int8)")
    args = ap.parse_args()

    from ffi_etl_spark.session import get_session

    spark = get_session("stream-ann-index")
    emb = spark.read.parquet(args.input)
    n = emb.count()
    per = max(1, n // args.batches)

    # land the vector stream as JSON micro-batch files
    in_dir = tempfile.mkdtemp(prefix="ann_stream_in_")
    for b in range(args.batches):
        lo, hi = b * per, (b + 1) * per if b < args.batches - 1 else n
        rows = emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).select("vec_id", "embedding").collect()
        with open(os.path.join(in_dir, f"b{b}.json"), "w") as f:
            for r in rows:
                f.write(json.dumps(
                    {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
                ) + "\n")

    shutil.rmtree(args.index, ignore_errors=True)
    ckpt = tempfile.mkdtemp(prefix="ann_stream_ckpt_")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)  # one landed file per micro-batch
        .json(in_dir)
    )
    q = (
        stream_ann_ingest(stream, args.index, ckpt,
                          store_codes=args.store_codes)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    model = spark.read.parquet(os.path.join(args.index, "centroids"))
    stored = spark.read.parquet(os.path.join(args.index, "assignments"))
    print(f"indexed: {stored.count()} vectors in {model.count()} cells "
          f"(bootstrap batch trained the model; later batches adopted it)")

    queries = emb.filter(F.col("vec_id") % 100 == 0)
    top = ann_ivf_query_stored(model, stored, queries, k=5)
    print(f"queried: {top.count()} (query, neighbor) rows at k=5")
    top.orderBy("query_id", "rank").show(10, truncate=False)

    # replay the same backlog on a fresh checkpoint: appends nothing
    q2 = (
        stream_ann_ingest(
            spark.readStream.schema("vec_id long, embedding array<double>")
            .json(in_dir),
            args.index,
            tempfile.mkdtemp(prefix="ann_stream_ckpt2_"),
            store_codes=args.store_codes,
        )
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    n2 = spark.read.parquet(os.path.join(args.index, "assignments")).count()
    print(f"replay: index still {n2} rows (stored-id anti-join)")

    # drift remedy, wired (round 11): a batch the stored quantizer no
    # longer describes trips the contract; with rebuild_on_drift the
    # sink re-materializes over stored ∪ batch and atomically swaps
    # instead of failing the stream. sim_floor above 1.0 makes EVERY
    # vector "drifted" so the path demonstrably fires here.
    drift_dir = tempfile.mkdtemp(prefix="ann_stream_drift_")
    with open(os.path.join(drift_dir, "d0.json"), "w") as f:
        for r in emb.filter(F.col("vec_id") < 10).collect():
            f.write(json.dumps(
                {"vec_id": int(r["vec_id"]) + 10_000_000,
                 "embedding": list(r["embedding"])}
            ) + "\n")
    mid_before = model.select("_model_id").first()[0]
    q3 = (
        stream_ann_ingest(
            spark.readStream.schema("vec_id long, embedding array<double>")
            .json(drift_dir),
            args.index,
            tempfile.mkdtemp(prefix="ann_stream_ckpt3_"),
            max_below_floor_share=0.5,
            sim_floor=1.0001,
            rebuild_on_drift=True,
            # the rebuild re-materializes from scratch: keep the coded
            # layout through the drift event too (round 12)
            store_codes=args.store_codes,
        )
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination(300)
    model3 = spark.read.parquet(os.path.join(args.index, "centroids"))
    n3 = spark.read.parquet(os.path.join(args.index, "assignments")).count()
    print(
        f"drift rebuild: index now {n3} rows under model_id "
        f"{model3.select('_model_id').first()[0]} (was {mid_before}) — "
        "re-materialized over stored + batch and swapped atomically"
    )


if __name__ == "__main__":
    main()
