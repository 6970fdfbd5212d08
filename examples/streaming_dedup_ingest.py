"""Continuously ingest document micro-batches into a near-dup-free corpus.

The streaming composition, end to end — the arrival-side complement of
examples/build_pretraining_corpus.py (which dedups a corpus that
already landed):

  1. watch   — a file-source stream over an inbox directory (swap for
               Kafka in production; the sink logic is source-agnostic)
  2. check   — each micro-batch runs the INCREMENTAL MinHash tier
               against the standing corpus (operators/dedup.py::
               dedup_minhash_incremental): batch-bands ⋈ all-bands, so
               per-batch cost tracks the batch's band collisions, never
               corpus × corpus
  3. resolve — batch-internal near-dup clusters collapse to their
               canonical (min-id) member via connected components
  4. land    — survivors append to the corpus parquet; every detected
               pair appends to an audit log with its batch id
  5. state    — survivors' MinHash signatures append to a state table
               (operators/dedup.py::minhash_signature_table), so the
               NEXT batch probes stored state instead of re-hashing
               the corpus — per-batch cost is |batch| signatures
  6. replay-safe — a re-delivered batch anti-joins ids already landed
               (at-least-once delivery cannot re-append survivors or
               trip the disjointness guard), and the state table
               self-heals from the corpus if an append was lost

Run (drains whatever is in the inbox, then exits):

    python examples/streaming_dedup_ingest.py \
        [--inbox ./ingest_inbox] [--corpus ./corpus_out] \
        [--pairs ./pairs_audit] [--checkpoint ./ingest_ckpt]

Seed the inbox with JSON-lines files shaped {"doc_id": long,
"text": str} — e.g. re-land a testdata slice:

    python -c "
import duckdb
duckdb.sql(\"\"\"COPY (SELECT doc_id, text FROM
  read_parquet('/root/testdata/sf0.01/documents.parquet'))
  TO 'ingest_inbox/batch1.json' (FORMAT JSON)\"\"\")"
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inbox", default="./ingest_inbox")
    ap.add_argument("--corpus", default="./corpus_out")
    ap.add_argument("--pairs", default="./pairs_audit")
    ap.add_argument("--checkpoint", default="./ingest_ckpt")
    ap.add_argument("--sigs", default="./sigs_state",
                    help="MinHash state table: batches probe stored "
                         "signatures instead of re-hashing the corpus")
    ap.add_argument("--band-index", default=None,
                    help="optional band-bucketed probe index path "
                         "(round 9): partition-pruned per-batch band "
                         "reads — the layout for corpus-state sizes "
                         "where a full per-batch scan dominates; at "
                         "measured single-node scales the default "
                         "(off) is faster (BASELINE.md sf10 addendum). "
                         "Left unset, the ingest auto-enables the "
                         "index beside the sigs table once stored "
                         "state crosses 64 GiB (band_index_auto_bytes)")
    ap.add_argument("--resplit-check", type=int, default=None,
                    help="auto re-split trigger (round 11): every Nth "
                         "batch the INCOMING batch's distribution is "
                         "probed; after --resplit-misses consecutive "
                         "agreeing disagreements with the adopted split, "
                         "the stored state re-materializes under the new "
                         "pick and swaps atomically. Unset = the sticky "
                         "split stays until a human re-materializes "
                         "(resplit_signature_state)")
    ap.add_argument("--resplit-misses", type=int, default=3)
    args = ap.parse_args()

    from ffi_etl_spark.session import get_session
    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    spark = get_session("streaming-dedup-ingest")
    os.makedirs(args.inbox, exist_ok=True)

    docs = spark.readStream.schema("doc_id long, text string").json(args.inbox)
    query = (
        stream_dedup_ingest(docs, args.corpus, args.pairs, args.checkpoint,
                            sigs_path=args.sigs,
                            band_index_path=args.band_index,
                            resplit_check_batches=args.resplit_check,
                            resplit_after_misses=args.resplit_misses)
        .trigger(availableNow=True)  # drain the backlog once, then exit
        .start()
    )
    query.awaitTermination()

    try:
        corpus = spark.read.parquet(args.corpus)
        print(f"corpus: {corpus.count()} near-dup-free documents at {args.corpus}")
    except Exception:
        print("corpus: empty (inbox had no documents)")
    try:
        pairs = spark.read.parquet(args.pairs)
        print(f"audit:  {pairs.count()} detected near-dup pairs at {args.pairs}")
    except Exception:
        print("audit:  no pairs detected")


if __name__ == "__main__":
    main()
