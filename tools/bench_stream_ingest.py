"""Per-batch cost curve of the streaming dedup ingest (rounds 8-9).

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

Round 9: measures BOTH state layouts back to back — `sigs` (doc-level
signature state only; the round-8 baseline whose measured slope was the
full-state band scan + corpus-wide verify broadcast) and `index` (plus
the band-bucketed probe index, VERDICT r08 item 1) — and can write the
two curves as one JSON artifact (`--out INGEST_r9.json`) so the loop is
guarded round-over-round like the headline bench.

Usage:
  python tools/bench_stream_ingest.py [docs_parquet] [n_batches] \
      [--modes sigs,index] [--out INGEST_rN.json]
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


def _soup_rows(n: int, start: int = 10_000_000) -> list[dict]:
    """Deterministic low-ambient filler docs (every doc fully distinct
    — the round-11 trigger test's soup): the bootstrap corpus whose
    probe pick is the cheap default split, so a later shift to the
    high-ambient src distribution is a REAL split drift."""
    return [
        {
            "doc_id": start + i,
            "text": " ".join(
                f"w{((start + i) * 31 + j * 7919) % 104729}" for j in range(30)
            ),
        }
        for i in range(n)
    ]


def run_mode(
    spark,
    docs,
    n_batches: int,
    mode: str,
    trickle: bool = False,
    n_band_buckets: int | None = None,
    resplit_check_batches: int | None = None,
    resplit_after_misses: int = 3,
    shift_soup_batches: int = 0,
) -> list[dict]:
    """``trickle=False``: n_batches equal slices (the steady-ingest
    curve). ``trickle=True``: ONE big batch lands all but 100 docs,
    then five 20-doc micro-batches — the regime VERDICT r08 item 1
    names ("a 100 TB corpus with small micro-batches"), where the band
    index's partition pruning actually bites: a 20-doc batch touches
    ≤ 20·bands band keys, a small fraction of a 256-bucket index."""
    from pyspark.sql import functions as F

    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    n = docs.count()
    soup_batches: list[list[dict]] = []
    if trickle:
        bounds = [(0, n - 100)] + [
            (n - 100 + i * 20, n - 100 + (i + 1) * 20) for i in range(5)
        ]
    else:
        per = (n + n_batches - 1) // n_batches
        bounds = [(b * per, (b + 1) * per) for b in range(n_batches)]
        if shift_soup_batches:
            # the distribution SHIFT curve (round 12, VERDICT r11
            # item 3): the first k batches are low-ambient soup sized
            # like a src batch — the stream bootstraps on them and pins
            # the cheap default split — then the src's high-ambient
            # batches arrive and the auto re-split trigger (when
            # enabled) must detect, confirm against the blending
            # corpus, and swap mid-stream
            soup_batches = [
                _soup_rows(per, start=10_000_000 + b * per)
                for b in range(shift_soup_batches)
            ]
            bounds = [(-1, -1)] * shift_soup_batches + bounds

    root = tempfile.mkdtemp(prefix=f"stream_ingest_bench_{mode}_")
    inbox = os.path.join(root, "inbox")
    os.makedirs(inbox)
    corpus_path = os.path.join(root, "corpus")
    pairs_path = os.path.join(root, "pairs")
    sigs_path = os.path.join(root, "sigs")
    band_index_path = os.path.join(root, "bands") if mode == "index" else None

    out: list[dict] = []
    try:
        for b, (lo, hi) in enumerate(bounds):
            if b < len(soup_batches):
                rows = soup_batches[b]
            else:
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
                    band_index_path=band_index_path,
                    n_band_buckets=n_band_buckets,
                    resplit_check_batches=resplit_check_batches,
                    resplit_after_misses=resplit_after_misses,
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
            rec = {
                "mode": mode,
                "batch": b,
                "batch_docs": len(rows),
                "sec": round(dt, 2),
                "corpus_docs": corpus_n,
                "state_rows": sigs_n,
                "pairs_total": pairs_n,
            }
            if shift_soup_batches:
                # which split the state pins after this batch — the
                # batches-to-trigger record the artifact exists for
                from ffi_etl_spark.operators.dedup import (
                    infer_signature_layout,
                )

                np_, bd = infer_signature_layout(
                    spark.read.parquet(sigs_path)
                )
                rec["split"] = [np_, bd]
            out.append(rec)
            print(json.dumps(rec), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", default="testdata_local/sf1/documents.parquet")
    ap.add_argument("n_batches", nargs="?", type=int, default=10)
    ap.add_argument(
        "--modes",
        default="sigs,index",
        help="comma list of state layouts to measure: sigs (round-8 "
        "baseline), index (band-bucketed probe index)",
    )
    ap.add_argument("--out", default=None, help="write curves as one JSON artifact")
    ap.add_argument(
        "--resplit-check",
        type=int,
        default=None,
        help="pass resplit_check_batches through to the sink (round 11): "
        "measures the Nth-batch ambient-probe tax of the auto re-split "
        "trigger against the same curve without it",
    )
    ap.add_argument(
        "--trickle",
        action="store_true",
        help="one big build batch then five 20-doc micro-batches "
        "(256-bucket index) — the pruning regime",
    )
    ap.add_argument(
        "--shift",
        type=int,
        default=0,
        help="prepend this many low-ambient soup batches before the "
        "src batches (round 12): the stream bootstraps on the soup's "
        "cheap split, then the src distribution arrives — with "
        "--resplit-check set, measures batches-to-trigger (incl. the "
        "corpus-confirm's mass threshold), the in-stream swap bill, "
        "and found-pairs parity vs the same run without the trigger",
    )
    ap.add_argument(
        "--resplit-misses",
        type=int,
        default=3,
        help="resplit_after_misses passed through to the sink",
    )
    args = ap.parse_args()

    from ffi_etl_spark.session import get_session

    spark = get_session("bench-stream-ingest")
    docs = spark.read.parquet(args.src).select("doc_id", "text")

    artifact: dict = {
        "src": args.src,
        "n_batches": args.n_batches,
        "trickle": args.trickle,
        "shift_soup_batches": args.shift,
        "resplit_check": args.resplit_check,
        "resplit_after_misses": args.resplit_misses,
        "curves": {},
    }
    for mode in args.modes.split(","):
        mode = mode.strip()
        artifact["curves"][mode] = run_mode(
            spark,
            docs,
            args.n_batches,
            mode,
            trickle=args.trickle,
            n_band_buckets=256 if args.trickle else None,
            resplit_check_batches=args.resplit_check,
            resplit_after_misses=args.resplit_misses,
            shift_soup_batches=args.shift,
        )

    # slope summary: mean of last-3 per-batch seconds over mean of
    # first-3 — the number the round-over-round guard reads (a flat
    # curve sits near 1.0; round 8's sigs curve measured ~1.7)
    for mode, curve in artifact["curves"].items():
        secs = [r["sec"] for r in curve]
        if len(secs) >= 6:
            head = sum(secs[:3]) / 3
            tail = sum(secs[-3:]) / 3
            artifact.setdefault("slope", {})[mode] = round(tail / head, 3)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
    print(json.dumps({k: v for k, v in artifact.items() if k != "curves"}))


if __name__ == "__main__":
    main()
