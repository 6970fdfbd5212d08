"""Persisted ANN index lifecycle: build once, append per batch,
re-materialize on drift.

The stored-state posture the streaming dedup ingest uses for MinHash
signatures, applied to similarity search — the shape a production
embedding store actually runs:

  1. build  — train the coarse quantizer on the standing corpus and
              persist the index (ivf_index_tables): a K-row model
              (self-describing _cells/_qbits) plus per-vector
              assignments written partitionBy("centroid_id"), so every
              later probe join gets dynamic partition pruning down to
              the cells it actually touches
  2. append — each new vector batch is assigned against the STORED
              model (ivf_index_append — adopt, never retrain: rows
              assigned under different models must never share an
              assignments table) and appended; a replayed batch
              appends nothing (stored-id anti-join)
  3. drift  — before appending, ivf_quantizer_drift scores the batch
              against the model and emits an exact-integer staleness
              report; when the below-floor share crosses the budget,
              STOP appending and re-materialize (step 1) on the grown
              corpus — the recall-contract rule of the dedup family.
              (This example branches on the report to show the whole
              lifecycle; a pipeline that just wants the refusal passes
              max_below_floor_share to ivf_index_append and catches
              the ValueError, whose message carries this remedy.)
  4. query  — ann_ivf_query_stored layout-gates the pair and probes
              the grown index; results are bit-identical to a fresh
              one-pass build under the same model. The index is built
              with store_codes=True, so the same tables also serve the
              int8 CODE-SPACE probe (ann_ivf_query_stored_int8): the
              candidate scan reads the uint8 codes column instead of
              the float vectors (3.7x fewer bytes — the probe-cost
              lever when the scan is byte-bound at 100 TB) and an
              exact float re-rank of the top rerank_factor*k restores
              the float answer (recall 1.0 at factor 4 on this data)

Run:

    python examples/ann_index_maintenance.py \
        [--input /root/testdata/sf0.01/embeddings.parquet] \
        [--index ./ivf_index] [--batches 3] [--drift-share 0.5]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ffi_etl_spark.operators.similarity import (
    ann_ivf_query_stored,
    ann_ivf_query_stored_int8,
    append_ivf_assignments,
    compact_ivf_assignments,
    ivf_index_append,
    ivf_index_tables,
    ivf_quantizer_drift,
    write_ivf_assignments,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01/embeddings.parquet")
    ap.add_argument("--index", default="./ivf_index")
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--drift-share", type=float, default=0.5,
                    help="re-materialize when this share of a batch "
                         "scores below the sim floor against the "
                         "stored model")
    ap.add_argument("--sim-floor", type=float, default=0.2,
                    help="quantizer staleness floor on best-cell "
                         "cosine — dataset-dependent (the synthetic "
                         "testdata's ambient cosine is ~0.3, so 0.5 "
                         "would flag every batch)")
    args = ap.parse_args()

    from ffi_etl_spark.session import get_session

    spark = get_session("ann-index-maintenance")
    emb = spark.read.parquet(args.input)
    n = emb.count()
    base_n = n // 2
    cpath = os.path.join(args.index, "centroids")
    apath = os.path.join(args.index, "assignments")

    # 1. build on the first half
    shutil.rmtree(args.index, ignore_errors=True)
    base = emb.filter(F.col("vec_id") < base_n)
    centroids, assignments = ivf_index_tables(base, store_codes=True)
    centroids.write.parquet(cpath)  # the small model first
    write_ivf_assignments(assignments, apath)
    model = spark.read.parquet(cpath)
    print(f"built: {base_n} vectors, {model.count()} cells")

    # 2+3. stream the second half in batches, drift-gated
    per = max(1, (n - base_n) // args.batches)
    for b in range(args.batches):
        lo, hi = base_n + b * per, base_n + (b + 1) * per
        batch = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        report = ivf_quantizer_drift(model, batch, sim_floor=args.sim_floor).collect()[0]
        if not report.n_vecs:
            # empty slice (e.g. --batches > remaining vectors): the
            # global aggregate yields one row of NULLs — nothing to
            # gate or append (the ivf_index_append guard, ADVICE r09)
            print(f"batch {b}: empty slice — skipped")
            continue
        share = report.n_low / report.n_vecs
        print(f"batch {b}: n={report.n_vecs} below-floor share={share:.2f} "
              f"cells_touched={report.cells_touched}")
        if share > args.drift_share:
            # the adopted model no longer describes the data: pay the
            # rebuild on everything landed so far, then continue
            print(f"batch {b}: drift {share:.2f} > {args.drift_share} — "
                  "re-materializing the index")
            landed = emb.filter(F.col("vec_id") < hi)
            centroids, assignments = ivf_index_tables(landed, store_codes=True)
            shutil.rmtree(args.index, ignore_errors=True)
            centroids.write.parquet(cpath)
            write_ivf_assignments(assignments, apath)
            model = spark.read.parquet(cpath)
            continue
        append_ivf_assignments(
            ivf_index_append(model, spark.read.parquet(apath), batch), apath
        )
        # each append lands files into every touched cell directory;
        # compact crowded cells back to one file each so probe reads
        # don't accumulate a parquet footer open per append
        n_comp = compact_ivf_assignments(spark, apath)
        if n_comp:
            print(f"batch {b}: compacted {n_comp} crowded cell(s)")

    # 4. probe the grown index
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    top = ann_ivf_query_stored(model, spark.read.parquet(apath), queries, k=5)
    print(f"queried: {top.count()} (query, neighbor) rows at k=5")
    top.orderBy("query_id", "rank").show(10, truncate=False)

    # 4b. the same index, probed in code space (the byte-bound path):
    # integer-L2 shortlist over the codes column only, exact float
    # re-rank of the top rerank_factor*k candidates
    top8 = ann_ivf_query_stored_int8(
        model, spark.read.parquet(apath), queries, k=5, rerank_factor=4
    )
    print(f"int8 probe: {top8.count()} rows at k=5 (codes-column scan)")


if __name__ == "__main__":
    main()
