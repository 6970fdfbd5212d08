"""Amortization curve of the persisted IVF index (round 9, late session).

The claim behind ``ivf_index_tables`` / ``ann_ivf_query_stored`` is an
economics claim: ``ann_ivf_autok`` pays the n·√n build (quantizer
training + full-corpus assignment) INSIDE every call, while the stored
index pays it once and each query batch pays only q·nprobe·√n scoring
plus the probed cells' (partition-pruned) read. This script measures
exactly that trade end to end on the real tables:

  * ``stored``: one timed build+write (the amortized cost), then
    ``n_batches`` timed probe batches against the parquet index;
  * ``rebuild``: the same ``n_batches`` query batches, each through a
    full ``ann_ivf_autok`` call (build-per-call — what a user without
    the stored index runs).

Per-batch wall seconds print as one JSON line each; the summary line
gives the crossover arithmetic (after how many batches the stored
index has paid for itself).

Usage:
  python tools/bench_ivf_stored.py [embeddings_parquet] [n_batches] \
      [--out BENCH_IVF_STORED.json]
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
    ap.add_argument("n_batches", nargs="?", type=int, default=5)
    ap.add_argument("--out", default=None)
    ap.add_argument("--rebuild-runs", type=int, default=None,
                    help="cap the build-per-call arm (default: "
                         "n_batches) — at large n each run re-pays the "
                         "full build, so one run already fixes the mean")
    ap.add_argument("--appends", type=int, default=0,
                    help="append-churn phase (VERDICT r09 item 5): "
                         "build a second index on half the corpus, "
                         "append the rest in this many batches (probe "
                         "timed after each), then compact crowded "
                         "cells and probe again — the probe latency "
                         "must stay flat, not grow a parquet footer "
                         "open per append")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ffi_etl_spark.operators.similarity import (
        ann_ivf_autok,
        ann_ivf_query_stored,
        ivf_index_append,  # noqa: F401  (documented sibling; not timed here)
        ivf_index_tables,
        write_ivf_assignments,
    )
    from ffi_etl_spark.session import get_session

    spark = get_session("bench-ivf-stored")
    # Input-layout normalization, load-bearing: the synthetic parquet
    # is ONE file with ONE row group (pyarrow's default 1M-row groups),
    # and Spark cannot parallelize inside a row group — without this
    # repartition every narrow stage over the corpus (the full
    # assignment above all) runs as a single task (measured at sf10:
    # one core at 100% for 30+ min while 31 idled). A production corpus
    # arrives as many files; this pins the bench to that layout. The
    # localCheckpoint materializes the repartitioned rows so the
    # exchange is paid once, not inside every timed line.
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    emb = spark.read.parquet(args.src).repartition(nparts).localCheckpoint()
    n = emb.count()
    # one warmup job so the first timed line is not paying executor spin-up
    emb.limit(10).count()

    root = tempfile.mkdtemp(prefix="ivf_stored_bench_")
    cpath, apath = os.path.join(root, "centroids"), os.path.join(root, "assignments")
    rows: list[dict] = []

    t0 = time.monotonic()
    centroids, assignments = ivf_index_tables(emb)
    centroids.write.parquet(cpath)
    write_ivf_assignments(assignments, apath)
    build_sec = round(time.monotonic() - t0, 2)
    rows.append({"mode": "stored", "step": "build", "sec": build_sec, "n": n})
    print(json.dumps(rows[-1]), flush=True)

    model = spark.read.parquet(cpath)
    index = spark.read.parquet(apath)
    probe_secs = []
    for b in range(args.n_batches):
        queries = emb.filter(F.col("vec_id") % (args.n_batches * 20) == b)
        t0 = time.monotonic()
        cnt = ann_ivf_query_stored(model, index, queries).count()
        sec = round(time.monotonic() - t0, 2)
        probe_secs.append(sec)
        rows.append({"mode": "stored", "step": f"probe{b}", "sec": sec, "rows": cnt})
        print(json.dumps(rows[-1]), flush=True)

    rebuild_secs = []
    n_rebuild = args.n_batches if args.rebuild_runs is None else args.rebuild_runs
    for b in range(n_rebuild):
        queries = emb.filter(F.col("vec_id") % (args.n_batches * 20) == b)
        t0 = time.monotonic()
        cnt = ann_ivf_autok(emb, queries).count()
        sec = round(time.monotonic() - t0, 2)
        rebuild_secs.append(sec)
        rows.append({"mode": "rebuild", "step": f"query{b}", "sec": sec, "rows": cnt})
        print(json.dumps(rows[-1]), flush=True)

    churn = None
    if args.appends:
        from ffi_etl_spark.operators.similarity import (
            append_ivf_assignments,
            compact_ivf_assignments,
            ivf_index_append,
        )

        half = emb.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
        base = emb.filter(F.col("vec_id") < half)
        rest = emb.filter(F.col("vec_id") >= half).localCheckpoint()
        hi = rest.agg(F.max("vec_id")).first()[0]
        per = max(1, (int(hi) - int(half) + 1) // args.appends + 1)
        c2, a2 = os.path.join(root, "c2"), os.path.join(root, "a2")
        cents2, assigns2 = ivf_index_tables(base)
        cents2.write.parquet(c2)
        write_ivf_assignments(assigns2, a2)
        model2 = spark.read.parquet(c2)
        queries = emb.filter(F.col("vec_id") % 199 == 0).localCheckpoint()

        def max_files_per_cell() -> int:
            import re
            from collections import Counter

            cnt: Counter = Counter()
            for f in spark.read.parquet(a2).inputFiles():
                m = re.search(r"centroid_id=(\d+)/", f)
                if m:
                    cnt[int(m.group(1))] += 1
            return max(cnt.values()) if cnt else 0

        churn_rows = []
        for b in range(args.appends):
            lo = int(half) + b * per
            batch = rest.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + per)
            )
            append_ivf_assignments(
                ivf_index_append(model2, spark.read.parquet(a2), batch), a2
            )
            t0 = time.monotonic()
            cnt = ann_ivf_query_stored(
                model2, spark.read.parquet(a2), queries
            ).count()
            sec = round(time.monotonic() - t0, 2)
            churn_rows.append(
                {"mode": "churn", "step": f"append{b}", "probe_sec": sec,
                 "rows": cnt, "max_files_per_cell": max_files_per_cell()}
            )
            print(json.dumps(churn_rows[-1]), flush=True)
        t0 = time.monotonic()
        # threshold 4 (not the production 16) so a 10-append run
        # demonstrates the compaction path, not just the bounded
        # one-file-per-cell-per-append write discipline
        n_comp = compact_ivf_assignments(spark, a2, files_per_cell=4)
        compact_sec = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        cnt = ann_ivf_query_stored(
            model2, spark.read.parquet(a2), queries
        ).count()
        post_sec = round(time.monotonic() - t0, 2)
        churn = {
            "appends": args.appends,
            "probe_secs": [r["probe_sec"] for r in churn_rows],
            "max_files_per_cell_final": max_files_per_cell(),
            "cells_compacted": n_comp,
            "compact_sec": compact_sec,
            "probe_sec_post_compact": post_sec,
            "probe_rows_post_compact": cnt,
        }
        print(json.dumps({"mode": "churn", "summary": churn}), flush=True)
        rows.extend(churn_rows)

    probe = sum(probe_secs) / len(probe_secs)
    rebuild = sum(rebuild_secs) / len(rebuild_secs)
    summary = {
        "src": args.src,
        "n_vectors": n,
        "build_sec": build_sec,
        "probe_sec_mean": round(probe, 2),
        "rebuild_sec_mean": round(rebuild, 2),
        # batches until build+probes < rebuild-per-call; inf if probes
        # alone already exceed a rebuild (the index would never pay)
        "breakeven_batches": (
            round(build_sec / (rebuild - probe), 1) if rebuild > probe else None
        ),
    }
    if churn is not None:
        summary["churn"] = churn
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "rows": rows}, f, indent=1)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
