"""Scaling-ladder rows for the self-tuning defaults (VERDICT r08 item 3).

Each prior decade surfaced a real cliff (r6: the fixed MinHash split's
n² candidates; r7: fixed-k IVF). This script times the three
self-tuning defaults — the production fast-tier adaptive MinHash, the
incremental dedup under the adopted split, and the self-scaling IVF —
at an arbitrary SF dir (round 9 adds synthetic sf10:
``python tools/gen_testdata.py 10 testdata_local/sf10
documents,embeddings``), one count()-forced run per line, same warmup
as bench.py. Rows land in BASELINE.md §scaling.

Usage: python tools/bench_ladder.py <sf_dir> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "dedup_minhash_adaptive_fast",
    "dedup_minhash_incremental_default",
    "ann_ivf_autok",
]


def _incremental_default(spark, sf_dir):
    """The gated `dedup_minhash_incremental` asserts the oracle's
    (24, 4) pin, which correctly FAILS at ladder SFs where the
    scale-aware probe picks a wider split (sf10 → (48, 6)) — the ladder
    measures the DEFAULT configuration itself (md5 tier, adopted/probed
    split, same %10 corpus/batch cut as the gate)."""
    import os as _os

    from pyspark.sql import functions as F

    from ffi_etl_spark.operators.dedup import dedup_minhash_incremental

    d = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    return dedup_minhash_incremental(corpus, batch)


LOCAL = {"dedup_minhash_incremental_default": _incremental_default}


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT

    import __spark_entry__ as entry_mod
    from bench import EXTRA_BENCH
    from ffi_etl_spark.session import get_session

    spark = get_session("bench-ladder")
    qs = entry_mod.queries()
    # same JVM/worker warmup as bench.py's cheap prefix
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    spark.range(256).repartition(8).mapInPandas(lambda it: it, schema="id long").count()

    for name in names:
        fn = qs.get(name) or EXTRA_BENCH.get(name) or LOCAL.get(name)
        if fn is None:
            print(json.dumps({"query": name, "err": "unknown"}), flush=True)
            continue
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        print(
            json.dumps(
                {"query": name, "sf_dir": sf_dir, "sec": round(dt, 2), "rows": n}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
