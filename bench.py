"""Headline-query benchmark.

Runs the engine's representative queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a cheap-but-complete action (count on the
final plan) so timing covers scan → transform → shuffle → result
without driver-side materialization skew from huge collects.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline spines: scan→agg (q1), join→agg→topk (q3), the reference's
# full gold pipeline (census_merge), the union roll-up, and one
# representative per extension family (dedup / similarity / text / events).
HEADLINE = [
    "tpch_q1",
    "tpch_q3_top10",
    "census_merge",
    "union_rollup_multi",
    "rollup_demographic",
    "dedup_minhash",
    "dedup_minhash_incremental",
    # round-7: the self-tuning tier (probe -> choose_minhash_split ->
    # banded verify) — benched beside the default tier so the measured
    # 1.4x-at-sf1 scaling claim (BASELINE.md §scaling) is guarded
    # round-over-round
    "dedup_minhash_adaptive",
    "dedup_simhash",
    "knn_bruteforce",
    "ann_ivf_topk",
    "text_stats",
    "sessionize",
    "multimodal_frames",
    "skew_salted_join",
    # round-4b: the heaviest new operator (token-8-gram cross-split
    # probe join) — tracked so its cost has a recorded floor
    "split_leakage_audit",
    # round-4c: the IVM flagship — merge-of-partials maintenance shape
    "incremental_agg_maintenance",
    # round-5: exact-substring span scrub — the heaviest new text
    # operator (gram df + covered-window anti-join + per-doc rebuild)
    "dedup_span_scrub",
    # round-5b: the 16-round statically-unrolled Viterbi DP (tokenizer
    # family ceiling) and the one-plan NB train+score (C-fold scoring
    # fanout) — recorded so the iterative/checkpoint cost has a floor
    "unigram_lm_segment",
    "nb_lang_train_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entry_mod
    from ffi_etl_spark.session import get_session

    spark = get_session("bench")
    qs = entry_mod.queries()

    # warm the JVM + parquet footers once, outside the timed region
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    # warm the Python worker pool (spawn + pandas/pyarrow import is a
    # one-time per-executor cost on a real cluster, not per-query work);
    # spark.python.worker.reuse keeps these workers alive for the run
    spark.range(256).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    # warm generic engine paths the first dedup/text query would otherwise
    # pay for inside its timed region (per-JVM one-time costs a long-lived
    # cluster amortizes): GenerateExec (explode), md5/conv, ObjectHashAgg
    # (collect_set), the block-manager persist path, and broadcast-join
    # machinery. Tiny synthetic input; the real queries' own stages still
    # codegen+compile cold inside their timing.
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    tiny = (
        spark.range(1000)
        .select("id", F.explode(F.sequence(F.lit(1), F.lit(3))).alias("_i"))
        .select(
            "id",
            F.conv(F.substring(F.md5(F.col("_i").cast("string")), 1, 8), 16, 10)
            .cast("long")
            .alias("_h"),
        )
    )
    agg = tiny.groupBy("id").agg(F.collect_set("_h").alias("hs")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    agg.count()
    agg.join(
        F.broadcast(agg.select(F.col("id").alias("id2"))), F.col("id") == F.col("id2")
    ).count()
    agg.unpersist()

    # optional subset: `python bench.py dedup_minhash tpch_q1` while
    # iterating on one line's plan
    only = set(sys.argv[1:])
    timed = [n for n in HEADLINE if not only or n in only]

    # median-of-N (default 3): single draws shipped a 2.4x skew-line
    # outlier in BENCH_r04 that the repo's own >=3-run-median rule would
    # have smoothed (VERDICT r04 item 3) — the recorded artifact now
    # follows the same rule as BASELINE.md. Cache is cleared between
    # repeats, so each draw re-executes the full plan; JVM/codegen warmth
    # carries across draws, which is the steady state a long-lived
    # cluster sees anyway.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    def _median(xs: list[float]) -> float:
        xs = sorted(xs)
        mid = len(xs) // 2
        return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2.0

    def _timed_count(build) -> float:
        t0 = time.perf_counter()
        build().count()
        dt = time.perf_counter() - t0
        # isolation between draws/queries: drop persisted signature
        # tables etc. so nothing is timed under a predecessor's footprint
        spark.catalog.clearCache()
        return dt

    timings: dict[str, float] = {}
    total = 0.0
    for name in timed:
        fn = qs.get(name)
        if fn is None:
            continue
        draws = [_timed_count(lambda: fn(spark, sf_dir)) for _ in range(runs)]
        dt = _median(draws)
        timings[name] = round(dt, 3)
        total += dt
        print(
            f"# {name}: median {dt:.3f}s of {[round(d, 3) for d in draws]}",
            file=sys.stderr,
        )

    # skew lever, measured: the unsalted twin of skew_salted_join runs the
    # same shuffle join with the hot key serialized through one reducer
    # task — stderr-only context for the salted line above. Only run it
    # when the salted line itself was timed (a subset bench shouldn't
    # pay ~5s for a comparison it can't print).
    if "skew_salted_join" in timings:
        from ffi_etl_spark.queries_pkg.breadth import skew_join_plain

        draws = [_timed_count(lambda: skew_join_plain(spark, sf_dir)) for _ in range(runs)]
        dt_plain = _median(draws)
        print(
            f"# skew_join_plain (unsalted twin): median {dt_plain:.3f}s vs salted "
            f"{timings['skew_salted_join']:.3f}s",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
