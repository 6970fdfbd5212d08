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
    # round-over-round. NOTE (ADVICE r07): the registered query is
    # md5-pinned (fast=False) for oracle parity; the production
    # fast=True tier is benched separately as
    # dedup_minhash_adaptive_fast below (EXTRA_BENCH).
    "dedup_minhash_adaptive",
    "dedup_simhash",
    "knn_bruteforce",
    "ann_ivf_topk",
    # round-8 (VERDICT r07 item 3): the self-scaling IVF — guards the
    # build-n^1.5 / query-sqrt(n) split round-over-round instead of a
    # one-time BASELINE.md §autok record
    "ann_ivf_autok",
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


def _adaptive_fast(spark, sf_dir):
    """The PRODUCTION adaptive-MinHash tier (fast=True: engine-private
    xxhash64 signatures, ~2-4× cheaper than md5) — benched beside the
    md5-pinned registered query so the configuration the scaling claim
    is about is the one the guard measures (ADVICE r07 item 3)."""
    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.operators.dedup import dedup_minhash_adaptive

    return dedup_minhash_adaptive(table(spark, sf_dir, "documents"))


_STORED_IVF: dict = {}


def _ann_ivf_stored_probe(spark, sf_dir):
    """Round-10 guard line: the PER-BATCH cost of the persisted IVF
    index (`ann_ivf_query_stored` over parquet state) — the quantity
    the build/query split exists to amortize, benched beside
    `ann_ivf_autok` (which pays the build inside every call). The
    index is built once per bench process (first draw; the
    median-of-N then reports the steady-state probe, exactly how a
    query batch sees an index built long ago). Tracks the
    BENCH_IVF_STORED_r10 measurement round-over-round at gate scale."""
    import tempfile

    from pyspark.sql import functions as F

    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.operators.similarity import (
        ann_ivf_query_stored,
        ivf_index_tables,
        write_ivf_assignments,
    )

    if sf_dir not in _STORED_IVF:
        root = tempfile.mkdtemp(prefix="bench_ivf_stored_")
        c, a = os.path.join(root, "c"), os.path.join(root, "a")
        cents, assigns = ivf_index_tables(table(spark, sf_dir, "embeddings"))
        cents.write.parquet(c)
        write_ivf_assignments(assigns, a)
        _STORED_IVF[sf_dir] = (c, a)
    c, a = _STORED_IVF[sf_dir]
    queries = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 100 == 0)
    return ann_ivf_query_stored(
        spark.read.parquet(c), spark.read.parquet(a), queries
    )


# non-registry bench lines (no DuckDB oracle by design: engine-private
# hash tiers / state built outside the timed region); timed with the
# same median-of-N machinery as HEADLINE
EXTRA_BENCH = {
    "dedup_minhash_adaptive_fast": _adaptive_fast,
    "ann_ivf_stored_probe": _ann_ivf_stored_probe,
}

# VERDICT r08 item 6: lines whose round-over-round draws have spanned
# >1.5x on an UNCHANGED plan (nb_lang_train_score 1.13-2.69s across
# r06-r08; the MinHash tiers document 2-4x co-tenant swings in
# BASELINE.md). These take median-of-5 instead of the default 3 — they
# are 1-4s lines, so the extra draws cost ~20s total and buy bands
# tight enough that a real 1.5x regression is distinguishable from
# noise. Everything else stays at the default (SPARK_GRAFT_BENCH_RUNS).
HIGH_VARIANCE = {
    "nb_lang_train_score",
    "dedup_minhash",
    "dedup_minhash_incremental",
    "dedup_minhash_adaptive",
    "dedup_minhash_adaptive_fast",
}

# Host-floor reference (VERDICT r07 item 5): a pinned scan+agg plan
# timed FIRST each run; its ratio to the recorded base separates
# host/co-tenant drift from plan regressions when comparing rounds
# (BENCH_r07's raw total read 1.3x worse than the same-session
# median-of-3 purely from floor swing). Base = median floor_sec at
# sf0.1 on this container, recorded round 8.
_FLOOR_BASE_SF01 = 0.35  # round-8 session: median floor 0.30-0.42s across 4 fresh sessions


def _floor_probe(spark, sf_dir):
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return df.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c")
    )


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
    all_lines = HEADLINE + list(EXTRA_BENCH)
    timed = [n for n in all_lines if not only or n in only]

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

    # host-floor reference line: timed first, after warmup, outside the
    # headline total — pure scan+agg whose plan never changes round to
    # round, so its drift is the HOST's, not the engine's
    floor_draws = [
        _timed_count(lambda: _floor_probe(spark, sf_dir)) for _ in range(runs)
    ]
    floor_sec = _median(floor_draws)
    print(
        f"# host_floor: median {floor_sec:.3f}s of "
        f"{[round(d, 3) for d in floor_draws]}",
        file=sys.stderr,
    )

    timings: dict[str, float] = {}
    total = 0.0
    for name in timed:
        fn = qs.get(name) or EXTRA_BENCH.get(name)
        if fn is None:
            continue
        n_draws = max(runs, 5) if name in HIGH_VARIANCE else runs
        draws = [_timed_count(lambda: fn(spark, sf_dir)) for _ in range(n_draws)]
        dt = _median(draws)
        timings[name] = round(dt, 3)
        # EXTRA_BENCH lines are tier twins of queries already in
        # HEADLINE — recorded per-line but EXCLUDED from the total, so
        # cross-round total comparisons aren't inflated by a
        # metric-definition change (review r08)
        if name not in EXTRA_BENCH:
            total += dt
        print(
            f"# {name}: median {dt:.3f}s of {[round(d, 3) for d in draws]}"
            + (" (excluded from total)" if name in EXTRA_BENCH else ""),
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

    out = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "floor_sec": round(floor_sec, 3),
    }
    if sf == 0.1 and _FLOOR_BASE_SF01:
        # >1 means the host is slower than the recorded base today:
        # divide the round's totals by this before cross-round reads
        out["floor_base_sec"] = _FLOOR_BASE_SF01
        out["floor_ratio"] = round(floor_sec / _FLOOR_BASE_SF01, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
