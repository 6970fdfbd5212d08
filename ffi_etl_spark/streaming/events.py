"""Structured Streaming forms of the event-time operators.

The reference is batch-only (SURVEY.md §2.10 — freshness came from
scheduled full re-runs, README.py:11). This module is the engine's
incremental path: the SAME logical transformations as
operators/windows.py, expressed over an unbounded source with
watermarks, so a pipeline can switch batch→streaming without changing
semantics (batch is the bootstrap / backfill mode, streaming the
steady state).

Design notes for scale:
  * Watermarks bound state: a window/dedup key is dropped once the
    event-time watermark passes it, so state size tracks the lateness
    budget, not history.
  * ``session_window`` is Spark's native gap-session operator — state
    per (user, open session) only.
  * Sinks are exactly-once per epoch with checkpointing; the test
    harness uses ``trigger(availableNow=True)`` + memory sink, which is
    also the production backfill pattern.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, dir_path: str) -> DataFrame:
    """File-source stream over an events parquet directory. An explicit
    schema is mandatory for streaming file sources."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(dir_path)


def stream_tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of operators/windows.tumbling_agg: watermarked
    windowed count + sum. State per (window, key), dropped past the
    watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def stream_sliding_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of operators/windows.sliding_agg: each event
    contributes to duration/slide overlapping windows. State per open
    window only — the watermark closes (and drops) a window once event
    time passes window_end + lateness budget."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Native gap-session aggregation (``session_window``). Session
    bounds match the batch lag+running-sum sessionizer for the same gap:
    a session closes when no event arrives within ``gap``."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(user_col, "n_events", "session_start", "session_end")
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked exactly-once dedup on arrival order. State holds one
    entry per key inside the lateness window only."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(keys or ["event_id"])


def stream_dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermark-bounded dedup (``dropDuplicatesWithinWatermark``): two
    records with the same key are collapsed when they arrive within the
    lateness budget of each other; a key re-appearing AFTER its state
    was evicted is emitted again.

    This is the right tier for at-least-once upstreams (Kafka producer
    retries land duplicates seconds apart, not days): unlike
    ``stream_dedup`` — whose guarantee needs the event-time column in
    the key set to bound state — this evicts on processing progress of
    the watermark alone, so unbounded key spaces (event_id over an
    infinite stream) can't grow state without bound."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_tumbling_distinct(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Watermarked tumbling approx-distinct users per window — the
    streaming audience counter. Exact streaming COUNT(DISTINCT) would
    need per-window key sets in state; HLL++ keeps fixed-size sketch
    state per window and its register-max merge is commutative, so the
    streaming result is bit-identical to the batch
    ``approx_count_distinct`` over the same data (tested)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration).alias("w"))
        .agg(F.approx_count_distinct(user_col).alias("approx_users"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "approx_users",
        )
    )


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join each micro-batch of the stream
    against a STATIC dimension (the canonical "decorate events with the
    user/customer record" shape). Stateless — Spark re-plans the static
    side per micro-batch, so a dimension refreshed in place (overwrite
    of the backing table) is picked up on the next batch without
    restarting the query.

    Scale posture: the dim side is explicitly ``broadcast`` — a
    stream-static join must never shuffle the unbounded side per batch.
    For dimensions too large for broadcast, pre-bucket the dim on the
    join key and land the stream partitioned the same way (the
    bucketed-join recipe in test_bucketing.py); left join keeps
    orphaned events (FK audit of those is `fk_integrity_audit`).
    """
    cols = (
        dim_cols if dim_cols is not None else [c for c in dim.columns if c != dim_key]
    )
    slim = dim.select(dim_key, *cols)
    return events.join(
        F.broadcast(slim), events[stream_key] == slim[dim_key], how
    ).drop(slim[dim_key])


def continuous_aggregate(
    rolled: DataFrame,
    target_path: str,
    bucket_keys: list[str],
    checkpoint: str | None = None,
):
    """Hypertable-style continuous aggregate: maintain a tumbling rollup
    as a materialized parquet table, incrementally — the TimescaleDB
    cagg / materialized-view-maintenance pattern, packaged as ONE
    operator over Spark primitives.

    ``rolled`` is a watermarked streaming aggregation (e.g.
    ``stream_tumbling_agg``); ``bucket_keys`` identify a bucket row
    (e.g. ``["window_start", "event_type"]``). Each microbatch emits
    only buckets revised by that batch (update mode); the foreachBatch
    MERGE (operators/upsert.py) replaces exactly those rows in the
    target, so late data inside the watermark re-states its bucket
    instead of appending a duplicate, and closed buckets are never
    rewritten. The reference refreshed rollups by full overwrite on a
    schedule (README.py:11, utils.py:139); at 100 TB only this
    revised-buckets-only maintenance cadence survives.

    Crash safety matches stream_upsert_sink: temp-dir + swap per batch,
    checkpoint replays an uncommitted batch (idempotent: same buckets,
    same MERGE)."""
    import os
    import shutil

    from ffi_etl_spark.operators.upsert import upsert

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if os.path.exists(target_path):
            target = spark.read.parquet(target_path)
            merged = upsert(target, batch_df, bucket_keys)
        else:
            merged = batch_df
        tmp = target_path + ".__cagg__"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(target_path):
            shutil.rmtree(target_path)
        shutil.move(tmp, target_path)

    writer = (
        rolled.writeStream.foreachBatch(_merge_batch)
        .outputMode("update")
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q


def run_to_memory(
    stream_df: DataFrame,
    output_mode: str = "append",
    table_prefix: str = "stream_out",
) -> DataFrame:
    """Drain the stream with ``availableNow`` into a memory sink and
    return the result as a batch DataFrame (test/backfill harness)."""
    name = f"{table_prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def stream_to_parquet(
    stream_df: DataFrame,
    target_path: str,
    checkpoint: str,
    output_mode: str = "append",
):
    """Drain a stream into a parquet file sink with a durable
    checkpoint, exactly-once across restarts.

    The checkpoint's offset log records which source files each epoch
    consumed and the sink's file manifest records which output files
    each epoch committed; re-starting with the same checkpoint resumes
    after the last committed epoch, so a processed input file is never
    re-emitted and a crash between offset-write and commit replays into
    the same epoch id (idempotent). This is the production recovery
    story — ``run_to_memory`` is only the test/backfill harness."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", target_path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_upsert_sink(
    stream_df: DataFrame,
    target_path: str,
    keys: list[str],
    version_col: str,
    checkpoint: str | None = None,
):
    """Incremental MERGE sink: each microbatch upserts into a parquet
    target (operators/upsert.py), so the target converges to
    latest-per-key state instead of append-only history — the
    foreachBatch pattern that replaces the reference's full-overwrite
    refresh cadence with true incrementality.

    Each batch: read current target (if any) -> upsert -> rewrite via a
    temp dir + swap (a crash mid-batch leaves the previous target
    intact; the checkpoint replays the batch)."""
    import os
    import shutil

    from ffi_etl_spark.operators.upsert import upsert

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_latest = batch_df
        if os.path.exists(target_path):
            target = spark.read.parquet(target_path)
            merged = upsert(target, batch_latest, keys, version_col=version_col)
        else:
            from ffi_etl_spark.operators.windows import latest_per_key

            merged = latest_per_key(batch_latest, keys, ts_col=version_col, id_col=version_col)
        tmp = target_path + ".__merge__"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(target_path):
            shutil.rmtree(target_path)
        shutil.move(tmp, target_path)

    writer = stream_df.writeStream.foreachBatch(_merge_batch).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    within: str = "10 minutes",
    watermark: str = "2 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream inner interval join: pair each left event with the
    same key's right events landing in ``[l_ts, l_ts + within]`` —
    attribution's bread and butter (view→click, click→purchase within a
    window), run continuously.

    Both sides carry watermarks AND the join condition bounds r_ts
    relative to l_ts, which is exactly what Spark needs to expire
    buffered state: a left row is dropped once the right watermark
    passes ``l_ts + within``, a right row once the left watermark
    passes ``r_ts`` — without the time bound the state store grows
    forever. Inner matches emit immediately (no watermark wait), so
    results stream with matching latency, not lateness latency.

    Batch twin: the identical join expression over bounded frames
    (tests prove equivalence) — also the backfill path."""
    l = left.withWatermark(ts_col, watermark).select(
        F.col(key_col),
        F.col("event_id").alias("l_event_id"),
        F.col(ts_col).alias("l_ts"),
    )
    r = right.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("_rk"),
        F.col("event_id").alias("r_event_id"),
        F.col(ts_col).alias("r_ts"),
    )
    cond = F.expr(
        f"{key_col} = _rk AND r_ts >= l_ts AND r_ts <= l_ts + INTERVAL {within}"
    )
    return l.join(r, cond).select(key_col, "l_event_id", "r_event_id", "l_ts", "r_ts")


def merge_join_batch(
    batch_df: DataFrame,
    batch_id: int,
    dim_path: str,
    target_path: str,
    keys: list[str],
    app_id: str | None = None,
    adopt_unowned: bool = False,
) -> bool:
    """Merge one fact microbatch into the maintained fact⋈dim table at
    ``target_path``. Returns False (no-op) when the table's ledger
    shows ``batch_id`` was already merged — a blind union is NOT
    replay-idempotent (distinct fact keys within a batch don't help: a
    replayed batch would append the same rows a second time), so the
    (app_id, batch_id) ledger from ``profile.merge_batch_into_profile``
    applies unchanged (ADVICE r05). Exposed as a plain function so the
    replay contract is directly testable.

    Crash safety reuses profile.py's aside→replace→drop swap with the
    two torn-state recovery branches at batch start — the previous
    rmtree(target)-then-move(tmp) left a window where a crash lost the
    entire accumulated table (ADVICE r05)."""
    import os

    from ffi_etl_spark.operators.ivm import maintain_fact_dim_join
    from ffi_etl_spark.streaming.profile import (
        _LEDGER_APP_COL,
        _LEDGER_COL,
        _commit_swap,
        _local_target,
        _read_ledger,
        _recover_torn_commit,
    )

    target_path = _local_target(target_path, "merge_join_batch")
    spark = batch_df.sparkSession
    _recover_torn_commit(target_path)

    if not os.path.exists(target_path):
        stored = None  # genuine first batch; a read error below must raise
    else:
        stored = spark.read.parquet(target_path)

    if stored is not None:
        through, _app = _read_ledger(
            stored, target_path, app_id, "maintained join", adopt_unowned
        )
        if through is not None and batch_id <= through:
            return False

    dim = spark.read.parquet(dim_path)
    if stored is not None:
        merged = maintain_fact_dim_join(
            stored.drop(_LEDGER_COL, _LEDGER_APP_COL), batch_df, dim,
            keys=tuple(keys),
        )
    else:
        merged = batch_df.join(F.broadcast(dim), keys)
    out = merged.withColumn(_LEDGER_COL, F.lit(batch_id).cast("long")).withColumn(
        _LEDGER_APP_COL, F.lit(app_id).cast("string")
    )
    _commit_swap(out, target_path)
    return True


def stream_join_maintenance(
    fact_stream: DataFrame,
    dim_path: str,
    target_path: str,
    keys: list[str],
    checkpoint: str | None = None,
):
    """Streaming twin of ``operators/ivm.py::maintain_fact_dim_join``:
    keep a materialized fact⋈dim join current as fact micro-batches
    arrive, re-reading the dimension table per batch so in-place dim
    edits are picked up on the next trigger (the stream_static_enrich
    refresh semantics, applied to a MAINTAINED table instead of a
    pass-through decoration).

    Per batch: the stored join is re-decorated from the CURRENT dim
    (dim updates propagate) and the batch's Δ⋈dim appends — the fact
    history never rescans; per-batch cost is O(|stored| + |Δ|) with
    the dim broadcast. Crash safety and replay idempotency are
    ``merge_join_batch``'s swap + (app_id, batch_id) ledger; the
    ledger app id is the checkpoint path (same checkpoint = same
    batch-id sequence), matching ``stream_profile_merge``."""

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_join_batch(
            batch_df, batch_id, dim_path, target_path, keys, app_id=checkpoint
        )

    writer = fact_stream.writeStream.foreachBatch(_merge_batch).trigger(
        availableNow=True
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q
