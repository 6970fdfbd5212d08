"""Event-time windowing and sessionization (batch forms).

The reference has no streaming surface (SURVEY.md §2.10); these are the
engine's event-table operators, written so the same logic runs in batch
(DuckDB-checkable) and — via streaming/events.py — under Structured
Streaming with watermarks.

Scale: tumbling/sliding aggs shuffle once on (window, key) with
map-side partial aggregation; sessionization shuffles once on user_id
then runs narrow window functions within each user partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Per (window, key): count + exact sum(value)."""
    return (
        events.groupBy(F.window(ts_col, duration).alias("w"), F.col(key_col))
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


def sliding_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding windows: each event lands in duration/slide windows."""
    return (
        events.groupBy(F.window(ts_col, duration, slide).alias("w"))
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


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessions: a session breaks when the time since the
    user's previous event exceeds the gap. Classic lag + running-sum;
    event_id tiebreak keeps ordering deterministic.

    Output: user_id, session_id (1-based per user), n_events,
    session_start, session_end."""
    order = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    gap_s = gap_minutes * 60
    with_breaks = events.withColumn(
        "_new_session",
        F.when(
            F.unix_timestamp(F.col(ts_col))
            - F.unix_timestamp(F.lag(ts_col).over(order))
            > gap_s,
            1,
        )
        .otherwise(0)
        .cast("int"),
    )
    run = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, 0
    )
    with_ids = with_breaks.withColumn("session_id", F.sum("_new_session").over(run) + 1)
    return (
        with_ids.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def resample_locf(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Hourly resample with last-observation-carried-forward — the
    classic time-series gap-fill the reference's batch surface lacks
    (no window op beyond first/row_number, SURVEY.md §2.5).

    Three steps, all expressed relationally so Catalyst plans them:
      1. downsample: latest event per (key, hour) — deterministic
         row_number over (ts desc, id desc);
      2. densify: per-key hourly grid via sequence() + explode between
         that key's first and last observed hour (no driver loop, no
         global calendar table — each key densifies only its own span);
      3. fill: left-join the grid to observations and forward-fill with
         last(value, ignorenulls=True) over the per-key hour order.

    Scale: every shuffle is keyed by user (or user+hour) so the work
    fans out with key cardinality; the LOCF window is narrow within a
    key's grid rows. Grid size is bounded by keys × horizon, not by the
    event count — the standard hypertable gap-fill shape."""
    hour = F.date_trunc("hour", F.col(ts_col))
    w_latest = Window.partitionBy(user_col, "hour").orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    hourly = (
        events.withColumn("hour", hour)
        .withColumn("_rn", F.row_number().over(w_latest))
        .filter(F.col("_rn") == 1)
        .select(user_col, "hour", value_col)
    )
    grid = (
        hourly.groupBy(user_col)
        .agg(F.min("hour").alias("_h0"), F.max("hour").alias("_h1"))
        .select(
            user_col,
            F.explode(
                F.sequence(F.col("_h0"), F.col("_h1"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w_fill = (
        Window.partitionBy(user_col)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.join(hourly, [user_col, "hour"], "left_outer").select(
        user_col,
        "hour",
        F.last(value_col, ignorenulls=True).over(w_fill).alias("value_locf"),
    )


def latest_per_key(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Deterministic dropDuplicates-keep-latest: row_number over a
    (ts desc, id desc) ordering — unlike ``dropDuplicates``, the
    survivor doesn't depend on partition layout."""
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc(), F.col(id_col).desc())
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
