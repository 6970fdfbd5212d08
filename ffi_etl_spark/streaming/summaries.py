"""Streaming maintenance of the mergeable quantile summary.

The batch operator (operators/sketches.py::quantile_summary) builds a
per-shard rank sample that a pipeline persists and merges. This module
keeps that summary CURRENT from a stream: each micro-batch contributes
its own summary parts (ranked within the batch — history is never
rescanned), and the stored table is the union of parts, answered by
``quantile_summary_query(part_cols=("batch_id", "shard"))`` with the
error bound scaling as k × parts.

Exactly-once WITHOUT a ledger: each batch lands in its OWN directory
(``<target>/batch=<id>/``) written with mode=overwrite — a foreachBatch
replay of batch b rewrites exactly batch b's directory and nothing
else, so at-least-once delivery converges to the same table. This is
the partition-overwrite idempotence pattern, the stateless complement
to streaming/profile.py's ledgered merge (which exists because MERGES
are not replay-idempotent; a pure per-batch APPEND is, once the append
is keyed by batch id). Same local-filesystem caveat as profile.py: on
object storage use a transactional table format's
replaceWhere/dynamic-partition-overwrite instead.

Unbounded-parts caveat: the estimator's error grows with the part
count, so a long-running stream periodically COMPACTS —
``compact_stream_summary`` below folds every accumulated part into one
coarser part (operators/sketches.py::compact_quantile_summary) without
touching raw data; WHEN to trigger it (every N batches, on an error
budget) stays a deployment decision.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_quantile_summary(
    events: DataFrame,
    target_path: str,
    checkpoint: str,
    value_col: str = "value",
    id_col: str = "event_id",
    n_shards: int = 4,
    k: int = 16,
):
    """availableNow foreachBatch run: drain the backlog, summarizing
    each micro-batch into ``target_path/batch=<id>/``. Returns after
    the stream terminates."""
    from ffi_etl_spark.operators.sketches import quantile_summary

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        summ = quantile_summary(
            batch_df, value_col=value_col, id_col=id_col, n_shards=n_shards, k=k
        )
        summ.write.mode("overwrite").parquet(
            os.path.join(target_path, f"batch={batch_id}")
        )

    q = (
        events.writeStream.foreachBatch(_process)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.awaitTermination()
    return q


def read_summary_parts(spark, target_path: str) -> DataFrame:
    """Load the accumulated parts with their batch identity (Spark
    parses the ``batch=<id>`` directory name into a column)."""
    return spark.read.option("basePath", target_path).parquet(
        os.path.join(target_path, "batch=*")
    )


def quantiles_from_stream_summary(
    spark,
    target_path: str,
    total_n,
    quantiles: list[float],
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 16,
) -> DataFrame:
    """Answer quantile queries from the streamed parts table."""
    from ffi_etl_spark.operators.sketches import quantile_summary_query

    parts = read_summary_parts(spark, target_path)
    return quantile_summary_query(
        parts,
        total_n,
        quantiles,
        value_col=value_col,
        id_col=id_col,
        k=k,
        part_cols=("batch", "shard"),
    )


def compact_stream_summary(
    spark,
    target_path: str,
    k: int,
    stride: int = 4,
) -> str:
    """Fold every accumulated ``batch=*`` part into one compacted part
    under ``<target>/compacted/`` (mode=overwrite — the output is a
    pure function of the parts, so replaying the compaction is
    idempotent by construction). Readers answering from the compacted
    table use ``quantile_summary_query(part_cols=("part",))`` with the
    error bound k·(parts−1) + k·stride/2 documented on the operator.

    The parts directories are left in place: removing inputs is the
    caller's retention decision (and keeping them preserves the
    rebuild-from-parts escape hatch)."""
    from ffi_etl_spark.operators.sketches import compact_quantile_summary

    parts = read_summary_parts(spark, target_path)
    comp = compact_quantile_summary(
        parts, k=k, stride=stride, part_cols=("batch", "shard")
    )
    out = os.path.join(target_path, "compacted")
    comp.write.mode("overwrite").parquet(out)
    return out
