"""Streaming twin of incremental aggregate maintenance.

``operators/ivm.py::merge_grouped_partials`` is the batch merge; this
module runs it at streaming cadence: each microbatch is reduced to a
partial aggregate and merged onto the stored profile table — the
stored base is O(groups) and the facts of previous batches are never
rescanned.

Exactly-once: foreachBatch is at-least-once (a batch can replay after
a crash that landed the sink but not the checkpoint), and unlike the
upsert-style continuous aggregate a MERGE IS NOT REPLAY-IDEMPOTENT —
re-merging the same partial double-counts every sum. The standard
remedy (what Delta's ``txnAppId``/``txnVersion`` writer option
implements) is a transaction ledger carried WITH the data: the profile
table stores the highest batch id merged into it, the swap of table +
ledger is one atomic directory move, and a replayed batch id ≤ the
ledger is skipped. Crash windows resolve safely in both orders:
crash before the move replays and merges (nothing was landed), crash
after the move replays and is skipped (the ledger already covers it).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LEDGER_COL = "_merged_through_batch"


def merge_batch_into_profile(
    batch_df: DataFrame,
    batch_id: int,
    target_path: str,
    keys: Sequence[str],
    agg_builder: Callable[[DataFrame], DataFrame],
    spec: Mapping[str, str],
) -> bool:
    """Merge one microbatch's partial aggregate into the profile table
    at ``target_path``. Returns False (no-op) when the table's ledger
    shows ``batch_id`` was already merged — the replay guard. Exposed
    as a plain function so the replay contract is directly testable."""
    import os
    import shutil

    from pyspark.errors import AnalysisException

    from ffi_etl_spark.operators.ivm import merge_grouped_partials

    spark = batch_df.sparkSession
    if not os.path.exists(target_path):
        target = None  # quiet first-batch path (local FS)
    else:
        try:
            target = spark.read.parquet(target_path)
        except AnalysisException:
            target = None

    if target is not None:
        merged_through = target.agg(F.max(_LEDGER_COL)).collect()[0][0]
        if merged_through is not None and batch_id <= merged_through:
            return False

    part = agg_builder(batch_df)
    if target is None:
        merged = part
    else:
        merged = merge_grouped_partials(
            target.drop(_LEDGER_COL), part, keys, spec
        )
    out = merged.withColumn(_LEDGER_COL, F.lit(batch_id).cast("long"))
    tmp = target_path + ".__ivm__"
    out.write.mode("overwrite").parquet(tmp)
    if os.path.exists(target_path):
        shutil.rmtree(target_path)
    shutil.move(tmp, target_path)
    return True


def stream_profile_merge(
    events: DataFrame,
    target_path: str,
    checkpoint: str,
    keys: Sequence[str],
    agg_builder: Callable[[DataFrame], DataFrame],
    spec: Mapping[str, str],
):
    """Maintain a grouped profile table from a stream via per-batch
    partial-aggregate merges (availableNow trigger: drain the backlog
    once and stop — the nightly-ingest cadence)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_profile(
            batch_df, batch_id, target_path, keys, agg_builder, spec
        )

    q = (
        events.writeStream.foreachBatch(_process)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.awaitTermination()
    return q
