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
_LEDGER_APP_COL = "_ledger_app_id"


def _local_target(target_path: str, fn: str) -> str:
    """Validate that *target_path* lives on the local filesystem and
    return the plain OS path. ``file:`` URIs are blessed but STRIPPED,
    so the ``os.path``/``shutil`` commit protocol and the Spark
    reads/writes agree on one location — ``os.path.exists("file:///p")``
    is always False, which would make the guard's carve-out crash on
    the first batch and treat an existing table as absent (ADVICE r05).
    Any other scheme (hdfs://, s3a://, …) raises: the os.rename swap is
    only atomic on POSIX paths; distributed stores need a transactional
    table format (Delta txnAppId/txnVersion)."""
    import re
    from urllib.parse import unquote, urlparse

    if target_path.startswith("file:"):
        p = urlparse(target_path)
        if p.netloc not in ("", "localhost"):
            raise ValueError(
                f"{fn}: file URI {target_path!r} names a remote host — the "
                "local commit protocol cannot reach it."
            )
        return unquote(p.path)
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", target_path)
    if m:
        raise ValueError(
            f"{fn}: target_path {target_path!r} is on a "
            f"{m.group(0)} filesystem — the os.rename commit protocol is "
            "only atomic on the local filesystem. Use a transactional table "
            "format (Delta txnAppId/txnVersion) for distributed stores."
        )
    return target_path


def _recover_torn_commit(target_path: str) -> None:
    """Startup recovery for the two torn states of the aside→replace→
    drop swap: aside-but-not-replaced restores the old table;
    replaced-but-not-dropped clears the leftover aside dir."""
    import os
    import shutil

    old_dir = target_path + ".__ivm_old__"
    if not os.path.exists(target_path) and os.path.exists(old_dir):
        os.rename(old_dir, target_path)  # crashed between aside and replace
    elif os.path.exists(target_path) and os.path.exists(old_dir):
        shutil.rmtree(old_dir)  # crashed between replace and cleanup


def _commit_swap(out: DataFrame, target_path: str) -> None:
    """Atomically (crash-safely) replace the table at *target_path*
    with *out*: write to a new dir, shunt the current table aside,
    move the new one in, drop the old. Paired with
    ``_recover_torn_commit`` at batch start, no crash point loses the
    accumulated table."""
    import os
    import shutil

    new_dir = target_path + ".__ivm_new__"
    old_dir = target_path + ".__ivm_old__"
    out.write.mode("overwrite").parquet(new_dir)
    if os.path.exists(target_path):
        os.rename(target_path, old_dir)
        os.rename(new_dir, target_path)
        shutil.rmtree(old_dir)
    else:
        os.rename(new_dir, target_path)


def _read_ledger(
    stored: DataFrame,
    target_path: str,
    app_id: str | None,
    what: str,
    adopt_unowned: bool = False,
):
    """Validate + read the (app_id, batch_id) ledger of a maintained
    table. Raises with the remedy when (a) the table predates the
    ledger protocol — no ledger columns, so replay idempotence cannot
    be verified (ADVICE r06: the previous code died at F.max with an
    unresolved-column AnalysisException far from the cause) — or (b)
    the table has no recorded owner (written with app_id=None) and an
    owned stream tries to resume onto it without ``adopt_unowned``: a
    NULL owner must not silently satisfy the fresh-checkpoint guard.
    Returns (through_batch, app) on success."""
    missing = {_LEDGER_COL, _LEDGER_APP_COL} - set(stored.columns)
    if missing:
        raise ValueError(
            f"{what} at {target_path} has no merge ledger (missing "
            f"column(s) {sorted(missing)}): it was written by the "
            "pre-ledger maintenance protocol, whose replay idempotence "
            "cannot be verified — regenerate the table from the source "
            "(or backfill the ledger columns) before resuming."
        )
    row = stored.agg(
        F.max(_LEDGER_COL).alias("through"),
        F.max(_LEDGER_APP_COL).alias("app"),
    ).collect()[0]
    if row["through"] is None:
        # zero-row table (e.g. a first batch whose join/aggregate was
        # legitimately empty): there is no history to double-count and
        # no recorded batch sequence to clash with — both guards below
        # would misfire on max()-over-no-rows NULLs, poisoning an
        # owned stream after an empty first commit
        return None, None
    if app_id is not None and row["app"] is not None and row["app"] != app_id:
        raise ValueError(
            f"{what} at {target_path} belongs to stream app "
            f"{row['app']!r}, not {app_id!r} — a fresh checkpoint replays "
            "the whole source, so merging would double-count history. "
            "Either reuse the original checkpoint or remove the table."
        )
    if app_id is not None and row["app"] is None and not adopt_unowned:
        raise ValueError(
            f"{what} at {target_path} has no recorded owner (it was "
            "maintained with app_id=None), so this stream's batch-id "
            "sequence cannot be checked against its history — pass "
            "adopt_unowned=True to claim it (only safe if its batches "
            "and this checkpoint's are one sequence), or remove it."
        )
    return row["through"], row["app"]


def merge_batch_into_profile(
    batch_df: DataFrame,
    batch_id: int,
    target_path: str,
    keys: Sequence[str],
    agg_builder: Callable[[DataFrame], DataFrame],
    spec: Mapping[str, str],
    app_id: str | None = None,
    adopt_unowned: bool = False,
) -> bool:
    """Merge one microbatch's partial aggregate into the profile table
    at ``target_path``. Returns False (no-op) when the table's ledger
    shows ``batch_id`` was already merged — the replay guard. Exposed
    as a plain function so the replay contract is directly testable.

    ``app_id`` scopes the ledger to ONE stream incarnation (Delta's
    ``txnAppId`` role; ``stream_profile_merge`` derives it from the
    checkpoint path). Batch ids restart at 0 under a fresh checkpoint
    while the source replays EVERYTHING, so merging a new-app batch
    into an old-app table double-counts all history — that state is
    unresolvable here and raises instead of guessing.

    Crash safety of the commit: write to a new dir, shunt the current
    table aside, move the new one in, then drop the old — with startup
    recovery for the two torn states (aside-but-not-replaced restores
    the old table; replaced-but-not-dropped clears the leftover), so
    no crash point loses the accumulated profile.

    LOCAL FILESYSTEM ONLY: the atomic-swap protocol is ``os.rename``/
    ``shutil`` over POSIX paths, so the crash-safety guarantee does NOT
    extend to HDFS/object storage — a scheme-prefixed ``target_path``
    (``hdfs://``, ``s3a://``, …) raises up front rather than silently
    dropping the guarantee (ADVICE r04). The production path for a
    distributed store is a transactional table format carrying the
    ledger in table metadata: Delta's ``txnAppId``/``txnVersion`` pair
    is the exact counterpart of the (app_id, batch_id) ledger here."""
    import os

    from ffi_etl_spark.operators.ivm import merge_grouped_partials

    target_path = _local_target(target_path, "merge_batch_into_profile")
    spark = batch_df.sparkSession
    _recover_torn_commit(target_path)

    if not os.path.exists(target_path):
        target = None  # genuine first batch; any read error below raises
    else:
        # an existing-but-unreadable table must FAIL, not masquerade as
        # "no table" — silently replacing it would discard all history
        target = spark.read.parquet(target_path)

    if target is not None:
        through, _app = _read_ledger(
            target, target_path, app_id, "profile table", adopt_unowned
        )
        if through is not None and batch_id <= through:
            return False

    part = agg_builder(batch_df)
    if target is None:
        merged = part
    else:
        merged = merge_grouped_partials(
            target.drop(_LEDGER_COL, _LEDGER_APP_COL), part, keys, spec
        )
    out = merged.withColumn(_LEDGER_COL, F.lit(batch_id).cast("long")).withColumn(
        _LEDGER_APP_COL, F.lit(app_id).cast("string")
    )
    _commit_swap(out, target_path)
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
    once and stop — the nightly-ingest cadence). The ledger app id is
    the checkpoint path: same checkpoint = same batch-id sequence =
    same ledger scope; a fresh checkpoint against an existing table
    fails loudly instead of double-counting."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_profile(
            batch_df, batch_id, target_path, keys, agg_builder, spec,
            app_id=checkpoint,
        )

    q = (
        events.writeStream.foreachBatch(_process)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.awaitTermination()
    return q
