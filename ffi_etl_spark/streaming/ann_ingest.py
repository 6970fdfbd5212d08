"""Streaming maintenance of the persisted IVF index (rounds 10-11).

The ``stream_dedup_ingest`` architecture applied to the ANN tier: a
vector stream lands into the ``ivf_index_tables`` layout — bootstrap
build on the first batch, then ADOPT the stored model for every later
batch (``ivf_index_append``'s rule: retraining mid-stream would mix
models in one assignments table, which ``check_ivf_layout`` exists to
refuse). Per batch:

  * ids already indexed are anti-joined out (inside
    ``ivf_index_append`` — a column-pruned stored-id scan), so a
    replayed batch appends NOTHING: foreachBatch's at-least-once
    delivery becomes effectively-once for the index, the dedup
    ingest's corpus rule;
  * the optional drift CONTRACT (``max_below_floor_share``) refuses a
    batch the stored quantizer no longer describes. With
    ``rebuild_on_drift`` (round 11, VERDICT r10 item 2) the refusal is
    WIRED to its remedy instead of stopping the pipeline: the index is
    re-materialized over stored-corpus ∪ batch (``ivf_index_tables``
    — exactly the error message's prescription) into side directories
    and atomically swapped in (the profile.py aside→replace→drop
    protocol, with torn-swap recovery at every batch start), so the
    drifted batch enters under a model that DOES describe it and the
    adopt-never-retrain rule is preserved — the new model starts a new
    era, it never mixes with the old rows (the whole table is
    re-assigned). Without the flag the batch fails with the remedy
    text — the round-10 behavior — for pipelines that want a human
    decision;
  * appends go through ``append_ivf_assignments`` (one file per
    touched cell per batch) and crowded cells are compacted back to
    one file each (``compact_ivf_assignments``) — the per-cell footer
    count stays bounded over an unbounded stream. Crowded-cell
    DISCOVERY costs one file listing per sink lifetime, not one per
    batch (ADVICE r10): the sink seeds a per-cell file counter from
    the first append's listing, then maintains it from each append's
    own touched-cell set (a ≤K-row collect of the batch's distinct
    cells — bounded by the model size, the ingest's
    bounded-driver-probe class).

Scale posture: per-batch cost is |batch|·K cosines (one K-row model
broadcast) + the stored-id anti-join + the touched cells' rewrite;
the corpus bulk is never rescanned and never shuffles — EXCEPT on a
drift rebuild, which pays one full re-materialization (n·√n) by
design: that cost was always owed once drift crossed the contract,
and the swap amortizes it over every later batch. The one unbounded
per-batch term is the stored-id column scan, the same narrow term the
dedup ingest's signature state carries (measured ~1s per 10× state at
sf10 trickle — INGEST_r9.json).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

# Cite: this module forward-maps the reference's batch ETL posture
# (ffi-etl notebooks write full refreshed tables per run) onto
# Structured Streaming state maintenance; the reference has no
# streaming surface (SURVEY.md §2.10).

# The swap machinery is the SHARED protocol (operators/stored_state.py
# — round 11 factored it out so the MinHash re-split remedy rides the
# same renames and the same recovery rule). Suffix aliases kept for
# the round-11 lifecycle tests.
from ffi_etl_spark.operators.stored_state import (  # noqa: E402
    NEW_SUFFIX as _NEW_SUFFIX,
    OLD_SUFFIX as _OLD_SUFFIX,
    commit_swap,
    recover_torn_swap,
)


def _recover_torn_swap(cpath: str, apath: str) -> None:
    """Batch-start recovery for the two-table index swap — the shared
    rule (stored_state.recover_torn_swap): roll FORWARD from the first
    ``__old__`` marker, roll BACK side dirs written without one.
    Either way the pair ends coherent, which is what
    ``check_ivf_layout``'s model-identity gate needs."""
    recover_torn_swap([cpath, apath])


def _swap_index(centroids, assignments, cpath: str, apath: str) -> None:
    """Atomically (crash-safely, with ``_recover_torn_swap``) replace
    the stored two-table index with a freshly materialized one: write
    both side dirs fully, then the shared aside→replace→drop commit
    (stored_state.commit_swap). Centroids (the K-row model) commit
    first so any torn window holds at most a mixed pair, which the
    model-identity gate refuses rather than serves."""
    from ffi_etl_spark.operators.similarity import write_ivf_assignments

    cnew, anew = cpath + _NEW_SUFFIX, apath + _NEW_SUFFIX
    for p in (cnew, anew):
        shutil.rmtree(p, ignore_errors=True)
    centroids.write.parquet(cnew)
    write_ivf_assignments(assignments, anew)
    commit_swap([cpath, apath])


def stream_ann_ingest(
    vecs: DataFrame,
    index_root: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 2,
    quantize_bits: int | None = None,
    cells: int | None = None,
    max_below_floor_share: float | None = None,
    sim_floor: float = 0.5,
    compact_files_per_cell: int = 16,
    rebuild_on_drift: bool = False,
    store_codes: bool = False,
):
    """foreachBatch sink maintaining ``index_root``/centroids +
    ``index_root``/assignments as a persisted IVF index over a vector
    stream. Returns the DataStreamWriter (caller picks the trigger;
    ``availableNow`` drains a backlog exactly once).

    Bootstrap: when no index exists, the FIRST non-empty batch trains
    the quantizer (``ivf_index_tables``) and becomes the index;
    centroids are written before assignments so a torn bootstrap
    strands the K-row model, not the bulk. Every later batch adopts
    the stored model. A half-written index (exactly one of the two
    tables present) fails the batch with the remedy — appending
    against a model that isn't there, or re-bootstrapping over
    orphaned assignments, would both corrupt the layout silently.

    ``rebuild_on_drift`` (requires ``max_below_floor_share``): when a
    batch trips the drift contract, re-materialize over
    stored ∪ batch and atomically swap instead of failing the stream
    — see the module docstring. The index layout must be on the local
    filesystem for this (the os.rename commit protocol; distributed
    stores need a transactional table format).

    ``store_codes`` (round 12): bootstrap — and, crucially, every
    drift REBUILD — materializes the int8-coded layout
    (``ivf_index_tables(store_codes=True)``), so the sink maintains
    the code-space probe tier across its whole lifecycle. Appends
    already follow the stored table's shape (``ivf_index_append``
    codes batches under the stored codebook whenever ``_codes`` is
    present), but the rebuild path re-materializes from scratch:
    without this flag a drift event would silently swap a coded index
    for a codeless one and every later ``ann_ivf_query_stored_int8``
    would refuse. The rebuild re-FITS the codebook over the grown
    corpus (a rebuild is the sanctioned re-fit point — the same event
    that retrains the coarse quantizer), so post-rebuild codes carry a
    new ``_codebook_id`` and the swap replaces both tables together."""
    from pyspark.errors import AnalysisException

    from ffi_etl_spark.operators.similarity import (
        QuantizerDriftError,
        append_ivf_assignments,
        compact_ivf_assignments,
        ivf_index_append,
        ivf_index_tables,
        write_ivf_assignments,
    )
    from ffi_etl_spark.operators.stored_state import bucket_file_counts

    if rebuild_on_drift:
        # the swap commit protocol is os.rename — atomic on POSIX paths
        # only. Fail at SINK CONSTRUCTION, not at the first drifted
        # batch months in (profile.py's _local_target rule: a distributed
        # store needs a transactional table format instead).
        from ffi_etl_spark.streaming.profile import _local_target

        index_root = _local_target(index_root, "stream_ann_ingest")

    cpath = os.path.join(index_root, "centroids")
    apath = os.path.join(index_root, "assignments")
    # Per-cell file counter for compaction discovery (ADVICE r10): None
    # until seeded by ONE listing on the first append batch; thereafter
    # maintained from each append's own touched-cell set, so an
    # unbounded stream never re-lists the ever-growing assignments
    # tree. Reset to None whenever the layout is replaced wholesale
    # (drift rebuild) — the next append re-seeds from the fresh tree.
    state: dict = {"cell_files": None}

    def _read_or_none(spark, path):
        # first batch: the table does not exist yet; any OTHER failure
        # must fail the batch (silently treating a corrupt index as
        # absent would re-bootstrap a second model over stored rows)
        try:
            return spark.read.parquet(path)
        except AnalysisException:
            return None

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if rebuild_on_drift:
            _recover_torn_swap(cpath, apath)
        if not batch_df.take(1):
            return
        batch = batch_df.dropDuplicates([id_col]).localCheckpoint(eager=True)

        model = _read_or_none(spark, cpath)
        stored = _read_or_none(spark, apath)
        if (model is None) != (stored is None):
            have, miss = (cpath, apath) if model is not None else (apath, cpath)
            raise ValueError(
                f"half-written IVF index: {have} exists but {miss} is "
                "missing — appending against a missing model (or "
                "re-bootstrapping over orphaned assignments) would mix "
                "models in one layout; restore the missing table or "
                "delete both and let the stream re-bootstrap"
            )
        if model is None:
            # bootstrap: this batch IS the corpus; the trained model is
            # adopted by every later batch (adopt, never retrain)
            centroids, assignments = ivf_index_tables(
                batch, n_iter=n_iter, quantize_bits=quantize_bits, cells=cells,
                store_codes=store_codes,
            )
            centroids.write.parquet(cpath)
            write_ivf_assignments(assignments, apath)
            return
        try:
            new_rows = ivf_index_append(
                model,
                stored,
                batch,
                id_col=id_col,
                vec_col=vec_col,
                max_below_floor_share=max_below_floor_share,
                sim_floor=sim_floor,
            )
        except QuantizerDriftError:
            if not rebuild_on_drift:
                raise
            # the refusal's own remedy, wired (VERDICT r10 item 2):
            # re-materialize over the grown corpus — stored vectors ∪
            # this batch (the assignments table carries the vectors, so
            # no second corpus copy exists to drift from) — and swap.
            # The batch's ids enter UNDER the new model; a replay of
            # this batch after the swap anti-joins to nothing. The old
            # model's rows never mix with the new model's: the whole
            # table is re-assigned in one pass (adopt-never-retrain
            # holds — eras are swapped, not blended).
            fresh = batch.join(stored.select(id_col), id_col, "left_anti")
            corpus = stored.select(id_col, vec_col).unionByName(
                fresh.select(id_col, vec_col)
            )
            centroids, assignments = ivf_index_tables(
                corpus, n_iter=n_iter, quantize_bits=quantize_bits, cells=cells,
                store_codes=store_codes,
            )
            _swap_index(centroids, assignments, cpath, apath)
            state["cell_files"] = None  # fresh layout: re-seed on next append
            return
        new_rows = new_rows.localCheckpoint(eager=True)  # feeds write + cells
        append_ivf_assignments(new_rows, apath)
        # touched cells: ≤K values (bounded by the model), the same
        # bounded-collect class as the ingest's probe decisions
        touched = [
            r["centroid_id"]
            for r in new_rows.select("centroid_id").distinct().collect()
        ]
        if state["cell_files"] is None:
            # one listing per sink lifetime: seed AFTER this append so
            # the counts already include its files
            state["cell_files"] = bucket_file_counts(
                spark.read.parquet(apath), "centroid_id"
            )
        else:
            for c in touched:
                state["cell_files"][c] += 1
        crowded = sorted(
            c
            for c, n in state["cell_files"].items()
            if n > compact_files_per_cell
        )
        if compact_ivf_assignments(
            spark, apath, files_per_cell=compact_files_per_cell, cells=crowded
        ):
            for c in crowded:
                state["cell_files"][c] = 1

    return vecs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
