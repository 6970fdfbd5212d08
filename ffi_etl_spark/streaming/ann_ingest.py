"""Streaming maintenance of the persisted IVF index (round 10).

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
    batch the stored quantizer no longer describes — the stream FAILS
    with the re-materialize remedy rather than silently appending
    vectors into cells that don't describe them (a pipeline that
    wants rebuild-on-drift catches this and re-materializes, the
    ``examples/ann_index_maintenance.py`` loop);
  * appends go through ``append_ivf_assignments`` (one file per
    touched cell per batch) and crowded cells are compacted back to
    one file each (``compact_ivf_assignments``) — the per-cell footer
    count stays bounded over an unbounded stream.

Scale posture: per-batch cost is |batch|·K cosines (one K-row model
broadcast) + the stored-id anti-join + the touched cells' rewrite;
the corpus bulk is never rescanned and never shuffles. The one
unbounded term is the stored-id column scan, the same narrow
per-batch term the dedup ingest's signature state carries (measured
~1s per 10× state at sf10 trickle — INGEST_r9.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Cite: this module forward-maps the reference's batch ETL posture
# (ffi-etl notebooks write full refreshed tables per run) onto
# Structured Streaming state maintenance; the reference has no
# streaming surface (SURVEY.md §2.10).


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
    """
    import os

    from pyspark.errors import AnalysisException

    from ffi_etl_spark.operators.similarity import (
        append_ivf_assignments,
        compact_ivf_assignments,
        ivf_index_append,
        ivf_index_tables,
        write_ivf_assignments,
    )

    cpath = os.path.join(index_root, "centroids")
    apath = os.path.join(index_root, "assignments")

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
            )
            centroids.write.parquet(cpath)
            write_ivf_assignments(assignments, apath)
            return
        new_rows = ivf_index_append(
            model,
            stored,
            batch,
            id_col=id_col,
            vec_col=vec_col,
            max_below_floor_share=max_below_floor_share,
            sim_floor=sim_floor,
        )
        append_ivf_assignments(new_rows, apath)
        compact_ivf_assignments(spark, apath, files_per_cell=compact_files_per_cell)

    return vecs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
