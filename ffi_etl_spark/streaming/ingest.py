"""Continuous corpus construction: streaming near-dup ingest.

The end-to-end shape a 100 TB/day pretraining pipeline actually runs:
documents arrive as micro-batches; each batch is near-dup-checked
against the standing corpus AND itself with the incremental MinHash
tier (operators/dedup.py::dedup_minhash_incremental — batch-bands ⋈
all-bands, corpus×corpus never pairs), batch-internal duplicate
clusters collapse to their canonical member, and only the survivors
append to the corpus. Cost per batch scales with the batch's band
collisions, never with corpus².

Composition, not new machinery: incremental LSH (dedup family) +
connected components (graph family) + anti join, wired into Structured
Streaming through ``foreachBatch`` — the sink pattern every other
incremental materialization in this engine uses
(streaming/events.py::continuous_aggregate, stream_upsert_sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _batch_survivors(
    corpus: DataFrame | None,
    batch: DataFrame,
    text_col: str,
    id_col: str,
    **lsh_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """(survivors, pairs) for one micro-batch against the corpus.

    Drop rule: a batch doc dies if it near-dups ANY corpus doc
    (``new_old`` pair — the corpus copy is canonical by arrival order),
    or if it is a non-canonical member of a batch-internal near-dup
    cluster (``new_new`` pairs -> connected components -> keep each
    cluster's min id). Components, not pairwise greater-id drops: a
    chain a~b, b~c with a<b<c must keep ONLY a, and pairwise rules
    would also kill b's evidence for dropping c on re-ingest.
    """
    from ffi_etl_spark.operators.dedup import (
        dedup_minhash_incremental,
        dedup_minhash_lsh,
    )
    from ffi_etl_spark.operators.graph import connected_components

    if corpus is None:
        pairs = dedup_minhash_lsh(batch, text_col, id_col, **lsh_kwargs).withColumn(
            "pair_type", F.lit("new_new")
        )
    else:
        pairs = dedup_minhash_incremental(
            corpus, batch, text_col, id_col, **lsh_kwargs
        )
    pairs = pairs.localCheckpoint(eager=True)  # pairs feed 3 consumers + audit

    old_hits = pairs.filter(F.col("pair_type") == "new_old")
    # incremental pairs put the batch id on either side; corpus ids are
    # exactly the non-batch side of a new_old pair
    batch_ids = batch.select(F.col(id_col).alias("_bid")).distinct()
    dead_vs_corpus = (
        old_hits.select(F.col("id_a").alias("_bid"))
        .union(old_hits.select(F.col("id_b").alias("_bid")))
        .join(batch_ids, "_bid", "left_semi")
    )

    new_new = pairs.filter(F.col("pair_type") == "new_new")
    dead_in_batch = (
        connected_components(new_new)
        .filter(F.col("vertex") != F.col("component"))
        .select(F.col("vertex").alias("_bid"))
    )

    dead = dead_vs_corpus.union(dead_in_batch).distinct()
    survivors = batch.join(
        F.broadcast(dead), batch[id_col] == F.col("_bid"), "left_anti"
    )
    return survivors, pairs


def stream_dedup_ingest(
    docs: DataFrame,
    corpus_path: str,
    pairs_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
):
    """foreachBatch sink: maintain ``corpus_path`` as a near-dup-free
    parquet corpus while ``pairs_path`` accumulates the audit trail of
    every detected pair. Returns the DataStreamWriter (caller picks the
    trigger; ``availableNow`` drains a backlog exactly once).

    Exactly-once posture: foreachBatch can re-run a batch after a
    failure, and plain parquet appends are not idempotent — a replayed
    batch would re-append its survivors. Real deployments point
    ``corpus_path`` at a transactional table format and MERGE by
    ``id_col``; the tests cover the single-run semantics this container
    can express.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not batch_df.take(1):
            return
        batch = batch_df.dropDuplicates([id_col]).localCheckpoint(eager=True)
        try:
            corpus = spark.read.parquet(corpus_path)
        except Exception:
            corpus = None
        survivors, pairs = _batch_survivors(
            corpus, batch, text_col, id_col, **lsh_kwargs
        )
        pairs.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            pairs_path
        )
        survivors.write.mode("append").parquet(corpus_path)

    return docs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
