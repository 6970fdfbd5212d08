"""End-to-end pretraining-corpus construction.

The flagship composition of the engine's LLM-data-pipeline operators —
the sequence a 100 TB training-data build actually runs, as ONE lazy
plan:

  1. quality gate   (operators/textops.quality_filter — narrow scan
                     filter, C4/Gopher-rule cascade);
  2. exact dedup    (content-hash group, keep the min-id copy);
  3. near-dup dedup (MinHash-LSH pairs → connected components → keep
                     each cluster's min-id canonical).

Stage order matters and is part of the contract: quality first (why
hash garbage?), exact before near-dup (byte-dups are free to kill and
shrink the LSH corpus), each stage keyed so its shuffle is the minimal
one (content hash / doc id / band key).

The reference has no corpus surface — this is north-star extension
work (BASELINE.json); the per-stage operators cite their own reference
parallels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffi_etl_spark.operators.dedup import dedup_minhash_lsh
from ffi_etl_spark.operators.graph import connected_components
from ffi_etl_spark.operators.textops import quality_filter


def pretraining_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The surviving corpus: (doc_id, n_chars), ordered by id.

    Every stage is a semi/anti join against a key set, so the document
    TEXT travels the DAG exactly once per consuming stage and the
    joins reduce to id-keyed hash joins; nothing collects."""
    kept = quality_filter(docs, text_col, id_col).filter(F.col("keep")).select(id_col)
    qdocs = docs.join(kept, id_col, "left_semi")

    canon = (
        qdocs.groupBy(F.md5(F.col(text_col)).alias("_ch"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    cdocs = qdocs.join(canon, id_col, "left_semi")

    pairs = dedup_minhash_lsh(cdocs, text_col, id_col)
    comps = connected_components(pairs)
    dups = comps.filter(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias(id_col)
    )
    return (
        cdocs.join(dups, id_col, "left_anti")
        .select(id_col, F.length(text_col).alias("n_chars"))
        .orderBy(id_col)
    )
