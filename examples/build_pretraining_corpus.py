"""Build a cleaned pretraining corpus from a documents parquet table.

The LLM-data composition (operators/corpus.py): quality cascade →
exact dedup → MinHash near-dup components → one canonical doc per
cluster, all as a single lazy Spark plan. Run:

    python examples/build_pretraining_corpus.py \
        [--input /root/testdata/sf0.01/documents.parquet] \
        [--out ./corpus_out]

Prints per-stage survivor counts and writes the final (doc_id,
n_chars) manifest as parquet. On real data, swap the manifest join for
a semi-join back to the full document rows.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01/documents.parquet")
    ap.add_argument("--out", default="./corpus_out")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ffi_etl_spark.operators.corpus import pretraining_corpus
    from ffi_etl_spark.operators.dedup import dedup_minhash_lsh
    from ffi_etl_spark.operators.textops import quality_filter
    from ffi_etl_spark.session import get_session

    spark = get_session("build-corpus")
    docs = spark.read.parquet(args.input)
    n0 = docs.count()

    kept = quality_filter(docs).filter(F.col("keep")).count()
    pairs = dedup_minhash_lsh(docs).count()
    final = pretraining_corpus(docs)
    final.write.mode("overwrite").parquet(args.out)
    n_final = spark.read.parquet(args.out).count()

    print(f"input docs:          {n0}")
    print(f"pass quality gate:   {kept}")
    print(f"near-dup pairs:      {pairs}")
    print(f"final corpus:        {n_final}  -> {args.out}")


if __name__ == "__main__":
    main()
