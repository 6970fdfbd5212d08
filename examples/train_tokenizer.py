"""Train a BPE merge table over the corpus and tokenize it.

The tokenizer-fitting job a pretraining pipeline runs after corpus
curation (examples/build_pretraining_corpus.py): learn the first N
byte-pair merges from the word-frequency vocabulary, persist the merge
table, and encode the corpus with it — reporting the compression the
learned merges buy over raw characters.

Run:

    python examples/train_tokenizer.py \
        [--input /root/testdata/sf0.01/documents.parquet] \
        [--merges 8] [--out ./tokenizer_out]

The merge table parquet under --out IS the tokenizer artifact: load it
and call operators/tokenizer.py::bpe_encode against any corpus with
the same pre-tokenization.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01/documents.parquet")
    ap.add_argument("--merges", type=int, default=8)
    ap.add_argument("--out", default="./tokenizer_out")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ffi_etl_spark.operators.tokenizer import bpe_encode, bpe_learn_merges
    from ffi_etl_spark.session import get_session

    spark = get_session("train-tokenizer")
    docs = spark.read.parquet(args.input)

    merges = bpe_learn_merges(docs, n_merges=args.merges)
    merges.write.mode("overwrite").parquet(args.out)
    merge_rows = spark.read.parquet(args.out).orderBy("merge_rank").collect()
    print("learned merges:")
    for r in merge_rows:
        print(f"  {r['merge_rank']:>2}: {r['left_sym']!r} + {r['right_sym']!r}"
              f"  (pair count {r['pair_count']})")

    encoded = bpe_encode(docs, merges, n_merges=args.merges)
    stats = encoded.agg(
        F.sum("n_bpe_tokens").alias("bpe"), F.count(F.lit(1)).alias("docs")
    ).collect()[0]
    chars = docs.select(
        F.sum(F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))).alias("c")
    ).collect()[0]["c"]
    # chars + one EOW symbol per word is the round-0 token count
    words = docs.select(
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))).alias("w")
    ).collect()[0]["w"]
    raw = (chars or 0) + (words or 0)
    print(f"docs:                {stats['docs']}")
    print(f"round-0 symbols:     {raw}")
    print(f"BPE tokens:          {stats['bpe']}")
    print(f"compression:         {raw / max(stats['bpe'], 1):.3f}x  -> {args.out}")

    # the unigram-LM alternative over the same corpus: seed vocabulary
    # -> Viterbi segmentation -> one hard-EM refit round
    from ffi_etl_spark.operators.tokenizer import (
        unigram_em_refit,
        unigram_viterbi_segment,
    )

    seed = unigram_viterbi_segment(docs)
    refit = unigram_em_refit(docs)
    seed_pieces = seed.agg(F.sum("n_pieces").alias("p")).collect()[0]["p"]
    refit_pieces = refit.agg(F.sum("n_pieces").alias("p")).collect()[0]["p"]
    print(f"unigram seed pieces over the lexicon:  {seed_pieces}")
    print(f"unigram after one hard-EM round:       {refit_pieces}")
    changed = (
        seed.select("w", F.col("segmentation").alias("a"))
        .join(refit.select("w", F.col("segmentation").alias("b")), "w")
        .where(F.col("a") != F.col("b"))
        .count()
    )
    print(f"lexicon words whose split changed:     {changed}")


if __name__ == "__main__":
    main()
