"""Round-13 checkpoint audit (VERDICT r12 item 7): is each surviving
``localCheckpoint(eager=True)`` in the tokenizer family load-bearing?

Rebuilds ``unigram_viterbi_segment`` / ``unigram_em_refit`` from the
same building blocks with individual checkpoints toggled off, asserts
row parity against the shipped form once, and interleave-times each
variant with job counts.

Usage: python tools/exp_ckpt_r13.py [draws]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ab_r13 import run_ab  # noqa: E402


def main() -> None:
    draws = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.operators.tokenizer import (
        UNI_MAX_PIECE,
        UNI_MAX_WORD,
        UNI_SCALE_BITS,
        UNI_VOCAB,
        _viterbi_dp,
        unigram_lexicon,
        unigram_vocab,
    )
    from ffi_etl_spark.session import get_session

    spark = get_session("exp_ckpt_r13")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    docs = table(spark, sf_dir, "documents")

    def seg(ckpt_lex: bool):
        lex = unigram_lexicon(docs, "text", 5000)
        if ckpt_lex:
            lex = lex.localCheckpoint(eager=True)
        vocab = unigram_vocab(lex, UNI_VOCAB, UNI_MAX_PIECE)
        words = lex.select("w", F.length("w").alias("wlen"))
        return _viterbi_dp(words, vocab, UNI_MAX_PIECE, UNI_MAX_WORD)

    def refit(ckpt_lex: bool, ckpt_vocab1: bool, ckpt_usage: bool):
        lex = unigram_lexicon(docs, "text", 5000)
        if ckpt_lex:
            lex = lex.localCheckpoint(eager=True)
        vocab1 = unigram_vocab(lex, UNI_VOCAB, UNI_MAX_PIECE)
        if ckpt_vocab1:
            vocab1 = vocab1.localCheckpoint(eager=True)
        words = lex.select("w", F.length("w").alias("wlen"))
        seg1 = _viterbi_dp(words, vocab1, UNI_MAX_PIECE, UNI_MAX_WORD)
        usage = (
            seg1.join(lex, "w")
            .select(
                F.col("freq"),
                F.explode(F.split(F.col("segmentation"), " ")).alias("piece"),
            )
            .groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("used"))
        )
        if ckpt_usage:
            usage = usage.localCheckpoint(eager=True)
        tu = usage.agg(F.sum("used").cast("long").alias("tu"))
        vsz = vocab1.agg(F.count(F.lit(1)).cast("long").alias("v"))
        scale = float(1 << UNI_SCALE_BITS)
        vocab2 = (
            vocab1.select("piece")
            .join(usage, "piece", "left")
            .crossJoin(F.broadcast(tu))
            .crossJoin(F.broadcast(vsz))
            .select(
                "piece",
                F.floor(
                    F.lit(scale)
                    * F.log(
                        (F.coalesce(F.col("used"), F.lit(0)) + F.lit(1)).cast(
                            "double"
                        )
                        / (F.col("tu") + F.col("v")).cast("double")
                    )
                )
                .cast("long")
                .alias("score_q"),
            )
        )
        return _viterbi_dp(words, vocab2, UNI_MAX_PIECE, UNI_MAX_WORD)

    # parity once: no-checkpoint forms must return the same rows
    base = sorted(map(tuple, seg(True).collect()))
    assert sorted(map(tuple, seg(False).collect())) == base, "seg parity"
    rbase = sorted(map(tuple, refit(True, True, True).collect()))
    assert sorted(map(tuple, refit(False, True, True).collect())) == rbase
    assert sorted(map(tuple, refit(True, False, True).collect())) == rbase
    assert sorted(map(tuple, refit(True, True, False).collect())) == rbase
    print("# parity ok", file=sys.stderr)
    spark.catalog.clearCache()

    print("== unigram_lm_segment (lex ckpt) ==", file=sys.stderr)
    run_ab(
        spark,
        {"ckpt": lambda: seg(True), "no_ckpt": lambda: seg(False)},
        draws=draws,
    )
    print("== unigram_em_refit (drop one each) ==", file=sys.stderr)
    run_ab(
        spark,
        {
            "all3": lambda: refit(True, True, True),
            "no_lex": lambda: refit(False, True, True),
            "no_vocab1": lambda: refit(True, False, True),
            "no_usage": lambda: refit(True, True, False),
        },
        draws=draws,
    )


if __name__ == "__main__":
    main()
