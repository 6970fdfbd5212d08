"""Document-level text-analysis operators (over the `documents` table)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffi_etl_spark.functions.hashing import md5_int32, minhash_signature, word_ngrams
from ffi_etl_spark.functions.textstats import (
    bpe_token_count,
    lang_id,
    mean_word_length,
    punct_ratio,
    quality_score,
    stopword_ratio,
    ws_token_count,
)


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc stats: token counts, punct/stopword ratios, quality score."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        ws_token_count(t).alias("n_tokens_ws"),
        bpe_token_count(t).alias("n_tokens_bpe"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(mean_word_length(t), 6).alias("mean_word_len"),
        quality_score(t).alias("quality_score"),
    )


def detect_language(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID (cheap first-pass tier)."""
    return df.select(F.col(id_col), lang_id(F.col(text_col)).alias("lang_pred"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                num_perm: int = 4, ngram: int = 3) -> DataFrame:
    """Compact content fingerprint: MinHash over word n-grams, joined
    into one string key — a cheap winnowing-style doc signature usable
    as a grouping key for fuzzy clustering."""
    hashes = F.array_distinct(F.transform(word_ngrams(F.col(text_col), ngram), md5_int32))
    sig = minhash_signature(hashes, num_perm)
    return df.select(
        F.col(id_col),
        F.lower(
            F.concat_ws("-", F.transform(sig, lambda x: F.conv(x.cast("string"), 10, 16)))
        ).alias("fingerprint"),
    )


def quality_filter(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pretraining-corpus quality gate: first-match-wins rejection
    cascade over the quality signals (the C4/Gopher-rule shape, and the
    same ordered-when-chain pattern as the reference's validity cascade,
    transform_alchemer_data.py:201-224). Entirely JVM-side expressions —
    one narrow pass, no shuffle; at 100 TB this is a scan-stage filter
    whose selectivity should be measured (text_stats) before it runs."""
    t = F.col(text_col)
    n = F.length(t)
    reason = (
        F.when(n < 100, "too_short")
        .when(n > 10000, "too_long")
        .when(punct_ratio(t) >= 0.1, "too_punctuated")
        .when(stopword_ratio(t) <= 0.05, "low_stopword_density")
        .when((mean_word_length(t) < 3) | (mean_word_length(t) > 10), "abnormal_word_length")
        .otherwise("ok")
    )
    return df.select(
        F.col(id_col),
        reason.alias("reject_reason"),
        (reason == "ok").alias("keep"),
    )
