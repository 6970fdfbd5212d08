"""Text-analysis expressions: tokens, quality scores, language ID.

Heuristics a large-scale training-data pipeline runs over raw text —
all as built-in-function expressions (regexp + array ops) so they scan
at full codegen speed; at 100 TB these run in the same stage as the
parquet scan with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword markers per language for the voting heuristic. Small by
# design — language ID at scale wants a model; this is the cheap
# first-pass filter tier.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

ENGLISH_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def ws_tokens(c: Column) -> Column:
    """Whitespace tokenization (empty text yields [''])."""
    return F.split(F.trim(c), r"\s+")


def ws_token_count(c: Column) -> Column:
    return F.size(ws_tokens(c))


def bpe_token_count(c: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / punct)."""
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0))


def punct_ratio(c: Column) -> Column:
    stripped = F.regexp_replace(c, r"[^\w\s]", "")
    return (F.length(c) - F.length(stripped)).cast("double") / F.greatest(
        F.length(c), F.lit(1)
    )


def stopword_count(c: Column, words: list[str]) -> Column:
    """Occurrences of any marker word, word-bounded, case-insensitive."""
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pattern), 0))


def stopword_ratio(c: Column, words: list[str] | None = None) -> Column:
    return stopword_count(c, words or ENGLISH_STOPWORDS).cast("double") / F.greatest(
        ws_token_count(c), F.lit(1)
    )


def mean_word_length(c: Column) -> Column:
    toks = ws_tokens(c)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1))


def quality_score(c: Column) -> Column:
    """Composite [0,1]-ish quality score: length band + low punctuation +
    healthy stopword density + sane word length. Deterministic rational
    arithmetic (oracle-expressible)."""
    n = F.length(c)
    len_ok = F.when((n >= 100) & (n <= 10000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(c) < 0.1, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(c) > 0.05, 1.0).otherwise(0.0)
    word_ok = F.when(
        (mean_word_length(c) >= 3) & (mean_word_length(c) <= 10), 1.0
    ).otherwise(0.0)
    return (len_ok + punct_ok + stop_ok + word_ok) / 4.0


def lang_id(c: Column) -> Column:
    """Marker-word voting with a fixed precedence tiebreak
    (en > es > de > fr > unknown). A doc with zero markers in every
    language is 'und'."""
    scores = {lang: stopword_count(c, words) for lang, words in LANG_MARKERS.items()}
    s = scores
    return (
        F.when(
            (s["en"] > 0)
            & (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]),
            "en",
        )
        .when((s["es"] > 0) & (s["es"] >= s["de"]) & (s["es"] >= s["fr"]), "es")
        .when((s["de"] > 0) & (s["de"] >= s["fr"]), "de")
        .when(s["fr"] > 0, "fr")
        .otherwise("und")
    )
