"""Unigram-LM vocabulary + Viterbi segmentation."""

from __future__ import annotations

from ffi_etl_spark.operators.tokenizer import (
    UNI_MAX_WORD,
    unigram_lexicon,
    unigram_viterbi_segment,
    unigram_vocab,
)


def _seg(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["w"]: r for r in unigram_viterbi_segment(df, **kw).collect()}


def test_viterbi_prefers_frequent_whole_pieces(spark):
    # "ab" appears standalone many times -> high score; "abab" should
    # segment as "ab ab", never char-by-char
    out = _seg(spark, ["ab ab ab ab ab ab ab ab abab", "ab ab cd"])
    assert out["abab"]["segmentation"] == "ab ab"
    assert out["abab"]["n_pieces"] == 2
    assert out["ab"]["segmentation"] == "ab"


def test_viterbi_covers_every_lexicon_word(spark):
    # rare junk words must still segment (single-char fallback)
    out = _seg(spark, ["xyzq mmmm common common common"])
    assert set(out) == {"xyzq", "mmmm", "common"}
    for r in out.values():
        assert r["n_pieces"] >= 1
        assert "".join(r["segmentation"].split(" ")) == r["w"]


def test_viterbi_truncates_long_words(spark):
    long_word = "a" * 40
    out = _seg(spark, [f"{long_word} bb bb"])
    assert "a" * UNI_MAX_WORD in out
    assert all(len(w) <= UNI_MAX_WORD for w in out)


def test_viterbi_deterministic_under_repartition(spark):
    texts = ["hello world hello lowly", "low lower lowest worldly hello"]
    df1 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = sorted(
        (r["w"], r["segmentation"], r["score_q"])
        for r in unigram_viterbi_segment(df1).collect()
    )
    b = sorted(
        (r["w"], r["segmentation"], r["score_q"])
        for r in unigram_viterbi_segment(df1.repartition(17)).collect()
    )
    assert a == b


def test_vocab_contains_single_chars_and_caps(spark):
    df = spark.createDataFrame([(0, "abc abd abe abf")], "doc_id long, text string")
    lex = unigram_lexicon(df)
    rows = {r["piece"]: r for r in unigram_vocab(lex, vocab_cap=3).collect()}
    # cap applies to multi-char pieces, but every seen char survives
    for ch in "abcdef":
        assert ch in rows
    assert all(r["score_q"] < 0 for r in rows.values())  # ln(p<1) < 0
    spark.catalog.clearCache()


def test_em_refit_prunes_unused_pieces(spark):
    """After one hard-EM round, a piece the seed segmentation never
    uses scores near the floor, and frequently-used whole pieces keep
    winning: 'abab' still segments as 'ab ab', and the refit score of
    the used piece dominates."""
    from ffi_etl_spark.operators.tokenizer import unigram_em_refit

    df = spark.createDataFrame(
        [(1, "ab ab ab ab ab ab ab ab abab"), (2, "ab ab cd")],
        "doc_id long, text string",
    )
    out = {r["w"]: r for r in unigram_em_refit(df).collect()}
    assert out["abab"]["segmentation"] == "ab ab"
    assert out["ab"]["segmentation"] == "ab"
    assert out["cd"]["segmentation"] == "cd"
    # coverage invariant survives the refit
    for r in out.values():
        assert "".join(r["segmentation"].split(" ")) == r["w"]
    spark.catalog.clearCache()
