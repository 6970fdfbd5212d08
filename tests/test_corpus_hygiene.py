"""Unit tests for the training-corpus hygiene operators
(operators/textops.py: redact_pii / repetition_filter / decontaminate)
on crafted inputs where the right answer is hand-checkable."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffi_etl_spark.operators.textops import (
    decontaminate,
    redact_pii,
    repetition_filter,
)


def test_redact_pii_all_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.smith+x@sub.example.co.uk now"),
            (2, "call 415-555-0147 or visit 192.168.0.1"),
            (3, "no pii here"),
            (4, "two mails a@b.io c@d.org and 10.0.0.1"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert rows[1]["redacted"] == "mail <EMAIL> now"
    assert (rows[1]["n_emails"], rows[1]["n_phones"], rows[1]["n_ips"]) == (1, 0, 0)
    assert rows[2]["redacted"] == "call <PHONE> or visit <IP>"
    assert rows[3]["redacted"] == "no pii here"
    assert rows[4]["redacted"] == "two mails <EMAIL> <EMAIL> and <IP>"
    assert rows[4]["n_emails"] == 2


def test_redact_pii_email_wins_over_ip(spark):
    # digits-and-dots local part: the email pattern must consume it
    # before the bare-IP pattern can nibble the middle
    df = spark.createDataFrame([(1, "x 1.2.3.4@example.com y")], "doc_id long, text string")
    row = redact_pii(df).collect()[0]
    assert row["redacted"] == "x <EMAIL> y"
    assert row["n_ips"] >= 1  # counted pre-redaction; the rewrite order still wins


def test_repetition_filter_flags_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "spam ham " * 10),  # one 2-gram dominates -> reject
            (2, "a b c d e f g h i j"),  # all 2-grams unique -> keep
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_filter(df).collect()}
    assert rows[1]["keep"] is False
    assert rows[1]["top_gram_n"] == 10  # "spam ham" x10
    assert rows[2]["keep"] is True
    assert rows[2]["n_grams"] == 9
    assert rows[2]["top_gram_n"] == 1


def test_decontaminate_finds_planted_overlap(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (100, bench_text),  # benchmark doc (id % 100 == 0)
            (1, "intro alpha beta gamma delta epsilon outro"),  # 5-gram overlap
            (2, "totally unrelated words only here"),
        ],
        "doc_id long, text string",
    )
    out = decontaminate(df, F.col("doc_id") % 100 == 0, n=5).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["n_shared_grams"] == 1  # exactly "alpha beta gamma delta epsilon"


def test_keyword_tfidf_ranks_rare_terms(spark):
    from ffi_etl_spark.operators.textops import keyword_tfidf

    df = spark.createDataFrame(
        [
            (1, "common common rare common"),
            (2, "common unique"),
            (3, "common common"),
        ],
        "doc_id long, text string",
    )
    out = keyword_tfidf(df, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'common' appears in every doc (df=3, idf=(3-3+.5)/3.5) while the
    # doc-specific terms have df=1 (idf=2.5/1.5) -> rare term wins
    assert top[1] == "rare"
    assert top[2] == "unique"
    assert top[3] == "common"  # only term present
    row1 = {r["doc_id"]: r for r in out}[1]
    assert row1["tf"] == 1 and row1["df"] == 1
    assert abs(row1["tfidf"] - (1 * (3 - 1 + 0.5) / 1.5)) < 1e-12


def test_global_cumsum_matches_naive_window(spark):
    from pyspark.sql import Window

    from ffi_etl_spark.operators.textops import global_cumsum_exclusive

    df = spark.range(0, 1000).select(
        F.col("id"), (F.pmod(F.col("id") * 37, F.lit(11)) + 1).alias("v")
    )
    got = {
        r["id"]: r["off"]
        for r in global_cumsum_exclusive(df, "id", "v", "off", num_ranges=7).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["id"]: r["off"]
        for r in df.select("id", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("off")).collect()
    }
    assert got == want


def test_pack_sequences_layout(spark):
    from ffi_etl_spark.operators.textops import pack_sequences

    docs = spark.createDataFrame(
        [
            (1, "a b c"),            # 3 tokens: [0,3) -> chunk 0
            (2, " ".join(["t"] * 6)),  # 6 tokens: [3,9) -> straddles 0..2 with L=4
            (3, "x"),                # 1 token: [9,10) -> chunk 2
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pack_sequences(docs, chunk_tokens=4).collect()}
    assert (rows[1]["tok_start"], rows[1]["chunk_start"], rows[1]["chunk_end"]) == (0, 0, 0)
    assert (rows[2]["tok_start"], rows[2]["chunk_start"], rows[2]["chunk_end"]) == (3, 0, 2)
    assert rows[2]["n_chunks"] == 3
    assert (rows[3]["tok_start"], rows[3]["chunk_start"], rows[3]["n_chunks"]) == (9, 2, 1)


def test_chunk_documents_windows(spark):
    from ffi_etl_spark.operators.textops import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "short doc")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(docs, chunk_tokens=4, stride=3).collect()
    )
    # doc 1: starts at tokens 1,4,7,10 -> windows of 4 with a short tail
    assert rows[0] == (1, 0, "t0 t1 t2 t3", 4)
    assert rows[1] == (1, 1, "t3 t4 t5 t6", 4)
    assert rows[2] == (1, 2, "t6 t7 t8 t9", 4)
    assert rows[3] == (1, 3, "t9", 1)
    # doc 2: single window shorter than chunk_tokens
    assert rows[4] == (2, 0, "short doc", 2)


def test_term_collocations_finds_planted_phrase(spark):
    from ffi_etl_spark.operators.textops import term_collocations

    rows = [(i, "the quick fox saw a dull dog") for i in range(10)]
    rows += [(100 + i, "unrelated words entirely here") for i in range(3)]
    rows += [(200, "solo")]  # 1-token doc: must not break pair generation
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = term_collocations(df, window=2, min_count=5, k=5).collect()
    top = (out[0]["a"], out[0]["b"])
    # every repeated-doc adjacency has f(a,b)=10 = f(a)=f(b) -> dice=1.0
    assert out[0]["dice"] == 1.0 and top[0] != top[1]
    assert all(r["n_ab"] >= 5 for r in out)


def test_token_entropy_matches_counter(spark):
    """Differential: engine entropy == -Σ (c/n)ln(c/n) computed with
    collections.Counter in Python, to 1e-9."""
    import math
    from collections import Counter

    from ffi_etl_spark.operators.textops import token_entropy

    docs = [
        (1, "a a a a"),                       # zero entropy
        (2, "a b c d"),                       # ln(4), maximal
        (3, "the cat sat on the mat the end"),
        (4, "x"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.entropy_nats) for r in token_entropy(df).collect()}
    for doc_id, text in docs:
        counts = Counter(text.split())
        n = sum(counts.values())
        want = -sum((c / n) * math.log(c / n) for c in counts.values())
        assert got[doc_id][0] == n
        assert abs(got[doc_id][1] - want) < 1e-9, (doc_id, got[doc_id], want)


def test_token_entropy_keeps_tokenless_docs(spark):
    """ADVICE r02: NULL / empty / whitespace-only text must NOT vanish
    (a per-doc quality join loses rows) and must NOT count the empty
    string as a token — they land as n_tokens=0, entropy 0.0."""
    from ffi_etl_spark.operators.textops import token_entropy

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "a b")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.entropy_nats) for r in token_entropy(df).collect()}
    assert set(got) == {1, 2, 3, 4}
    for d in (1, 2, 3):
        assert got[d] == (0, 0.0), (d, got[d])
    assert got[4][0] == 2


def test_reservoir_sample_is_deterministic_bottom_k(spark):
    """The kept set is exactly the k smallest md5 draws, independent of
    partitioning."""
    import hashlib

    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    rows = entry_mod.queries()["reservoir_sample"](spark, sf).collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == 100 and len(set(ids)) == 100

    import duckdb

    all_ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{sf}/documents.parquet')"
        ).fetchall()
    ]
    draw = lambda i: (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16), i)  # noqa: E731
    want = [i for _, i in sorted(draw(i) for i in all_ids)[:100]]
    assert sorted(ids) == sorted(want)
