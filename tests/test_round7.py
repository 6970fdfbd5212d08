"""Round-7 additions: adaptive-minhash gating, raw-text roundtrips,
and the split pin that keeps the dedup_minhash_adaptive oracle honest.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table


def test_adaptive_split_pinned_on_testdata(spark):
    """The dedup_minhash_adaptive ORACLE (queries_pkg/round7.py)
    hard-codes the (24, 4, 6) split because the deterministic ambient
    probe picks exactly that on this corpus at every gate SF. If the
    probe, the chooser, or the testdata drifts so the pick changes,
    this test fails BEFORE the oracle silently mismatches."""
    from ffi_etl_spark.functions.lsh_tuning import choose_minhash_split
    from ffi_etl_spark.operators.dedup import estimate_ambient_jaccard

    for sf in ("0.001", "0.01"):
        docs = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
        amb = estimate_ambient_jaccard(docs)
        assert choose_minhash_split(amb, 0.5) == (24, 4, 6), (sf, amb)


def test_adaptive_found_set_supersets_default_at_dup_sim(spark, sf_dir):
    """The adaptive tier's contract at the true-dup threshold: every
    j >= 0.9 pair the default split finds, the tuned split finds too
    (its S-curve recall at 0.9 is higher: 0.952 vs 0.943), and both
    agree on the exact Jaccard value — banding changes the CANDIDATE
    set only, never a verified value."""
    from ffi_etl_spark.operators.dedup import (
        dedup_minhash_adaptive,
        dedup_minhash_lsh,
    )

    docs = table(spark, sf_dir, "documents")
    default = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in dedup_minhash_lsh(docs).filter(F.col("jaccard_sim") >= 0.9).collect()
    }
    adaptive = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in dedup_minhash_adaptive(docs, fast=False)
        .filter(F.col("jaccard_sim") >= 0.9)
        .collect()
    }
    assert set(default) <= set(adaptive)
    for p in default:
        assert adaptive[p] == default[p]


def test_text_lines_roundtrip_counts(spark, sf_dir):
    from ffi_etl_spark.queries import QUERIES

    row = QUERIES["text_lines_roundtrip"](spark, sf_dir).collect()[0]
    n_docs = table(spark, sf_dir, "documents").count()
    assert row["n_lines"] == n_docs
    assert row["total_chars"] > 0 and row["content_checksum"] > 0


def test_documents_whole_roundtrip_content(spark, sf_dir):
    """Whole-file ingest returns each subset document's EXACT text:
    md5 and length both match the parquet truth per doc_id."""
    from ffi_etl_spark.queries import QUERIES
    from ffi_etl_spark.queries_pkg.round7 import _WHOLE_DOC_MOD

    got = {
        r["doc_id"]: (r["n_chars_file"], r["content_hash"])
        for r in QUERIES["documents_whole_roundtrip"](spark, sf_dir).collect()
    }
    want = {
        r["doc_id"]: (r["n"], r["h"])
        for r in table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _WHOLE_DOC_MOD == 0)
        .select(
            "doc_id",
            F.length("text").cast("long").alias("n"),
            F.md5("text").alias("h"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_whole_roundtrip_cleans_stale_files(spark, sf_dir):
    """A stale file from a previous run (different subset) must not
    leak extra rows into the roundtrip output."""
    import tempfile

    from ffi_etl_spark.queries import QUERIES

    root = os.path.join(
        tempfile.gettempdir(), f"ffi_etl_wholedocs_{os.path.basename(sf_dir)}"
    )
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "doc_999999.txt"), "w") as f:
        f.write("stale")
    out = QUERIES["documents_whole_roundtrip"](spark, sf_dir)
    assert out.filter(F.col("doc_id") == 999999).count() == 0
