"""Tests for the training-data layout queries (queries_pkg/datamix.py)."""

from __future__ import annotations

import unittest.mock as mock

import pyspark.sql.functions as F

from ffi_etl_spark.catalog import table
from ffi_etl_spark.queries import QUERIES
from ffi_etl_spark.queries_pkg import datamix


def test_shard_assignment_partitions_corpus(spark, sf_dir):
    rows = QUERIES["shard_assignment"](spark, sf_dir).collect()
    assert [r["shard_id"] for r in rows] == sorted(r["shard_id"] for r in rows)
    assert all(0 <= r["shard_id"] < 16 for r in rows)
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs  # exact partition
    # md5 spreads uniformly: no shard should be wildly off 1/16
    assert max(r["n_docs"] for r in rows) < 3 * n_docs / 16


def test_mixture_balance_hits_min_source(spark, sf_dir):
    rows = QUERIES["mixture_balance"](spark, sf_dir).collect()
    assert rows
    min_n = min(r["n_total"] for r in rows)
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_total"]
        if r["n_total"] == min_n:
            # rate = 1 for the smallest source: keep everything
            assert r["n_kept"] == r["n_total"]
        else:
            # binomial(n_total, min_n/n_total): mean min_n, sd < sqrt(min_n)
            assert abs(r["n_kept"] - min_n) < 6 * max(min_n, 30) ** 0.5


def test_sorted_neighborhood_finds_planted_neardup(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", "en", "a", 50),
            (2, "the quick brown fox jumps over the lazy cat today", "en", "a", 50),
            (3, "completely different text about spark partitions!!", "en", "a", 50),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with mock.patch.object(datamix, "table", lambda *_a, **_k: docs):
        rows = QUERIES["dedup_sorted_neighborhood"](spark, "unused").collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert (1, 2) in pairs  # one-char difference sorts adjacent and matches
    assert all({a, b} != {1, 3} and {a, b} != {2, 3} for a, b in pairs)


def test_sorted_neighborhood_pairs_are_block_local(spark, sf_dir):
    df = QUERIES["dedup_sorted_neighborhood"](spark, sf_dir)
    rows = df.collect()
    assert rows, "sf0.001 corpus should contain adjacent near-dups"
    for r in rows:
        assert r["doc_a"] != r["doc_b"]
        assert 0 <= r["dist"] <= 8
