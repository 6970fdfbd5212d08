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


def test_dedup_keep_best_keeps_richest_variant(spark):
    """Formatting variants collapse to one group; the keeper is the doc
    with the most raw chars (tie → min id), not the min id outright."""
    docs = spark.createDataFrame(
        [
            (1, "Hello, World!", "en", "a", 13),     # normalized: 'hello world'
            (2, "hello world", "en", "a", 11),
            (3, "HELLO -- WORLD --", "en", "a", 17), # richest variant
            (4, "something else", "en", "a", 14),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with mock.patch.object(datamix, "table", lambda *_a, **_k: docs):
        rows = {r.keep_id: r for r in QUERIES["dedup_keep_best"](spark, "unused").collect()}
    assert set(rows) == {3, 4}
    assert rows[3].n_variants == 3 and rows[3].keep_chars == 17
    assert rows[4].n_variants == 1


def test_training_order_is_dense_and_partition_invariant(spark, sf_dir):
    """Positions are exactly 1..n within each shard, and the order is
    identical however the input is partitioned (determinism contract)."""
    out = QUERIES["training_order"](spark, sf_dir).collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard_id, []).append(r.position)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard

    from ffi_etl_spark.queries_pkg.datamix import table as real_table

    def repartitioned(spark_, sf, name):
        return real_table(spark_, sf, name).repartition(13)

    with mock.patch.object(datamix, "table", repartitioned):
        out2 = QUERIES["training_order"](spark, sf_dir).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_mixture_temperature_flattens(spark, sf_dir):
    """α=0.5 keeps at least as much of every source as the uniform
    target (sqrt(p) ≥ p for p ≤ 1), keeps the smallest source whole,
    and keeps a HIGHER fraction of small sources than of big ones."""
    rows = {r.source: r for r in QUERIES["mixture_temperature"](spark, sf_dir).collect()}
    min_n = min(r.n_total for r in rows.values())
    for r in rows.values():
        assert r.n_kept_temp >= r.n_kept_uniform, r.source
        if r.n_total == min_n:
            assert r.n_kept_temp == r.n_total == r.n_kept_uniform
    big = max(rows.values(), key=lambda r: r.n_total)
    small = min(rows.values(), key=lambda r: r.n_total)
    if big.n_total > small.n_total:
        assert big.n_kept_temp / big.n_total < 1.0


def test_export_training_shards_end_to_end(spark, tmp_path):
    """The example exporter writes one partition dir per shard, the
    manifest matches the written files, and the manifest equals the
    training_export gated query's answer (same sample + shard rules)."""
    import json
    import os

    from examples.export_training_shards import export_shards

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    rows = export_shards(spark, docs, str(tmp_path), n_shards=8)

    gated = {r.shard_id: r for r in QUERIES["training_export"](spark, "/root/testdata/sf0.001").collect()}
    assert {r["shard_id"]: (r["n_docs"], r["chars_total"]) for r in rows} == {
        s: (g.n_docs, g.chars_total) for s, g in gated.items()
    }
    with open(os.path.join(tmp_path, "manifest.json")) as f:
        m = json.load(f)
    assert m["n_shards"] == 8 and len(m["shards"]) == len(rows)
    part_dirs = {d for d in os.listdir(tmp_path / "data") if d.startswith("shard_id=")}
    assert part_dirs == {f"shard_id={r['shard_id']}" for r in rows}
