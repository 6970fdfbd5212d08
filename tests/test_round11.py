"""Round-11 locks (VERDICT r10 items 1-4 + ADVICE r10).

1. ``probe_frac`` — the production probe dial for the stored IVF
   index: nprobe = max(1, ceil(probe_frac · cells)), cells read off
   the stored model's own ``_cells`` stamp, so the effective nprobe
   GROWS with the stored cell count (a fixed integer nprobe is
   scale-blind — BENCH_IVF_RECALL_r10_sf10 measured its recall decay).
2. Drift remedy wired into the streaming ANN sink: a contract-tripping
   batch triggers re-materialize over stored ∪ batch + atomic swap
   (rebuild_on_drift) instead of stopping the pipeline; the refusal
   path stays the default; mid-swap crash states recover coherent.
3. The shared bucketed-state layout stack (operators/stored_state.py)
   and the band index's ``_layout_id`` identity stamp — a split
   mismatch between a stored band index and the run's parameters must
   REFUSE (operator) or heal by recompute (ingest), never silently
   lose candidates.
4. Compaction discovery in the streaming ANN sink costs ONE file
   listing per sink lifetime (counter seeded once, then maintained
   from each append's touched cells) — not one per micro-batch.
5. Fuzzer grammar coverage: every grammar arm must generate at least
   once over a fixed seed sweep (ADVICE r10: three round-10d branches
   were interval-shadowed and never — or almost never — generated).
"""

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table


# ---------------------------------------------------------------------------
# probe_frac
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_cells", [4, 12])
def test_probe_frac_effective_nprobe_grows_with_cells(
    spark, sf_dir, tmp_path, n_cells
):
    """probe_frac=0.25 must probe ceil(0.25·4)=1 cell on a 4-cell
    index and ceil(0.25·12)=3 cells on a 12-cell index over the SAME
    corpus — bit-parity with the explicit-nprobe call in both cases
    locks the ceil rule and the _cells-stamp read (both the gated path
    and the trust_layout 1-row-probe path)."""
    from ffi_etl_spark.operators.similarity import (
        ann_ivf_query_stored,
        ivf_index_tables,
        write_ivf_assignments,
    )

    frac = 0.25
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    centroids, assignments = ivf_index_tables(
        emb, n_iter=2, quantize_bits=20, cells=n_cells
    )
    c, a = str(tmp_path / "c"), str(tmp_path / "a")
    centroids.write.parquet(c)
    write_ivf_assignments(assignments, a)
    sc, sa = spark.read.parquet(c), spark.read.parquet(a)

    expected_nprobe = max(1, math.ceil(frac * n_cells))
    assert expected_nprobe == {4: 1, 12: 3}[n_cells]
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    want = sorted(
        ann_ivf_query_stored(sc, sa, queries, nprobe=expected_nprobe).collect(),
        key=key,
    )
    got = sorted(
        ann_ivf_query_stored(sc, sa, queries, probe_frac=frac).collect(), key=key
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0
    # trust_layout path derives cells from a 1-row footer probe instead
    # of the layout gate — same answer
    trusted = sorted(
        ann_ivf_query_stored(
            sc, sa, queries, probe_frac=frac, trust_layout=True
        ).collect(),
        key=key,
    )
    assert [tuple(r) for r in trusted] == [tuple(r) for r in want]


def test_probe_frac_in_query_tier_matches_stored(spark, sf_dir, tmp_path):
    """ann_ivf_autok(probe_frac=f) must equal the stored tier probed
    at the same fraction over the same corpus and model parameters —
    one fraction states one recall target across both tiers."""
    from ffi_etl_spark.operators.similarity import (
        ann_ivf_autok,
        ann_ivf_query_stored,
        ivf_index_tables,
        write_ivf_assignments,
    )

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    centroids, assignments = ivf_index_tables(
        emb, n_iter=2, quantize_bits=20, cells=9
    )
    c, a = str(tmp_path / "c"), str(tmp_path / "a")
    centroids.write.parquet(c)
    write_ivf_assignments(assignments, a)
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    stored = sorted(
        ann_ivf_query_stored(
            spark.read.parquet(c), spark.read.parquet(a), queries,
            probe_frac=0.3,
        ).collect(),
        key=key,
    )
    inq = sorted(
        ann_ivf_autok(
            emb, queries, n_iter=2, quantize_bits=20, cells=9, probe_frac=0.3
        ).collect(),
        key=key,
    )
    assert [tuple(r) for r in inq] == [tuple(r) for r in stored]
    assert len(inq) > 0
    with pytest.raises(ValueError, match="probe_frac"):
        ann_ivf_autok(emb, queries, cells=9, probe_frac=2.0)


def test_probe_frac_validation(spark, sf_dir, tmp_path):
    from ffi_etl_spark.operators.similarity import (
        ann_ivf_query_stored,
        ivf_index_tables,
        write_ivf_assignments,
    )

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    centroids, assignments = ivf_index_tables(emb, n_iter=1, quantize_bits=20)
    c, a = str(tmp_path / "c"), str(tmp_path / "a")
    centroids.write.parquet(c)
    write_ivf_assignments(assignments, a)
    sc, sa = spark.read.parquet(c), spark.read.parquet(a)
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="probe_frac"):
            ann_ivf_query_stored(sc, sa, emb, probe_frac=bad)


# ---------------------------------------------------------------------------
# streaming ANN sink: drift rebuild + swap, compaction discovery
# ---------------------------------------------------------------------------


def _land_vecs(in_dir, name, rows):
    in_dir.mkdir(parents=True, exist_ok=True)
    with open(in_dir / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain_vecs(spark, in_dir, checkpoint, index_root, one_file_batches=False,
                **kwargs):
    from ffi_etl_spark.streaming.ann_ingest import stream_ann_ingest

    reader = spark.readStream
    if one_file_batches:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.schema("vec_id long, embedding array<double>").json(
        str(in_dir)
    )
    q = (
        stream_ann_ingest(stream, str(index_root), str(checkpoint), **kwargs)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _vec_rows(spark, sf_dir, lo, hi):
    emb = table(spark, sf_dir, "embeddings").filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    )
    return [
        {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
        for r in emb.collect()
    ]


def test_stream_ann_rebuild_on_drift_swap_and_replay(spark, sf_dir, tmp_path):
    """Planted drift (sim_floor above 1.0 flags EVERY vector, the
    test_round9 trick) with rebuild_on_drift: the sink re-materializes
    over stored ∪ batch and swaps — the grown index must be
    BIT-IDENTICAL to a one-pass ivf_index_tables build over the same
    vectors (quantized tier: fully deterministic), the model identity
    must change, a replay of the drained backlog must append nothing
    under the new model, and the default (no flag) must still refuse
    with the remedy."""
    from ffi_etl_spark.operators.similarity import (
        check_ivf_layout,
        ivf_index_tables,
    )

    rows1 = _vec_rows(spark, sf_dir, 0, 150)
    rows2 = _vec_rows(spark, sf_dir, 150, 220)
    in_dir, root = tmp_path / "in", tmp_path / "index"
    drift_kw = dict(
        quantize_bits=20, max_below_floor_share=0.5, sim_floor=1.0001
    )

    # bootstrap (first batch trains; the contract never fires here)
    _land_vecs(in_dir, "b1.json", rows1)
    _drain_vecs(spark, in_dir, tmp_path / "ck1", root,
                rebuild_on_drift=True, **drift_kw)
    mid_before = (
        spark.read.parquet(str(root / "centroids"))
        .select("_model_id").first()[0]
    )

    # default path: the drifted batch REFUSES with the remedy
    _land_vecs(in_dir, "b2.json", rows2)
    with pytest.raises(Exception, match="quantizer drift"):
        _drain_vecs(spark, in_dir, tmp_path / "ck_refuse", root, **drift_kw)

    # wired remedy: rebuild over stored ∪ batch + atomic swap
    _drain_vecs(spark, in_dir, tmp_path / "ck2", root,
                rebuild_on_drift=True, **drift_kw)
    model = spark.read.parquet(str(root / "centroids"))
    stored = spark.read.parquet(str(root / "assignments"))
    _, _, mid_after = check_ivf_layout(model, stored)
    assert mid_after != mid_before  # a NEW model era
    assert stored.count() == 220

    # bit-parity with a one-pass build over the same 220 vectors
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 220)
    cents1, assign1 = ivf_index_tables(emb, n_iter=2, quantize_bits=20)
    key = lambda r: r["vec_id"]  # noqa: E731
    got = sorted(
        stored.select("vec_id", "centroid_id", "_cells", "_model_id").collect(),
        key=key,
    )
    want = sorted(
        assign1.select("vec_id", "centroid_id", "_cells", "_model_id").collect(),
        key=key,
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert model.select("_model_id").first()[0] == \
        cents1.select("_model_id").first()[0]

    # replay the whole backlog (fresh checkpoint): every id is stored,
    # nothing appends, the model era is unchanged
    _drain_vecs(spark, in_dir, tmp_path / "ck3", root,
                rebuild_on_drift=True, **drift_kw)
    assert spark.read.parquet(str(root / "assignments")).count() == 220
    assert (
        spark.read.parquet(str(root / "centroids"))
        .select("_model_id").first()[0]
        == mid_after
    )


def test_recover_torn_swap_states(spark, sf_dir, tmp_path):
    """The two crash classes of the two-table swap resolve coherent:
    side dirs written but commit not started -> roll BACK (live index
    untouched, side dirs dropped); commit started (any __old__ marker)
    -> roll FORWARD (the new pair becomes live, markers dropped). In
    both end states check_ivf_layout passes — no mixed-era pair is
    ever served."""
    from ffi_etl_spark.operators.similarity import (
        check_ivf_layout,
        ivf_index_tables,
        write_ivf_assignments,
    )
    from ffi_etl_spark.streaming.ann_ingest import (
        _NEW_SUFFIX,
        _OLD_SUFFIX,
        _recover_torn_swap,
    )

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 120)
    old_c, old_a = ivf_index_tables(
        emb.filter(F.col("vec_id") < 80), n_iter=1, quantize_bits=20
    )
    new_c, new_a = ivf_index_tables(emb, n_iter=1, quantize_bits=20)
    root = tmp_path / "idx"
    root.mkdir()
    cpath, apath = str(root / "centroids"), str(root / "assignments")

    def fresh_live():
        for p in (cpath, apath, cpath + _NEW_SUFFIX, apath + _NEW_SUFFIX,
                  cpath + _OLD_SUFFIX, apath + _OLD_SUFFIX):
            import shutil

            shutil.rmtree(p, ignore_errors=True)
        old_c.write.parquet(cpath)
        write_ivf_assignments(old_a, apath)

    old_mid = old_c.select("_model_id").first()[0]
    new_mid = new_c.select("_model_id").first()[0]

    # crash BEFORE commit: both side dirs exist, no __old__ markers
    fresh_live()
    new_c.write.parquet(cpath + _NEW_SUFFIX)
    write_ivf_assignments(new_a, apath + _NEW_SUFFIX)
    _recover_torn_swap(cpath, apath)
    assert not os.path.exists(cpath + _NEW_SUFFIX)
    m, a = spark.read.parquet(cpath), spark.read.parquet(apath)
    assert check_ivf_layout(m, a)[2] == old_mid  # rolled back

    # crash MID-commit: centroids already swapped, assignments not yet
    fresh_live()
    new_c.write.parquet(cpath + _NEW_SUFFIX)
    write_ivf_assignments(new_a, apath + _NEW_SUFFIX)
    os.rename(cpath, cpath + _OLD_SUFFIX)
    os.rename(cpath + _NEW_SUFFIX, cpath)
    _recover_torn_swap(cpath, apath)
    assert not os.path.exists(cpath + _OLD_SUFFIX)
    assert not os.path.exists(apath + _NEW_SUFFIX)
    m, a = spark.read.parquet(cpath), spark.read.parquet(apath)
    assert check_ivf_layout(m, a)[2] == new_mid  # rolled forward


def test_rebuild_on_drift_refuses_remote_index_root(spark):
    """The swap protocol is os.rename — atomic on POSIX paths only. A
    distributed-store index root must fail at sink CONSTRUCTION, not
    at the first drifted batch months into the stream."""
    from ffi_etl_spark.streaming.ann_ingest import stream_ann_ingest

    in_dir = "/tmp/round11_guard_in"
    os.makedirs(in_dir, exist_ok=True)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).json(in_dir)
    with pytest.raises(ValueError, match="s3a://"):
        stream_ann_ingest(
            stream, "s3a://bucket/index", "/tmp/ck", rebuild_on_drift=True
        )


def test_stream_ann_compaction_discovery_lists_once(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r10: crowded-cell discovery must NOT re-list the
    assignments tree every micro-batch. One sink lifetime processing
    one bootstrap + three append batches pays exactly ONE listing
    (the counter seed); compaction still fires from the maintained
    counts (threshold forced low) and the per-cell file bound holds."""
    from collections import Counter

    from ffi_etl_spark.operators import stored_state

    calls = {"n": 0}
    real = stored_state.bucket_file_counts

    def counting(df, part_col):
        calls["n"] += 1
        return real(df, part_col)

    monkeypatch.setattr(stored_state, "bucket_file_counts", counting)

    in_dir, root = tmp_path / "in", tmp_path / "index"
    _land_vecs(in_dir, "b1.json", _vec_rows(spark, sf_dir, 0, 120))
    _land_vecs(in_dir, "b2.json", _vec_rows(spark, sf_dir, 120, 160))
    _land_vecs(in_dir, "b3.json", _vec_rows(spark, sf_dir, 160, 200))
    _land_vecs(in_dir, "b4.json", _vec_rows(spark, sf_dir, 200, 240))
    # one drain, one file per micro-batch -> ONE closure sees 4 batches
    _drain_vecs(spark, in_dir, tmp_path / "ck", root, one_file_batches=True,
                quantize_bits=20, compact_files_per_cell=2)

    assert calls["n"] == 1, f"expected 1 listing, saw {calls['n']}"
    stored = spark.read.parquet(str(root / "assignments"))
    assert stored.count() == 240
    # compaction kept every cell at or under the bound + 1 (a cell can
    # take one more append after its compaction)
    counts = Counter()
    for f in stored.inputFiles():
        import re

        m = re.search(r"centroid_id=(\d+)/", f)
        if m:
            counts[int(m.group(1))] += 1
    assert counts and max(counts.values()) <= 3


# ---------------------------------------------------------------------------
# shared bucketed-state stack + band-index identity
# ---------------------------------------------------------------------------


def test_write_bucketed_one_file_per_bucket(spark, tmp_path):
    from ffi_etl_spark.operators.stored_state import (
        bucket_file_counts,
        compact_buckets,
        write_bucketed,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 8).alias("b")
    ).repartition(16)
    path = str(tmp_path / "state")
    write_bucketed(df, path, "b")
    counts = bucket_file_counts(spark.read.parquet(path), "b")
    assert set(counts) == set(range(8)) and max(counts.values()) == 1
    # three appends crowd every bucket; compacting a SUBSET touches
    # only those buckets and never changes rows
    for _ in range(3):
        write_bucketed(df, path, "b", mode="append")
    before = sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )
    assert compact_buckets(spark, path, "b", [0, 3]) == 2
    counts = bucket_file_counts(spark.read.parquet(path), "b")
    assert counts[0] == 1 and counts[3] == 1 and counts[1] == 4
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before


def test_band_index_layout_identity(spark, sf_dir):
    """The band index's _layout_id stamp (VERDICT r10 item 3): the
    gate adopts a matching index and REFUSES a split mismatch — the
    silent failure it closes is candidate LOSS (a stale index's band
    keys come from a different banding), which no count can catch."""
    from ffi_etl_spark.operators.dedup import (
        check_band_index_layout,
        dedup_minhash_incremental,
        minhash_band_index,
        minhash_signature_table,
    )

    docs = table(spark, sf_dir, "documents").limit(60)
    sigs = minhash_signature_table(docs, num_perm=12, bands=3)
    idx = minhash_band_index(sigs)
    assert check_band_index_layout(idx, 12, 3) == 64
    with pytest.raises(ValueError, match="DIFFERENT banding"):
        check_band_index_layout(idx, 24, 4)
    # a pre-stamp index (no _layout_id) is refused with the remedy
    with pytest.raises(ValueError, match="_layout_id"):
        check_band_index_layout(idx.drop("_layout_id"), 12, 3)
    # the operator-level consumer refuses a user-passed mismatch
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    corpus_sigs = minhash_signature_table(corpus, num_perm=12, bands=3)
    stale_idx = minhash_band_index(
        minhash_signature_table(corpus, num_perm=24, bands=4)
    )
    with pytest.raises(ValueError, match="DIFFERENT banding"):
        dedup_minhash_incremental(
            None,
            batch,
            num_perm=12,
            bands=3,
            corpus_hashed=corpus_sigs,
            corpus_band_index=stale_idx,
        )


def test_stream_dedup_ingest_heals_prestamp_band_index(spark, tmp_path):
    """The streaming dedup ingest treats a stored band index that
    fails the identity gate (here: a pre-round-11 index with no
    _layout_id column) as derived state and heals by recompute — the
    batch succeeds and the healed index carries the stamp."""
    from ffi_etl_spark.operators.dedup import (
        minhash_band_index,
        minhash_signature_table,
    )
    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    # distinct bodies (no shared boilerplate): the test is about the
    # band-index HEAL, not dedup kills — every doc must survive
    docs = [
        {
            "doc_id": i,
            "text": " ".join(
                f"w{(i * 31 + j * 7919) % 104729}" for j in range(30)
            ),
        }
        for i in range(40)
    ]
    in_dir = tmp_path / "in"
    _land_vecs(in_dir, "b1.json", docs[:25])

    def drain():
        stream = spark.readStream.schema("doc_id long, text string").json(
            str(in_dir)
        )
        q = (
            stream_dedup_ingest(
                stream,
                str(tmp_path / "corpus"),
                str(tmp_path / "pairs"),
                str(tmp_path / "ck"),
                sigs_path=str(tmp_path / "sigs"),
                band_index_path=str(tmp_path / "bidx"),
                num_perm=12,
                bands=3,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    # replace the maintained index with a PRE-STAMP copy of itself
    sigs = spark.read.parquet(str(tmp_path / "sigs"))
    legacy = minhash_band_index(sigs).drop("_layout_id")
    import shutil

    shutil.rmtree(str(tmp_path / "bidx"))
    legacy.repartition("_bkt").write.partitionBy("_bkt").parquet(
        str(tmp_path / "bidx")
    )
    _land_vecs(in_dir, "b2.json", docs[25:])
    drain()  # must heal, not fail
    healed = spark.read.parquet(str(tmp_path / "bidx"))
    assert "_layout_id" in healed.columns
    assert spark.read.parquet(str(tmp_path / "corpus")).count() == 40


# ---------------------------------------------------------------------------
# fuzzer grammar coverage (ADVICE r10)
# ---------------------------------------------------------------------------


def test_fuzz_grammar_coverage():
    """Every grammar arm must generate at least once over a fixed seed
    sweep — an interval renumbering that shadows a branch (the
    round-10d ordered-LIMIT arm generated ZERO queries while the
    tallies claimed coverage) now fails here before any sweep tally
    can overstate itself."""
    from tools.fuzz_differential import selfcheck

    assert selfcheck(12000) == 0


def test_resplit_signature_state_swap_and_parity(spark, sf_dir, tmp_path):
    """The dedup twin of the ANN rebuild (round 11): re-materializing
    the stored MinHash state under a NEW split swaps both tables in
    one commit — the new state passes the layout gates under the new
    parameters (and refuses the old), the band index's identity stamp
    matches the new banding, and an incremental batch probed through
    the re-split state finds the exact pair set a fresh (24, 4) build
    finds."""
    from ffi_etl_spark.operators.dedup import (
        check_band_index_layout,
        check_signature_layout,
        dedup_minhash_incremental,
        minhash_band_index,
        minhash_signature_table,
        resplit_signature_state,
    )
    from ffi_etl_spark.operators.stored_state import write_bucketed

    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    sigs_path = str(tmp_path / "sigs")
    bidx_path = str(tmp_path / "bidx")

    # era 1: stored state pinned at (12, 3)
    old = minhash_signature_table(corpus, num_perm=12, bands=3)
    old.write.parquet(sigs_path)
    write_bucketed(minhash_band_index(old), bidx_path, "_bkt")

    # the remedy: re-materialize at (24, 4) and swap both tables
    got = resplit_signature_state(
        corpus, sigs_path, bidx_path, num_perm=24, bands=4
    )
    assert got == (24, 4)
    sigs = spark.read.parquet(sigs_path)
    bidx = spark.read.parquet(bidx_path)
    check_signature_layout(sigs, 24, 4)
    with pytest.raises(ValueError):
        check_signature_layout(sigs, 12, 3)
    assert check_band_index_layout(bidx, 24, 4) == 64
    with pytest.raises(ValueError, match="DIFFERENT banding"):
        check_band_index_layout(bidx, 12, 3)

    # consumer parity: incremental dedup through the re-split state ==
    # the same run against a fresh (24, 4) build
    key = lambda r: (r.id_a, r.id_b)  # noqa: E731
    got_pairs = sorted(
        dedup_minhash_incremental(
            None, batch, corpus_hashed=sigs, corpus_band_index=bidx,
            num_perm=24, bands=4,
        ).collect(),
        key=key,
    )
    fresh = minhash_signature_table(corpus, num_perm=24, bands=4)
    want_pairs = sorted(
        dedup_minhash_incremental(
            None, batch, corpus_hashed=fresh, num_perm=24, bands=4,
        ).collect(),
        key=key,
    )
    assert [tuple(r) for r in got_pairs] == [tuple(r) for r in want_pairs]

    # probe path: with no pinned split, the operator re-probes the
    # corpus and returns the pick (the testdata's pinned (24, 4))
    got2 = resplit_signature_state(corpus, sigs_path, bidx_path)
    assert got2 == (24, 4)


def test_generic_swap_recovery(spark, tmp_path):
    """stored_state.commit_swap / recover_torn_swap over a dir pair:
    side dirs without a marker roll BACK; any __swap_old__ marker
    rolls FORWARD; both end states are coherent."""
    import shutil

    from ffi_etl_spark.operators.stored_state import (
        NEW_SUFFIX,
        OLD_SUFFIX,
        commit_swap,
        recover_torn_swap,
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")

    def write(path, val, rows=5):
        spark.range(rows).select(
            F.col("id"), F.lit(val).alias("era")
        ).write.mode("overwrite").parquet(path)

    def era(path):
        vals = {r["era"] for r in spark.read.parquet(path).collect()}
        assert len(vals) == 1
        return vals.pop()

    # roll back: sides written, commit never started
    write(a, "old"), write(b, "old")
    write(a + NEW_SUFFIX, "new"), write(b + NEW_SUFFIX, "new")
    recover_torn_swap([a, b])
    assert era(a) == "old" and era(b) == "old"
    assert not os.path.exists(a + NEW_SUFFIX)

    # roll forward: crash after the first table fully swapped
    write(a + NEW_SUFFIX, "new"), write(b + NEW_SUFFIX, "new")
    os.rename(a, a + OLD_SUFFIX)
    os.rename(a + NEW_SUFFIX, a)
    recover_torn_swap([a, b])
    assert era(a) == "new" and era(b) == "new"
    assert not os.path.exists(a + OLD_SUFFIX)
    assert not os.path.exists(b + OLD_SUFFIX)

    # clean commit
    write(a + NEW_SUFFIX, "new2"), write(b + NEW_SUFFIX, "new2")
    commit_swap([a, b])
    assert era(a) == "new2" and era(b) == "new2"
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_stream_dedup_auto_resplit_on_drifted_distribution(
    spark, sf_dir, tmp_path
):
    """The auto-wired re-split (round 11): a stream bootstrapped on a
    low-ambient corpus pins (12, 3); when the incoming distribution
    shifts to the testdata documents (whose probe pick is the pinned
    (24, 4) — tests/test_round7.py), two consecutive Nth-batch probe
    disagreements trigger resplit_signature_state and BOTH state
    tables swap to the new split; later batches adopt it
    automatically. Deterministic: both picks are probe-pinned."""
    import time

    from ffi_etl_spark.operators.dedup import (
        check_band_index_layout,
        check_signature_layout,
    )
    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    soup = [
        {"doc_id": i, "text": " ".join(
            f"w{(i * 31 + j * 7919) % 104729}" for j in range(30))}
        for i in range(60)
    ]
    docs = table(spark, sf_dir, "documents").limit(160).collect()
    t1 = [{"doc_id": 1000000 + r["doc_id"], "text": r["text"]}
          for r in docs[:80]]
    t2 = [{"doc_id": 2000000 + r["doc_id"], "text": r["text"]}
          for r in docs[80:]]

    in_dir = tmp_path / "in"
    _land_vecs(in_dir, "b1.json", soup)
    time.sleep(1.1)  # FileStreamSource orders by mod time
    _land_vecs(in_dir, "b2.json", t1)
    time.sleep(1.1)
    _land_vecs(in_dir, "b3.json", t2)

    sigs_path = str(tmp_path / "sigs")
    bidx_path = str(tmp_path / "bidx")
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema("doc_id long, text string")
        .json(str(in_dir))
    )
    q = (
        stream_dedup_ingest(
            stream,
            str(tmp_path / "corpus"),
            str(tmp_path / "pairs"),
            str(tmp_path / "ck"),
            sigs_path=sigs_path,
            band_index_path=bidx_path,
            resplit_check_batches=1,
            resplit_after_misses=2,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    sigs = spark.read.parquet(sigs_path)
    check_signature_layout(sigs, 24, 4)  # re-split happened
    assert check_band_index_layout(
        spark.read.parquet(bidx_path), 24, 4
    ) == 64
    n_corpus = spark.read.parquet(str(tmp_path / "corpus")).count()
    # the soup is fully distinct; the testdata slice carries a handful
    # of planted near-dups that rightly die — the re-split state must
    # cover exactly the survivors
    assert 200 <= n_corpus <= 220
    assert sigs.count() == n_corpus

    # a later batch adopts the new split (no explicit params) and the
    # pinned-split refusal still works: an explicit (12, 3) now fails
    # the layout gate instead of appending mixed-layout rows
    time.sleep(1.1)
    _land_vecs(in_dir, "b4.json", [
        {"doc_id": 3000000, "text": "a fresh and fully distinct doc xyz"}
    ])
    q2 = (
        stream_dedup_ingest(
            spark.readStream.schema("doc_id long, text string").json(
                str(in_dir)),
            str(tmp_path / "corpus"),
            str(tmp_path / "pairs"),
            str(tmp_path / "ck"),
            sigs_path=sigs_path,
            band_index_path=bidx_path,
        )
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(str(tmp_path / "corpus")).count() == n_corpus + 1
    check_signature_layout(spark.read.parquet(sigs_path), 24, 4)


def test_stream_dedup_resplit_requires_sigs_and_local(spark, tmp_path):
    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    stream = spark.readStream.schema("doc_id long, text string").json(
        str(tmp_path)
    )
    with pytest.raises(ValueError, match="requires sigs_path"):
        stream_dedup_ingest(
            stream, str(tmp_path / "c"), str(tmp_path / "p"),
            str(tmp_path / "ck"), resplit_check_batches=4,
        )
    with pytest.raises(ValueError, match="s3a://"):
        stream_dedup_ingest(
            stream, str(tmp_path / "c"), str(tmp_path / "p"),
            str(tmp_path / "ck"), sigs_path="s3a://bucket/sigs",
            resplit_check_batches=4,
        )
