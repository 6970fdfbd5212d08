"""Continuous corpus construction: streaming near-dup ingest.

The end-to-end shape a 100 TB/day pretraining pipeline actually runs:
documents arrive as micro-batches; each batch is near-dup-checked
against the standing corpus AND itself with the incremental MinHash
tier (operators/dedup.py::dedup_minhash_incremental — batch-bands ⋈
all-bands, corpus×corpus never pairs), batch-internal duplicate
clusters collapse to their canonical member, and only the survivors
append to the corpus. Cost per batch scales with the batch's band
collisions, never with corpus².

With ``sigs_path`` set, the ingest also MAINTAINS the corpus's MinHash
state (operators/dedup.py::minhash_signature_table): each batch checks
against the stored signatures instead of re-scanning and re-hashing the
corpus text, and appends its survivors' signatures for the next batch —
per-batch cost becomes |batch| signatures + the probe join, the true
incremental posture.

Composition, not new machinery: incremental LSH (dedup family) +
connected components (graph family) + anti join, wired into Structured
Streaming through ``foreachBatch`` — the sink pattern every other
incremental materialization in this engine uses
(streaming/events.py::continuous_aggregate, stream_upsert_sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _batch_survivors(
    corpus: DataFrame | None,
    batch: DataFrame,
    text_col: str,
    id_col: str,
    corpus_hashed: DataFrame | None = None,
    batch_hashed: DataFrame | None = None,
    corpus_band_index: DataFrame | None = None,
    trust_layout: bool = False,
    **lsh_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """(survivors, pairs) for one micro-batch against the corpus —
    given either as raw documents (``corpus``) or as a stored signature
    table (``corpus_hashed``); None for both means a first batch.

    Drop rule: a batch doc dies if it near-dups ANY corpus doc
    (``new_old`` pair — the corpus copy is canonical by arrival order),
    or if it is a non-canonical member of a batch-internal near-dup
    cluster (``new_new`` pairs -> connected components -> keep each
    cluster's min id). Components, not pairwise greater-id drops: a
    chain a~b, b~c with a<b<c must keep ONLY a, and pairwise rules
    would also kill b's evidence for dropping c on re-ingest.
    """
    from ffi_etl_spark.operators.dedup import (
        dedup_minhash_incremental,
        dedup_minhash_lsh,
    )
    from ffi_etl_spark.operators.graph import connected_components

    if corpus is None and corpus_hashed is None:
        pairs = dedup_minhash_lsh(batch, text_col, id_col, **lsh_kwargs).withColumn(
            "pair_type", F.lit("new_new")
        )
    else:
        pairs = dedup_minhash_incremental(
            corpus,
            batch,
            text_col,
            id_col,
            corpus_hashed=corpus_hashed,
            batch_hashed=batch_hashed,
            corpus_band_index=corpus_band_index,
            trust_layout=trust_layout,
            **lsh_kwargs,
        )
    pairs = pairs.localCheckpoint(eager=True)  # pairs feed 3 consumers + audit

    old_hits = pairs.filter(F.col("pair_type") == "new_old")
    # incremental pairs put the batch id on either side; corpus ids are
    # exactly the non-batch side of a new_old pair
    batch_ids = batch.select(F.col(id_col).alias("_bid")).distinct()
    dead_vs_corpus = (
        old_hits.select(F.col("id_a").alias("_bid"))
        .union(old_hits.select(F.col("id_b").alias("_bid")))
        .join(batch_ids, "_bid", "left_semi")
    )

    new_new = pairs.filter(F.col("pair_type") == "new_new")
    dead_in_batch = (
        connected_components(new_new)
        .filter(F.col("vertex") != F.col("component"))
        .select(F.col("vertex").alias("_bid"))
    )

    dead = dead_vs_corpus.union(dead_in_batch).distinct()
    survivors = batch.join(
        F.broadcast(dead), batch[id_col] == F.col("_bid"), "left_anti"
    )
    return survivors, pairs


def _write_band_index(index_rows: DataFrame, path: str, mode: str) -> None:
    """One file per bucket per write — the shared bucketed-state
    writer (operators/stored_state.py) on ``_bkt``. (This module is
    where the rule was measured: the round-9 first cut appended ~2k
    files/batch and the per-batch read cost grew ~3s/batch from
    parquet footer opens alone.)"""
    from ffi_etl_spark.operators.stored_state import write_bucketed

    write_bucketed(index_rows, path, "_bkt", mode)


# Files a single bucket directory may accumulate before that bucket is
# compacted. Appends add one file per touched bucket per batch, so a
# long-lived trickle stream would otherwise pay one parquet footer per
# historical batch on every read of the bucket.
_COMPACT_FILES_PER_BUCKET = 16

# Stored-signature size past which the ingest auto-enables the band
# index when the caller has not decided (band_index_path=None). The
# measured verdict (INGEST_r9.json, both at sf1 and the sf10 trickle
# addendum) is that the index LOSES at every single-node scale we can
# generate — the candidate-restricted verify leaves only a narrow
# column-pruned band scan that stays cheaper than the index's per-batch
# bookkeeping up through ~500k docs (~hundreds of MB of state). Its
# regime is state large enough that a full per-batch scan is genuinely
# unaffordable (multi-TB state / 1000-executor clusters). 64 GiB is two
# orders of magnitude above the largest state measured still favoring
# the plain scan — an extrapolated floor for "the scan now dominates",
# deliberately conservative because enabling early costs real per-batch
# overhead while enabling late costs only the scan's linear term.
BAND_INDEX_AUTO_STATE_BYTES = 64 * 1024**3

# How often a sink that is still BELOW the auto-enablement threshold
# re-probes the stored state's size (every Nth micro-batch). The probe
# is fs.exists + getContentSummary — the latter is a full recursive
# listing of the ever-growing sigs directory on object stores (S3A),
# so paying it per batch makes the "driver-side metadata only" cost
# grow with state size (ADVICE r09). Enablement is sticky once fired,
# so a positive decision is cached for the sink's lifetime; checking a
# few batches late costs only the scan's linear term the index would
# have amortized, while checking every batch costs a recursive listing
# each time.
AUTO_INDEX_RECHECK_BATCHES = 8


def _hadoop_fs_path(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _auto_band_index(spark, sigs_path: str, threshold_bytes: int) -> str | None:
    """The derived index path iff auto-enablement should engage:
    either an auto-created index already exists (sticky — once the
    layout is materialized, later batches must keep maintaining it or
    it goes stale and every read would heal-by-recompute), or the
    stored signature state's on-disk size has crossed the threshold.
    Driver-side filesystem metadata only — no data scan."""
    auto_path = sigs_path.rstrip("/") + "_band_index"
    fs, idx_hpath = _hadoop_fs_path(spark, auto_path)
    if fs.exists(idx_hpath):
        return auto_path
    _, sigs_hpath = _hadoop_fs_path(spark, sigs_path)
    if fs.getContentSummary(sigs_hpath).getLength() >= threshold_bytes:
        return auto_path
    return None


def _crowded_buckets(index: DataFrame) -> list[int]:
    """Buckets whose directory holds more than the per-bucket file
    threshold — the shared discovery (operators/stored_state.py) on
    ``_bkt``, from the read's own planning-time file listing."""
    from ffi_etl_spark.operators.stored_state import crowded_buckets

    return crowded_buckets(index, "_bkt", _COMPACT_FILES_PER_BUCKET)


def _compact_band_index(spark, band_index: DataFrame, path: str) -> DataFrame:
    """Per-bucket incremental compaction — the shared bucketed-state
    compaction (operators/stored_state.py) on ``_bkt``: only crowded
    buckets are read (partition-pruned) and rewritten as one file
    each, so cost tracks the crowded fraction, not the corpus.
    Returns the (possibly re-read) index frame."""
    from ffi_etl_spark.operators.stored_state import compact_buckets

    crowded = _crowded_buckets(band_index)
    if not compact_buckets(spark, path, "_bkt", crowded):
        return band_index
    return spark.read.parquet(path)


def stream_dedup_ingest(
    docs: DataFrame,
    corpus_path: str,
    pairs_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    sigs_path: str | None = None,
    band_index_path: str | None = None,
    n_band_buckets: int | None = None,
    band_index_auto_bytes: int | None = BAND_INDEX_AUTO_STATE_BYTES,
    resplit_check_batches: int | None = None,
    resplit_after_misses: int = 3,
    resplit_min_batch_docs: int = 64,
    **lsh_kwargs,
):
    """foreachBatch sink: maintain ``corpus_path`` as a near-dup-free
    parquet corpus while ``pairs_path`` accumulates the audit trail of
    every detected pair. Returns the DataStreamWriter (caller picks the
    trigger; ``availableNow`` drains a backlog exactly once).

    ``sigs_path``: where to maintain the corpus MinHash state. When
    set, each batch probes the STORED signatures (no corpus text
    rescan, no corpus signature recompute) and appends its survivors'
    signatures — the ``minhash_signature_table`` production loop. When
    None, each batch recomputes corpus signatures from the corpus
    parquet (simpler, fine for small corpora). Both paths return
    bit-identical pairs (locked by the operator's parity test).

    ``band_index_path`` (requires ``sigs_path``; VERDICT r08 item 1):
    where to maintain the band-bucketed probe index
    (operators/dedup.py::minhash_band_index, written
    ``partitionBy("_bkt")``). Without it, every micro-batch's band join
    reads the FULL stored state — the measured O(corpus) slope
    (BASELINE.md round-8 ingest curve: 7.7→13.2s/batch while the corpus
    grew 9×). With it, each batch computes its own band buckets (a
    bounded ≤``_nbkt``-element list) and reads ONLY those partition
    directories, so the probe join's corpus input tracks the batch's
    bucket coverage; the wide doc-level state is then touched only by
    the candidate-restricted verify. The index is DERIVED state: it
    self-heals by recompute from the signature table whenever its row
    count disagrees (torn append, wiped directory), the same
    count-probe trigger as the signature reconcile. Pairs are
    bit-identical with and without the index (parity-tested) — the
    index changes the plan, never the answer.

    ``band_index_auto_bytes``: when the caller has NOT decided
    (``band_index_path=None``) and signature state is maintained, the
    ingest auto-enables the band index at ``sigs_path + "_band_index"``
    once the stored state's on-disk size crosses this threshold — a
    BYTE threshold because the quantity the index amortizes is the
    per-batch state scan, and that cost is a property of state size,
    not doc count. The default (64 GiB) sits at the extrapolated
    crossover: every single-node scale measured (INGEST_r9.json, incl.
    the 494k-doc sf10 trickle) still favors the plain candidate-
    restricted scan, so auto-enablement must not fire at sandbox
    scales. Once an auto index exists it stays maintained (sticky) —
    abandoning it would leave derived state to rot and force a
    heal-by-recompute on every later read. ``None`` disables the
    automatic entirely; an explicit ``band_index_path`` always wins.

    ``n_band_buckets``: bucket count for a FRESHLY created index (an
    existing index's own ``_nbkt`` always wins — recomputing buckets
    with a different modulus would prune away true candidates).
    Pruning bites when |batch|·bands is small relative to the bucket
    count (the trickle regime: tools/bench_stream_ingest.py
    ``--trickle``); the default 64 suits steady thousands-of-docs
    batches where the index's win is the narrow pre-exploded,
    join-key-partitioned probe side rather than directory pruning.

    Split default (VERDICT r07 item 2): unless num_perm AND bands are
    passed, the first batch probes the available corpus (or itself)
    and every later batch ADOPTS the layout pinned in the stored
    state — an untuned user on a high-ambient corpus gets the
    probe-chosen split (BASELINE.md sf3: 15.5s/batch) instead of the
    measured-bad fixed (12, 3) (34.6s/batch, same true-dup found set).
    The pick is sticky once materialized; re-materialize the state
    with ``minhash_signature_table(corpus)`` to retune a grown corpus.

    ``resplit_check_batches`` (round 11 — the wired remedy for the
    sticky split going STALE; requires ``sigs_path``, ignored when the
    caller pinned num_perm/bands): every Nth batch the incoming
    batch's own distribution is probed (``resolve_minhash_split`` —
    bounded by the batch, the ambient-probe cost class). After
    ``resplit_after_misses`` CONSECUTIVE checks whose pick disagrees
    with the adopted split AND agree with each other (one odd batch
    resets the streak — damping against probe noise on small batches),
    the sink re-materializes the signature state (and the maintained
    band index) under the batch-probed split via
    ``resplit_signature_state`` and swaps both in one commit; this
    batch and every later one adopt the new layout automatically. The
    re-split serves the INCOMING distribution — that is the
    distribution every future batch pays the verify bill against
    (BASELINE.md sf10: 34.6 s/batch at a stale split vs 15.5 s at the
    probe pick, identical found set). Default None keeps the round-10
    behavior: the split stays sticky until a human re-materializes.
    Local filesystem only (the swap's os.rename protocol — validated
    at sink construction).

    Two guards keep the trigger honest (round 12). First, a check
    batch smaller than ``resplit_min_batch_docs`` is SKIPPED — no miss
    counted, no streak reset (ADVICE r11): a replayed batch anti-joins
    to zero rows, and probing it would deterministically "pick" the
    ambient-0 default split, so consecutive replays landing on check
    boundaries could re-materialize the whole state to a split derived
    from no documents; below ~64 docs (≤32 sample pairs) the median is
    probe noise either way. Second, a fired streak must pass a
    CORPUS-side confirm before the swap bill is paid
    (``confirm_resplit_pick`` — the cross-pair ambient probe, VERDICT
    r11 item 4): batch evidence alone never re-materializes an
    undrifted corpus; a failed confirm resets the streak, and the
    accumulating drifted batches flip the confirm on a later streak.
    Note the miss STREAK lives in sink memory (damping is a
    per-lifetime concern): a deployment that restarts the sink every
    batch never accumulates ``resplit_after_misses`` > 1 — run such
    cadences with ``resplit_after_misses=1`` and let the corpus-side
    confirm carry the thrash guard (it is the scale-honest half of
    the check anyway; measured in INGEST_r12_resplit.json).

    Exactly-once posture: foreachBatch is at-least-once — a batch can
    replay after a failure that landed some sinks but not the
    checkpoint. The CORPUS is the primary artifact and is replay-
    idempotent: the batch anti-joins ids already landed there before
    deduping (a replayed survivor is skipped; a replayed non-survivor
    re-dies against the same corpus), which also keeps the incremental
    tier's disjointness precondition satisfied instead of poisoning the
    stream with its ValueError. The SIGNATURE table self-heals: every
    batch first reconciles it against the corpus (signatures are
    recomputed and appended for any corpus doc missing from the state —
    exactly what a crash between the corpus and signature appends
    leaves behind), so a replay repairs rather than compounds. The
    PAIRS audit is replay-idempotent too (round 12): it is partitioned
    by (checkpoint-scoped app id, batch_id) and each batch
    dynamic-partition-overwrites its own directory, so a replayed
    batch REPLACES its rows instead of appending duplicates — a
    fully-landed batch replays as an empty anti-joined frame and never
    reaches the write (its original partition is untouched), while a
    torn batch recomputes the same pairs against the same unadvanced
    corpus and overwrites with identical rows. The app component
    exists because batch ids restart at 0 under a fresh checkpoint
    (streaming/profile.py's txnAppId rule, as a partition key): without
    it a new incarnation's early batches would silently destroy a
    previous incarnation's audit partitions. A transactional table
    format would MERGE all three sinks by key instead.
    """
    from pyspark.errors import AnalysisException

    from ffi_etl_spark.operators.dedup import (
        BAND_INDEX_BUCKETS,
        check_band_index_layout,
        minhash_band_index,
        minhash_signature_table,
    )

    if band_index_path is not None and sigs_path is None:
        raise ValueError(
            "band_index_path requires sigs_path — the band index is a "
            "derived projection of the stored signature table; without "
            "one there is nothing to index or reconcile against"
        )
    if resplit_check_batches is not None:
        if sigs_path is None:
            raise ValueError(
                "resplit_check_batches requires sigs_path — the re-split "
                "remedy re-materializes the STORED signature state; with "
                "no stored state the split is re-probed per restart anyway"
            )
        # the swap protocol is os.rename — fail at construction, not at
        # the first drift event months in (the ann_ingest rule)
        from ffi_etl_spark.streaming.profile import _local_target

        sigs_path = _local_target(sigs_path, "stream_dedup_ingest")
        if band_index_path is not None:
            band_index_path = _local_target(
                band_index_path, "stream_dedup_ingest"
            )

    # probe-tuning knobs are consumed by the split resolution below and
    # must NOT reach dedup_minhash_lsh (review r08: forwarding them made
    # the first batch of a fresh stream die in TypeError, and dropping
    # them from the probe silently ignored a caller's recall contract)
    probe_kwargs = {
        k: lsh_kwargs.pop(k) for k in ("dup_sim", "recall_floor") if k in lsh_kwargs
    }
    # an explicit num_perm=None/bands=None means "use the adaptive
    # default", not "pin the split None" (review r08)
    for k in ("num_perm", "bands"):
        if k in lsh_kwargs and lsh_kwargs[k] is None:
            del lsh_kwargs[k]
    sig_kwargs = {
        k: v
        for k, v in lsh_kwargs.items()
        if k in ("shingle_k", "num_perm", "bands", "fast")
    }

    def _read_or_none(spark, path):
        # first batch: the table does not exist yet. Any OTHER read
        # failure (corrupt footer, permissions, transient FS error)
        # must fail the batch — treating it as "no corpus" would
        # silently re-ingest near-dups of everything already landed.
        try:
            return spark.read.parquet(path)
        except AnalysisException:
            return None

    # sticky probe pick for the no-stored-state mode (review r08): with
    # sigs_path=None there is no layout record, so without this cache
    # every micro-batch would re-probe the growing corpus (a per-batch
    # TakeOrdered + signature job) and the pick could DRIFT between
    # batches, silently mixing bandings in the pairs audit. Cached per
    # sink instance — a process restart re-probes once, which is the
    # stored-state mode's adoption semantics minus the persistence.
    _sticky_pick: dict = {}

    # auto band-index decision cache (ADVICE r09): once enablement
    # fires the index exists and the decision is sticky, so cache the
    # path for the sink's lifetime; while still below threshold,
    # re-probe the state size only every AUTO_INDEX_RECHECK_BATCHES-th
    # batch instead of paying the recursive directory listing per
    # batch. A restart re-probes on its first batch (calls resets with
    # the closure), which is how the sticky fs.exists branch re-adopts
    # an index a previous process created.
    _auto_idx: dict = {"path": None, "calls": 0}

    # re-split drift damping (round 11): consecutive Nth-batch probe
    # picks that disagree with the adopted split and agree with each
    # other; one odd batch resets the streak
    _resplit: dict = {"calls": 0, "misses": 0, "pick": None}

    # pairs-audit overwrite scope (round 12): one checkpoint = one
    # batch-id sequence = one audit lineage. Deterministic across
    # restarts of the SAME checkpoint (that is what makes the replay
    # overwrite land on its own partition).
    import hashlib

    _pairs_app = hashlib.md5(checkpoint.encode()).hexdigest()[:16]

    def _auto_band_index_cached(spark) -> str | None:
        if _auto_idx["path"] is None:
            if _auto_idx["calls"] % AUTO_INDEX_RECHECK_BATCHES == 0:
                _auto_idx["path"] = _auto_band_index(
                    spark, sigs_path, band_index_auto_bytes
                )
            _auto_idx["calls"] += 1
        return _auto_idx["path"]

    def _resolve_split(corpus, corpus_hashed, batch):
        """The effective (num_perm, bands) for this batch (VERDICT r07
        item 2 — the ingest must not silently run the measured-bad
        fixed split): explicit kwargs win; else the STORED state's
        pinned layout is adopted; else the standing corpus (first
        batch: the batch itself) is probed ONCE per sink and the
        chooser picks. The adoption rule makes the split sticky: the
        first batch's pick is pinned into the state — re-materialize
        with minhash_signature_table(corpus) to retune a grown corpus."""
        from ffi_etl_spark.operators.dedup import (
            _require_full_split,
            check_signature_layout,
            resolve_or_adopt_split,
        )

        if "num_perm" in lsh_kwargs or "bands" in lsh_kwargs:
            num_perm = lsh_kwargs.get("num_perm")
            bands = lsh_kwargs.get("bands")
            # a half-specified split must fail with the remedy here,
            # not as a TypeError inside the layout gate's division
            _require_full_split(num_perm, bands)
            if corpus_hashed is not None:
                # fail the batch BEFORE anything would append new-layout
                # rows onto a pre-round-6 or mismatched stored table
                # (VERDICT r06 item 6): stale state must error with the
                # remedy, not accumulate a mixed-layout table
                check_signature_layout(corpus_hashed, num_perm, bands)
            return num_perm, bands
        if corpus_hashed is not None:
            # adopt the stored layout (resolve_or_adopt_split re-runs
            # the structural gate, so a pre-round-6 layout still fails
            # here with the remedy); authoritative over the cache. The
            # caller's EXPLICIT recall knobs ride along so an adopted
            # split that cannot meet them fails with the re-materialize
            # remedy instead of silently degrading (ADVICE r08)
            return resolve_or_adopt_split(None, corpus_hashed, **probe_kwargs)
        if "pick" not in _sticky_pick:
            src = corpus if corpus is not None else batch
            _sticky_pick["pick"] = resolve_or_adopt_split(
                src,
                None,
                text_col,
                id_col,
                shingle_k=lsh_kwargs.get("shingle_k", 5),
                threshold=lsh_kwargs.get("threshold", 0.5),
                **probe_kwargs,
            )
        return _sticky_pick["pick"]

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if resplit_check_batches is not None:
            # batch-start torn-swap recovery (ADVICE r11, the ann sink's
            # rule): a crash mid re-split commit leaves sigs_path
            # renamed aside; without recovery the next batch would see
            # corpus-without-sigs, silently re-probe a sticky split,
            # and "heal" by paying a full corpus recompute while the
            # swap dirs leak. Pure os.path checks when no markers exist.
            # Both band-index candidates are covered — the explicit
            # path and the auto-derived one (whichever the sink
            # maintains is the one a torn swap could have touched).
            from ffi_etl_spark.operators.stored_state import recover_torn_swap

            swap_paths = [sigs_path]
            if band_index_path is not None:
                swap_paths.append(band_index_path)
            elif band_index_auto_bytes is not None:
                swap_paths.append(sigs_path.rstrip("/") + "_band_index")
            recover_torn_swap(swap_paths)
        if not batch_df.take(1):
            return
        batch = batch_df.dropDuplicates([id_col])
        corpus = _read_or_none(spark, corpus_path)
        if corpus is not None:
            batch = batch.join(corpus.select(id_col), id_col, "left_anti")
        batch = batch.localCheckpoint(eager=True)

        # read (and layout-gate) the stored signature state whenever it
        # exists, INDEPENDENT of whether the corpus read succeeded
        # (ADVICE r07: a missing corpus beside an old-layout sigs table
        # must not reach the final append)
        corpus_hashed = (
            _read_or_none(spark, sigs_path) if sigs_path is not None else None
        )
        if corpus_hashed is not None and corpus is None:
            raise ValueError(
                f"signature state exists at {sigs_path} but the corpus at "
                f"{corpus_path} is missing — the stored signatures describe "
                "documents this ingest cannot see, so every future batch "
                "would be deduped against ghosts; restore the corpus or "
                "delete the stale signature table before ingesting"
            )
        num_perm, bands = _resolve_split(corpus, corpus_hashed, batch)

        if (
            resplit_check_batches is not None
            and corpus_hashed is not None
            and corpus is not None
            and "num_perm" not in lsh_kwargs
            and "bands" not in lsh_kwargs
        ):
            from ffi_etl_spark.operators.dedup import (
                confirm_resplit_pick,
                resolve_or_adopt_split,
                resplit_signature_state,
            )

            _resplit["calls"] += 1
            # a too-small check batch is SKIPPED, not scored (ADVICE
            # r11): a replayed batch anti-joins to zero rows and its
            # "probe" would deterministically pick the ambient-0
            # default — counting that as a miss lets consecutive
            # replays trigger a re-materialization derived from no
            # documents, and counting it as a reset lets replay noise
            # mask real drift. The pinned batch's count is one job
            # over checkpointed rows.
            if (
                _resplit["calls"] % resplit_check_batches == 0
                and batch.count() >= resplit_min_batch_docs
            ):
                pick = resolve_or_adopt_split(
                    batch,
                    None,
                    text_col,
                    id_col,
                    shingle_k=lsh_kwargs.get("shingle_k", 5),
                    threshold=lsh_kwargs.get("threshold", 0.5),
                    **probe_kwargs,
                )
                if pick == (num_perm, bands) or (
                    _resplit["pick"] is not None and pick != _resplit["pick"]
                ):
                    _resplit["misses"], _resplit["pick"] = 0, None
                else:
                    _resplit["misses"] += 1
                    _resplit["pick"] = pick
                if _resplit["misses"] >= resplit_after_misses:
                    # corpus-side confirm (VERDICT r11 item 4): the
                    # swap bill is a full corpus pass, and the streak
                    # above is batch evidence only. The cross-pair
                    # probe prices the (batch ⋈ corpus) pairs every
                    # future verify actually pays; when its pick still
                    # agrees with the adopted split the corpus has not
                    # drifted — reset and keep ingesting (drifted
                    # batches accumulate into the corpus, so a real
                    # shift flips this confirm on a later streak).
                    cross_pick = confirm_resplit_pick(
                        corpus,
                        batch,
                        text_col,
                        id_col,
                        shingle_k=lsh_kwargs.get("shingle_k", 5),
                        threshold=lsh_kwargs.get("threshold", 0.5),
                        **probe_kwargs,
                    )
                    if cross_pick == (num_perm, bands):
                        _resplit["misses"], _resplit["pick"] = 0, None
                    else:
                        idx = band_index_path
                        if idx is None and band_index_auto_bytes is not None:
                            # swap a maintained AUTO index too — leaving
                            # it under the old banding would be the
                            # mixed-era state check_band_index_layout
                            # refuses
                            idx = _auto_band_index_cached(spark)
                            if idx is not None and (
                                _read_or_none(spark, idx) is None
                            ):
                                idx = None  # enabled, not yet materialized
                        num_perm, bands = resplit_signature_state(
                            corpus,
                            sigs_path,
                            idx,
                            text_col=text_col,
                            id_col=id_col,
                            shingle_k=lsh_kwargs.get("shingle_k", 5),
                            num_perm=pick[0],
                            bands=pick[1],
                            fast=lsh_kwargs.get("fast", False),
                        )
                        corpus_hashed = spark.read.parquet(sigs_path)
                        _resplit["misses"], _resplit["pick"] = 0, None

        batch_sig_kwargs = dict(sig_kwargs, num_perm=num_perm, bands=bands)
        lsh_split = dict(lsh_kwargs, num_perm=num_perm, bands=bands)

        if sigs_path is not None and corpus is not None:
            # reconcile BEFORE the empty-batch return: a replayed batch
            # whose corpus rows landed but whose signature append was
            # lost arrives here with an empty batch, and this is where
            # its missing state gets repaired. The trigger is a pair of
            # parquet COUNTs (footer metadata, no data scan) — the
            # id-level anti-join only runs when the counts disagree, so
            # a healthy steady-state batch never pays a corpus scan.
            n_sigs = corpus_hashed.count() if corpus_hashed is not None else 0
            if corpus.count() != n_sigs:
                missing = (
                    corpus.join(corpus_hashed.select(id_col), id_col, "left_anti")
                    if corpus_hashed is not None
                    else corpus
                )
                minhash_signature_table(
                    missing, text_col, id_col, **batch_sig_kwargs
                ).write.mode("append").parquet(sigs_path)
                corpus_hashed = spark.read.parquet(sigs_path)
                n_sigs = corpus_hashed.count()

        idx_path = band_index_path
        if (
            idx_path is None
            and band_index_auto_bytes is not None
            and sigs_path is not None
            and corpus_hashed is not None
        ):
            idx_path = _auto_band_index_cached(spark)

        band_index = None
        n_bkt = BAND_INDEX_BUCKETS if n_band_buckets is None else n_band_buckets
        if idx_path is not None:
            band_index = _read_or_none(spark, idx_path)
            if band_index is not None and corpus_hashed is None:
                raise ValueError(
                    f"band index exists at {idx_path} but the "
                    f"signature state at {sigs_path} is missing — the "
                    "index describes state this ingest cannot see; "
                    "restore the signature table or delete the stale "
                    "index before ingesting"
                )
            if corpus_hashed is not None:
                # the index is DERIVED state: reconcile by the same
                # count-probe rule as the signature table (footer
                # metadata only on the healthy path), heal by full
                # recompute — it is one narrow projection of the state,
                # and torn appends are rare enough that an id-level
                # anti-join would optimize the wrong case. Healthy
                # batches instead run per-bucket COMPACTION: append-only
                # writes add one file per touched bucket per batch, and
                # a thousand-batch index would pay a thousand parquet
                # footers per bucket read — buckets past
                # _COMPACT_FILES_PER_BUCKET files are read (pruned),
                # pinned, and dynamic-partition-overwritten back as one
                # file each; untouched buckets are never read.
                if band_index is not None:
                    try:
                        # identity gate (VERDICT r10 item 3): an index
                        # built under a different split (or a pre-stamp
                        # layout) is derived state here — heal by
                        # recompute, the same rule as the count probe.
                        # dedup_minhash_incremental REFUSES instead for
                        # user-passed indexes; this sink owns its own.
                        n_bkt = check_band_index_layout(
                            band_index, num_perm, bands
                        )
                    except ValueError:
                        band_index = None
                if band_index is None or band_index.count() != n_sigs * bands:
                    _write_band_index(
                        minhash_band_index(corpus_hashed, id_col, n_bkt),
                        idx_path,
                        "overwrite",
                    )
                    band_index = spark.read.parquet(idx_path)
                else:
                    band_index = _compact_band_index(
                        spark, band_index, idx_path
                    )

        if not batch.take(1):
            return
        batch_hashed = None
        pruned_index = None
        if sigs_path is not None and corpus_hashed is not None:
            corpus_for_dedup = None
            # one shingle+signature pass per batch: these rows feed the
            # incremental dedup AND the state append below
            from ffi_etl_spark.operators.dedup import _pin

            batch_hashed = _pin(
                minhash_signature_table(batch, text_col, id_col, **batch_sig_kwargs)
            )
            if band_index is not None:
                # the batch's bucket list is bounded by the index's own
                # _nbkt (≤64 by default) — a collectable constant, not
                # a data-scale collect. Filtering on the PARTITION
                # column prunes the read to those directories: the
                # probe join's corpus input now tracks the batch's
                # bucket coverage, not the corpus (VERDICT r08 item 1).
                bkts = [
                    r["_bkt"]
                    for r in minhash_band_index(batch_hashed, id_col, n_bkt)
                    .select("_bkt")
                    .distinct()
                    .collect()
                ]
                pruned_index = band_index.filter(F.col("_bkt").isin(bkts))
        else:
            corpus_for_dedup = corpus
        survivors, pairs = _batch_survivors(
            corpus_for_dedup,
            batch,
            text_col,
            id_col,
            corpus_hashed=corpus_hashed,
            batch_hashed=batch_hashed,
            corpus_band_index=pruned_index,
            # every stored frame above was layout-gated (or just built)
            # by this function — re-gating in the operator would re-run
            # 2-3 one-row probe jobs per micro-batch (ADVICE r08)
            trust_layout=True,
            **lsh_split,
        )
        survivors = survivors.localCheckpoint(eager=True)  # feeds 2-3 sinks
        # the audit rows carry the split that produced them (ADVICE r08:
        # with sigs_path=None the sticky pick dies with the process, so
        # a restart's re-probe could silently switch bandings mid-stream
        # — the stamp makes any regime mix detectable on read).
        # Exactly-once (round 12, VERDICT r11 item 2): the audit is
        # PARTITIONED by (_ingest_app, batch_id) and each batch
        # dynamic-partition-overwrites ITS OWN directory — a replayed
        # batch replaces its previous rows instead of appending
        # duplicates (the streaming/summaries.py per-batch-directory
        # protocol; Delta's replaceWhere is the transactional-format
        # counterpart). The app component is profile.py's txnAppId rule
        # as a partition key: batch ids RESTART at 0 under a fresh
        # checkpoint, so batch_id alone would let a new incarnation's
        # batch 0 silently destroy a previous incarnation's audit rows
        # — scoped by the checkpoint-derived app id, replays within one
        # lineage overwrite themselves and a fresh lineage appends
        # beside history. The repartition keeps it to one file per
        # batch (stored_state.py's write-repartitioned rule).
        (
            pairs.withColumn("num_perm", F.lit(num_perm))
            .withColumn("bands", F.lit(bands))
            .withColumn("_ingest_app", F.lit(_pairs_app))
            .withColumn("batch_id", F.lit(batch_id))
            .repartition("batch_id")
            .write.partitionBy("_ingest_app", "batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(pairs_path)
        )
        survivors.write.mode("append").parquet(corpus_path)
        if sigs_path is not None:
            if batch_hashed is not None:
                new_state = batch_hashed.join(
                    survivors.select(id_col), id_col, "left_semi"
                )
            else:
                new_state = minhash_signature_table(
                    survivors, text_col, id_col, **batch_sig_kwargs
                )
            if idx_path is not None:
                # both writes derive from the pinned batch signatures;
                # a crash between them leaves a count mismatch the next
                # batch's reconcile heals by recompute
                new_state = new_state.localCheckpoint(eager=True)
            new_state.write.mode("append").parquet(sigs_path)
            if idx_path is not None:
                _write_band_index(
                    minhash_band_index(new_state, id_col, n_bkt),
                    idx_path,
                    "append",
                )

    return docs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
