"""Deduplication operators for document-scale corpora.

Four tiers, in increasing recall / cost:

  * exact      — md5 content hash, group-by, keep min id. One shuffle on
                 a uniform hash key; the canonical pattern at any scale.
  * minhash    — shingle → MinHash signature → LSH band join → exact
                 Jaccard verify on candidates. The band join is the only
                 shuffle; candidates ≪ n², so the verify is cheap.
  * simhash    — 60-bit fingerprint; Hamming-adjacent pairs found by
                 4-chunk banding (a ≤3-bit-different pair shares ≥1 of 4
                 15-bit chunks by pigeonhole).
  * ngram-jaccard — word-3-gram sets with exact Jaccard on LSH-banded
                 candidates (higher precision than char shingles for
                 whitespace-y text).

All hash math is md5-derived (functions/hashing.py) so every tier is
DuckDB-oracle checkable. At 100 TB: signatures are computed in the scan
stage (narrow), band keys are salted-uniform by construction, and the
self-join's skew (hot buckets = boilerplate docs) is handled by AQE
skew-join splitting; candidate pairs are deduplicated BEFORE the verify
so pathological buckets don't quadratically explode the verify stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark import StorageLevel

from ffi_etl_spark.functions.hashing import (
    band_keys,
    jaccard_with_sizes,
    md5_int32,
    md5_int60,
    simhash64,
)


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Spread rows across the session's shuffle parallelism before the
    (CPU-heavy, narrow) signature computation. Document corpora often
    arrive as few large files; without this every md5 shingle of a
    partition-worth of docs lands on one core."""
    return df.repartition(F.col(id_col))


def _pin(df: DataFrame) -> DataFrame:
    """Materialize the signature table once. It feeds BOTH sides of the
    band self-join and both verify lookups — without persist, Spark
    recomputes the shingle/minhash subtree four times. Signatures are
    O(n) and columnar; memory-and-disk keeps the 100 TB posture safe."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-content groups: content hash -> canonical (min) id + count.
    Returns one row per distinct content with n_copies."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _verify_join(
    pairs: DataFrame,
    sets: DataFrame,
    id_col: str,
    broadcast_verify: bool,
) -> DataFrame:
    """Attach both documents' hash sets to each candidate pair.

    The candidate list is long (every band collision) but each row is
    two ids; the hash-set table is short (one row per doc) but wide
    (hundreds of shingle hashes). Shuffling the wide side once per pair
    is the dominant cost of the whole operator — with ambient-similar
    corpora the pair list is 100x the doc count, so the shuffle moves
    ~pairs x 2 x set_width longs. Broadcasting the slim per-doc set
    table instead makes the verify a map-side double lookup (measured
    2.5x end-to-end at sf0.1: 8.1s -> 3.0s). At 100 TB the per-doc set
    table no longer fits the driver: pass broadcast_verify=False to
    fall back to the shuffle join (AQE still picks broadcast per
    sub-partition where stats allow).

    Set sizes ride along (``_na``/``_nb``) so the similarity can be
    computed from the intersection alone (inclusion-exclusion) instead
    of intersect + union.

    Both lookups broadcast the SAME aliased frame and rename via the
    post-join projection (optimization round 12): the old
    rename-before-broadcast built two broadcast relations whose plans
    differed only in output aliases, paying an extra per-row Project
    of the wide ``_hashes`` column into each build — the alias form
    measured ~8-10% faster on the verify stage at sf0.1 (interleaved
    A/B, result parity asserted) with identical rows out."""
    sized = sets.withColumn("_n", F.size("_hashes"))
    a, b = sized.alias("_va"), sized.alias("_vb")
    if broadcast_verify:
        a, b = F.broadcast(a), F.broadcast(b)
    return (
        pairs.join(a, F.col("id_a") == F.col(f"_va.{id_col}"))
        .join(b, F.col("id_b") == F.col(f"_vb.{id_col}"))
        .select(
            pairs["*"],
            F.col("_va._hashes").alias("_ha"),
            F.col("_va._n").alias("_na"),
            F.col("_vb._hashes").alias("_hb"),
            F.col("_vb._n").alias("_nb"),
        )
    )


def size_bound_filter(threshold: float):
    """Exact-result-preserving length prefilter for the verify stage
    (the size condition from the set-similarity-join literature, e.g.
    PPJoin's length filter): J(A,B) = |A∩B| / |A∪B| <= min/max, so any
    pair with ``min(|A|,|B|)/max(|A|,|B|) < t`` cannot reach the
    threshold and its (expensive, set-width) intersection is skipped.
    Placed BETWEEN _verify_join and the jaccard projection, it drops
    rows before the intersect evaluates (~14% of candidates on this
    corpus's narrow size distribution; far more on real corpora, where
    document lengths are heavy-tailed).

    Stated as the DIVISION ``min/max >= t``, never the multiplication
    ``min >= t*max``: correctly-rounded division is monotone over the
    real ordering J <= min/max, so ``J_fp >= t`` implies
    ``(min/max)_fp >= t`` and no threshold-boundary pair can be
    dropped — whereas ``t*max`` can round UP past an integer min (e.g.
    t=0.55, sizes 55/100: 0.55*100 = 55.000000000000007 > 55 would
    drop an exact J = 0.55 pair)."""
    return (
        F.least(F.col("_na"), F.col("_nb")).cast("double")
        / F.greatest(F.col("_na"), F.col("_nb"))
        >= F.lit(threshold)
    )


def _candidate_pairs(with_bands: DataFrame, id_col: str) -> DataFrame:
    """Self-join rows that share any (band_idx, band_key); distinct pairs.

    Both sides derive from the same frame, so the band columns carry
    identical attribute IDs; plan-level aliases + qualified refs make
    every predicate provably cross-frame (an unqualified ``_band_key ==
    _band_key`` logs a "trivially true equals predicate" WARN and leans
    on Spark's self-join disambiguation heuristics)."""
    bands = with_bands.select(
        F.col(id_col).alias("_id"),
        F.posexplode("_bands").alias("_band_idx", "_band_key"),
    )
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l._band_idx") == F.col("r._band_idx"))
            & (F.col("l._band_key") == F.col("r._band_key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )


def _sig_aggs(num_perm: int) -> list:
    """MinHash as AGGREGATES over exploded hash rows: the p-th slot is
    min(perm_p(_h)) — min over the row multiset equals min over the
    distinct set, so this matches functions/hashing.py::minhash_signature
    exactly while every permutation runs as codegen'd row arithmetic +
    a codegen min aggregate instead of an interpreted array-lambda pass
    per permutation."""
    from ffi_etl_spark.functions.hashing import MINHASH_PRIME

    aggs = []
    for p in range(num_perm):
        a, b = 2 * p + 1, 7919 * p + 13
        aggs.append(
            F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(
                f"_m{p}"
            )
        )
    return aggs


def _shingle_sets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    fast: bool,
    num_perm: int = 0,
    with_hashes: bool = True,
) -> DataFrame:
    """(id, _hashes[, _sig]) — distinct shingle-hash set (and, when
    ``num_perm`` > 0, the MinHash signature) per doc, computed the
    codegen way: explode the shingle positions to ROWS, hash each with
    the row-wise builtin (md5+conv or xxhash64 — both whole-stage
    codegen), then ONE aggregation per doc computing collect_set AND
    the ``num_perm`` signature mins together. The groupBy key equals
    the ``_spread`` repartition key, so Catalyst reuses the
    partitioning and NO extra shuffle happens — and no interpreted
    array-lambda dispatch remains anywhere in the signature path (the
    original formulation ran ``transform(char_shingles(...))`` plus one
    ``array_min(transform(...))`` pass per permutation)."""
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.length(text_col) - F.lit(k - 1), F.lit(1)))
    ).alias("_i")
    shingle = F.substring(F.col(text_col), F.col("_i"), F.lit(k))
    h = F.xxhash64(shingle) if fast else md5_int32(shingle)
    # with_hashes=False drops the exact-verify collect_set — the
    # set-building accumulator — for signature-only consumers (the
    # ambient probes sample-pair signatures and never verify, so the
    # ~0.5M set inserts per probe were pure waste — guide §1.2 "don't
    # compute things you throw away"; measured ~10% off the probe's
    # wall at sf0.1, growing with sample_docs since the probe's other
    # stages are fixed K-row overhead).
    set_aggs = [F.collect_set("_h").alias("_hashes")] if with_hashes else []
    grouped = (
        _spread(df, id_col)
        .select(F.col(id_col), F.col(text_col), pos)
        .select(F.col(id_col), h.alias("_h"))
        .groupBy(id_col)
        .agg(*set_aggs, *_sig_aggs(num_perm))
    )
    if num_perm:
        grouped = grouped.select(
            id_col,
            *(["_hashes"] if with_hashes else []),
            F.array(*[F.col(f"_m{p}") for p in range(num_perm)]).alias("_sig"),
        )
    return grouped


def dedup_minhash_lsh(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_perm: int = 12,
    bands: int = 3,
    threshold: float = 0.5,
    fast: bool = False,
    broadcast_verify: bool = True,
) -> DataFrame:
    """Near-dup pairs: MinHash-LSH candidates verified with exact Jaccard
    on the char-shingle hash sets. rows-per-band = num_perm // bands.
    ``fast=True`` swaps md5 shingle hashing for native xxhash64 — same
    algorithm, engine-private hashes (no DuckDB oracle), ~2-4x cheaper
    signatures; the production default at 100 TB.

    Choosing (num_perm, bands) for a different threshold or corpus:
    functions/lsh_tuning.py::tune_bands picks the split that minimizes
    S-curve error at the verify threshold; raise its fp_weight on
    high-ambient-similarity corpora, where candidate count — not
    signature cost — dominates the bill. The default (bands=3, rows=4)
    is tune_bands(12, 0.5, fp_weight=5), picked from measurement: the
    testdata corpus's true near-dups sit at jaccard ≥0.9 (template
    clones) where b=3/r=4 keeps ≥96% recall, while its ~0.35 ambient
    similarity made b=4/r=3 emit 783k candidate pairs per 5k docs —
    ~4x the verify bill for the same found set."""
    rows = num_perm // bands
    hashed = _shingle_sets(df, text_col, id_col, shingle_k, fast, num_perm)
    hashed = _pin(hashed.withColumn("_bands", band_keys(F.col("_sig"), bands, rows)))
    pairs = _candidate_pairs(hashed, id_col)
    sets = hashed.select(F.col(id_col), F.col("_hashes"))
    verified = (
        _verify_join(pairs, sets, id_col, broadcast_verify)
        .filter(size_bound_filter(threshold))
        .withColumn(
            "jaccard_sim",
            jaccard_with_sizes(F.col("_ha"), F.col("_hb"), F.col("_na"), F.col("_nb")),
        )
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )
    return verified


def estimate_ambient_jaccard(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    sample_docs: int = 256,
    probe_perm: int = 32,
) -> float:
    """Median MinHash-estimated Jaccard over ~``sample_docs`` random
    document pairs — the "how similar are two UNRELATED docs in this
    corpus" probe that sizes the LSH banding (see
    ``choose_minhash_split``).

    Deterministic and cheap at any scale: docs are ranked by
    xxhash64(id) with orderBy+limit — Spark plans that as
    TakeOrderedAndProject (per-partition top-K + driver merge of K-row
    heads, never a full sort), so at 100 TB the probe reads one
    column-pruned pass and keeps ``sample_docs`` rows. Hash-adjacent
    docs are then paired (hash order ≡ random pairing) and each pair's
    similarity is estimated as the fraction of matching signature
    slots; the MEDIAN over pairs is returned so the ~1% of sampled
    pairs that happen to be true near-dups cannot drag the estimate —
    exactly the robustness argument of ``salted_join_adaptive``'s
    probe (olap.py), applied to similarity instead of key skew."""
    est = _ambient_pair_estimates(
        df, text_col, id_col, shingle_k, sample_docs, probe_perm
    )
    row = est.agg(F.expr("percentile(_est, 0.5)").alias("_m")).collect()[0]
    return float(row["_m"] or 0.0)


def _ambient_pair_estimates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int,
    sample_docs: int,
    probe_perm: int,
) -> DataFrame:
    """The per-pair MinHash similarity estimates behind
    ``estimate_ambient_jaccard`` — split out so a caller that also needs
    another K-row statistic in the same breath (``resolve_minhash_split``
    wants the corpus count) can fuse both into ONE driver action instead
    of paying a second job's scheduling round-trip."""
    ranked = (
        df.select(F.col(id_col), F.col(text_col))
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(sample_docs)
    )
    sigs = _shingle_sets(
        ranked, text_col, id_col, shingle_k, True, probe_perm, with_hashes=False
    ).select(F.col(id_col), F.col("_sig"))
    from pyspark.sql import Window

    # K sampled rows only — the single-partition window is the point
    w = Window.orderBy(F.xxhash64(F.col(id_col).cast("string")))
    paired = sigs.withColumn("_sig2", F.lead("_sig").over(w)).filter(
        F.col("_sig2").isNotNull()
    )
    return paired.select(
        (
            F.aggregate(
                F.zip_with(
                    "_sig", "_sig2", lambda x, y: (x == y).cast("int")
                ),
                F.lit(0),
                lambda acc, v: acc + v,
            ).cast("double")
            / F.lit(probe_perm)
        ).alias("_est")
    )


def estimate_cross_ambient_jaccard(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    sample_docs: int = 256,
    probe_perm: int = 32,
    quantile: float = 0.75,
) -> float:
    """Ambient similarity of CROSS pairs — one sampled corpus doc
    paired with one sampled batch doc — the distribution the
    incremental tier's verify bill actually prices: per-batch
    candidates are batch-bands ⋈ corpus-bands collisions, so the
    similarity of a random (batch doc, corpus doc) pair is what the
    banding must bound, not the similarity WITHIN either side
    (``estimate_ambient_jaccard``'s question).

    Built from the same machinery: a deterministic xxhash64-ranked
    ``sample_docs/2``-doc sample of EACH side (TakeOrderedAndProject —
    one column-pruned pass per side at any scale), probe signatures at
    ``probe_perm`` slots, and the i-th corpus doc paired with the i-th
    batch doc (hash rank ≡ random pairing across sides).

    Returns the ``quantile``-th percentile (default p75), NOT the
    median: the caller (the streaming re-split's corpus-confirm,
    VERDICT r11 item 4) asks whether the incoming distribution has
    meaningful MASS in future pairings, and P(collide | s) is convex
    in s, so the verify bill is dominated by the upper tail — a
    drifted subpopulation at ≥ (1 - quantile) pair mass sets the
    statistic, while the median only moves once drifted docs are the
    majority partner, long after the bill started growing. The
    estimates are K driver-bounded rows; both quantiles cost the same
    one collect."""
    est = _cross_pair_estimates(
        corpus, batch, text_col, id_col, shingle_k, sample_docs, probe_perm
    )
    row = est.agg(F.expr(f"percentile(_est, {quantile})").alias("_m")).collect()[0]
    return float(row["_m"] or 0.0)


def _cross_pair_estimates(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int,
    sample_docs: int,
    probe_perm: int,
) -> DataFrame:
    """The per-pair cross estimates behind
    ``estimate_cross_ambient_jaccard`` — split out (like
    ``_ambient_pair_estimates``) so ``confirm_resplit_pick`` can fuse
    the percentile with its corpus count into one driver action."""
    half = max(2, sample_docs // 2)

    def _side(df: DataFrame, alias: str) -> DataFrame:
        ranked = (
            df.select(F.col(id_col), F.col(text_col))
            .orderBy(F.xxhash64(F.col(id_col).cast("string")))
            .limit(half)
        )
        sigs = _shingle_sets(
            ranked, text_col, id_col, shingle_k, True, probe_perm, with_hashes=False
        ).select(F.col(id_col), F.col("_sig"))
        from pyspark.sql import Window

        # K sampled rows only — the single-partition window is the point
        w = Window.orderBy(F.xxhash64(F.col(id_col).cast("string")))
        return sigs.withColumn("_rk", F.row_number().over(w)).select(
            "_rk", F.col("_sig").alias(alias)
        )

    paired = _side(corpus, "_sa").join(_side(batch, "_sb"), "_rk")
    return paired.select(
        (
            F.aggregate(
                F.zip_with("_sa", "_sb", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            ).cast("double")
            / F.lit(probe_perm)
        ).alias("_est")
    )


def confirm_resplit_pick(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
    dup_sim: float = 0.9,
    recall_floor: float = 0.95,
    sample_docs: int = 256,
) -> tuple[int, int]:
    """The corpus-side CONFIRM for a batch-evidenced re-split (VERDICT
    r11 item 4): the split the chooser picks for the measured
    cross-pair (batch ⋈ corpus) ambient. The streaming trigger pays
    the full-corpus re-materialization only when this pick DISAGREES
    with the adopted split — batch-internal drift alone (a few odd
    batches over an undrifted corpus) prices the cross pairs at the
    corpus's old ambient and returns the adopted split, so the swap
    bill is never paid on batch evidence alone; as drifted batches
    accumulate INTO the corpus their cross-pair mass grows and a later
    streak confirms. Bounded: two ``sample_docs/2``-doc probes plus a
    column-pruned corpus count, all fused into ONE driver action (the
    ``resolve_minhash_split`` tagged-union idiom, round 13)."""
    from ffi_etl_spark.functions.lsh_tuning import choose_minhash_split

    est = _cross_pair_estimates(
        corpus, batch, text_col, id_col, shingle_k, sample_docs, probe_perm=32
    )
    # p75, NOT the median — see estimate_cross_ambient_jaccard
    amb_row = est.agg(F.expr("percentile(_est, 0.75)").alias("_v")).select(
        F.lit(0).alias("_k"), F.col("_v")
    )
    cnt_row = corpus.agg(F.count(F.lit(1)).cast("double").alias("_v")).select(
        F.lit(1).alias("_k"), F.col("_v")
    )
    stats = {r["_k"]: r["_v"] for r in amb_row.unionByName(cnt_row).collect()}
    cross = float(stats[0] or 0.0)
    n_docs = int(stats[1])
    kwargs: dict = {"n_docs": n_docs}
    if n_docs >= WIDE_CORPUS_DOCS:
        kwargs["num_perms"] = WIDE_NUM_PERMS
    num_perm, bands, _rows = choose_minhash_split(
        cross, threshold, dup_sim=dup_sim, recall_floor=recall_floor, **kwargs
    )
    return num_perm, bands


def dedup_minhash_adaptive(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
    dup_sim: float = 0.9,
    recall_floor: float = 0.95,
    fast: bool = True,
    broadcast_verify: bool = True,
    sample_docs: int = 256,
) -> DataFrame:
    """Self-tuning ``dedup_minhash_lsh``: probe the corpus's ambient
    shingle similarity (``estimate_ambient_jaccard``), pick the
    signature width and band split with ``choose_minhash_split``, run
    the standard banded LSH + exact-Jaccard verify with it.

    Why: BASELINE.md §scaling measured the failure mode this closes —
    on a high-ambient corpus the default split's candidate list grows
    ~n² × P(collide | ambient) and the verify join becomes THE cost at
    scale (7.68M band candidates at synthetic sf1 vs 631k for the
    tuned split, 21.8× vs 1.4× wall-clock scaling 0.1→1). On a normal
    corpus (ambient ≈ 0) the probe keeps the cheaper default
    signature, so uniform inputs never pay the wider-signature tax —
    the same probe-then-branch shape as ``salted_join_adaptive``.

    Contract: returns verified pairs with exact Jaccard ≥ ``threshold``
    among LSH candidates, like every minhash tier here; the adaptive
    split preserves S-curve recall ≥ ``recall_floor`` at ``dup_sim``
    and trades recall in the (threshold, dup_sim) band for bounded
    verify cost. Engine-seeded xxhash64 probe ⇒ reproducible within an
    engine; no cross-engine oracle for the probe itself (fast-tier
    hashes are engine-private) — correctness of the OUTPUT contract is
    gated through the md5 tier's oracle, which shares every stage but
    the hash function."""
    num_perm, bands = resolve_minhash_split(
        df,
        text_col,
        id_col,
        shingle_k,
        threshold=threshold,
        dup_sim=dup_sim,
        recall_floor=recall_floor,
        sample_docs=sample_docs,
    )
    return dedup_minhash_lsh(
        df,
        text_col,
        id_col,
        shingle_k,
        num_perm=num_perm,
        bands=bands,
        threshold=threshold,
        fast=fast,
        broadcast_verify=broadcast_verify,
    )


# Corpus size past which the probe offers WIDER signatures to the
# chooser (round-9 ladder finding, BASELINE.md §sf10): with a fixed
# split, ambient band candidates grow ~n²·P(collide | ambient) while
# signature cost grows ~n·num_perm — measured at synthetic sf10
# (494k docs, ambient 0.22) the (24,4,6) split's candidates hit 65M
# (11× sf3, exactly (10/3)²) and the verify bill made the tier scale
# 6.7× for 3.3× data. The crossover where the quadratic term passes
# the linear one at that ambient is n ≈ 1.4e5 docs (sig ≈ 1.4e-6
# s/doc·slot vs verify ≈ 2.2e-6 s/candidate, both measured); above it
# a wider signature buys sharper rows-per-band (0.22⁸ vs 0.22⁶) at
# linear cost. Below it the wide menu would only tax small corpora.
WIDE_CORPUS_DOCS = 150_000
WIDE_NUM_PERMS = (24, 36, 48, 64)


def resolve_minhash_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
    dup_sim: float = 0.9,
    recall_floor: float = 0.95,
    sample_docs: int = 256,
) -> tuple[int, int]:
    """The one probe-then-choose step every adaptive tier shares:
    estimate the corpus's ambient shingle similarity from a
    deterministic ``sample_docs`` sample, pick the (num_perm, bands)
    split with ``choose_minhash_split``. On a normal low-ambient corpus
    this returns the cheap default split; on a high-ambient corpus it
    returns the split that bounds the verify bill subject to recall ≥
    ``recall_floor`` at ``dup_sim`` (BASELINE.md §scaling: 21.8× → 1.8×
    wall-clock scaling for 10× data on the measured-bad corpus).

    Wired as the DEFAULT for ``dedup_minhash_adaptive``,
    ``minhash_signature_table``, ``dedup_minhash_incremental`` and the
    streaming ingest (VERDICT r07 item 2): a user who does not hand-tune
    gets the probe's pick, not the measured-bad fixed split.

    Scale-aware menu (round 9): past ``WIDE_CORPUS_DOCS`` the offered
    signature widths extend to 48/64 slots — the chooser's
    min-ambient-collision objective then buys rows-per-band the narrow
    menu cannot express (e.g. (48, 6, 8) ≈ 14× fewer ambient candidates
    than (24, 4, 6) at ambient 0.22, for 2× the linear signature cost —
    the right trade exactly when candidates grow n² past the crossover;
    see the constant's derivation above). Below the threshold the menu
    is unchanged, so small-corpus picks — including every gate SF's
    pinned (24, 4) — are bit-identical to round 8.

    One driver action (optimization round 13, VERDICT r12 item 3): the
    ambient percentile and the corpus count collect TOGETHER as a tagged
    2-row union — the count's column-pruned scan stage is unchanged, but
    the probe no longer pays a second job's scheduling round-trip (the
    values are bit-identical: the count is exact in a double far past
    any driver-held corpus, and the percentile expression is untouched)."""
    est = _ambient_pair_estimates(
        df, text_col, id_col, shingle_k, sample_docs, probe_perm=32
    )
    amb_row = est.agg(F.expr("percentile(_est, 0.5)").alias("_v")).select(
        F.lit(0).alias("_k"), F.col("_v")
    )
    cnt_row = df.agg(F.count(F.lit(1)).cast("double").alias("_v")).select(
        F.lit(1).alias("_k"), F.col("_v")
    )
    stats = {r["_k"]: r["_v"] for r in amb_row.unionByName(cnt_row).collect()}
    ambient = float(stats[0] or 0.0)
    n_docs = int(stats[1])
    from ffi_etl_spark.functions.lsh_tuning import choose_minhash_split

    kwargs: dict = {"n_docs": n_docs}
    if n_docs >= WIDE_CORPUS_DOCS:
        kwargs["num_perms"] = WIDE_NUM_PERMS
    num_perm, bands, _rows = choose_minhash_split(
        ambient, threshold, dup_sim=dup_sim, recall_floor=recall_floor, **kwargs
    )
    return num_perm, bands


def _require_full_split(num_perm: int | None, bands: int | None) -> None:
    if (num_perm is None) != (bands is None):
        raise ValueError(
            "pass BOTH num_perm and bands (a pinned split), or NEITHER "
            "(the adaptive default probes the corpus / adopts the stored "
            "signature layout) — a half-specified split is ambiguous"
        )


def resolve_or_adopt_split(
    corpus: DataFrame | None,
    corpus_hashed: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
    dup_sim: float | None = None,
    recall_floor: float | None = None,
) -> tuple[int, int]:
    """The one default-split cascade every adaptive consumer shares
    (review r08: the incremental operator and the streaming ingest had
    forked copies that drifted on tuning knobs): a stored signature
    table PINS the split — adopt it (``infer_signature_layout``, which
    also re-runs the structural layout gate, so a pre-round-6 table
    fails here with the remedy); otherwise probe the standing corpus
    (or whatever frame the caller designates) and let the chooser pick.
    Exactly one of ``corpus`` / ``corpus_hashed`` must be non-None
    (enforced — ADVICE r08: passing both silently ignored ``corpus``).

    ``dup_sim`` / ``recall_floor`` default to the family's (0.9, 0.95)
    when probing. Passing them EXPLICITLY states a recall contract, and
    an adopted split is validated against it (ADVICE r08): a caller
    demanding recall_floor=0.99 from state pinned at a split whose
    S-curve cannot meet it gets a ValueError naming the re-materialize
    remedy, not silent degradation."""
    if (corpus is None) == (corpus_hashed is None):
        raise ValueError(
            "resolve_or_adopt_split: pass exactly one of corpus (probe "
            "it) or corpus_hashed (adopt its pinned layout) — passing "
            "both would silently ignore corpus; neither is ambiguous"
        )
    if corpus_hashed is not None:
        num_perm, bands = infer_signature_layout(corpus_hashed)
        _validate_adopted_recall(num_perm, bands, dup_sim, recall_floor)
        return num_perm, bands
    return resolve_minhash_split(
        corpus,
        text_col,
        id_col,
        shingle_k,
        threshold,
        0.9 if dup_sim is None else dup_sim,
        0.95 if recall_floor is None else recall_floor,
    )


def _validate_adopted_recall(
    num_perm: int,
    bands: int,
    dup_sim: float | None,
    recall_floor: float | None,
) -> None:
    """When a stored layout is ADOPTED but the caller explicitly stated
    a recall contract, check the pinned split's S-curve actually meets
    it (ADVICE r08). Skipped entirely when neither knob was supplied —
    adoption of a probe-chosen split needs no re-check (the probe
    already enforced the default floor when the state was built)."""
    if dup_sim is None and recall_floor is None:
        return
    from ffi_etl_spark.functions.lsh_tuning import candidate_probability

    ds = 0.9 if dup_sim is None else dup_sim
    rf = 0.95 if recall_floor is None else recall_floor
    got = candidate_probability(ds, bands, num_perm // bands)
    if got < rf:
        raise ValueError(
            f"stored signature state pins split (num_perm={num_perm}, "
            f"bands={bands}), whose S-curve recall at dup_sim={ds} is "
            f"{got:.4f} — below the explicitly requested recall_floor="
            f"{rf}. Re-materialize the state with minhash_signature_table"
            f"(corpus, dup_sim={ds}, recall_floor={rf}) to retune, or "
            "drop the explicit knobs to accept the pinned split"
        )


def _check_signature_structure(stored: DataFrame) -> int:
    """Structural half of the layout gate (schema only, no data touch):
    required columns, post-round-6 struct band keys, bigint signatures.
    Returns the rows-per-band the ``_bands`` struct pins."""
    from pyspark.sql.types import ArrayType, LongType, StructType

    names = set(stored.columns)
    missing = {"_hashes", "_sig", "_bands"} - names
    if missing:
        raise ValueError(
            f"stored signature table is missing column(s) {sorted(missing)} — "
            "not a minhash_signature_table output; regenerate the state with "
            "minhash_signature_table(corpus, ...)"
        )
    bt = stored.schema["_bands"].dataType
    elem = bt.elementType if isinstance(bt, ArrayType) else None
    if not isinstance(elem, StructType):
        got = elem.simpleString() if elem is not None else bt.simpleString()
        raise ValueError(
            "stored signature table uses the pre-round-6 _bands layout "
            f"(array element type {got}, expected struct<b,s0..>): the "
            "integer-struct band-key change (functions/hashing.py::band_keys) "
            "is not read-compatible — regenerate the signature table with "
            "minhash_signature_table(corpus, ...) before the next ingest"
        )
    st = stored.schema["_sig"].dataType
    if not (isinstance(st, ArrayType) and isinstance(st.elementType, LongType)):
        raise ValueError(
            f"stored signature table's _sig has type {st.simpleString()}, "
            "expected array<bigint> — regenerate the state"
        )
    return len(elem.fields) - 1


def infer_signature_layout(stored: DataFrame) -> tuple[int, int]:
    """(num_perm, bands) a stored ``minhash_signature_table`` was built
    with — the stored state IS the parameter record (schema carries
    rows-per-band, a 1-row size probe carries the widths), so adaptive
    callers ADOPT the pinned split instead of forcing the consumer to
    re-specify it (VERDICT r07 item 2: the incremental/streaming tiers
    must do the right thing by default). Pre-round-6 layouts fail here
    with the same regenerate remedy as ``check_signature_layout``."""
    rows = _check_signature_structure(stored)
    probe = stored.select(
        F.size("_sig").alias("_np"), F.size("_bands").alias("_nb")
    ).limit(1).collect()
    if not probe:
        raise ValueError(
            "stored signature table is empty — cannot infer its (num_perm, "
            "bands) split; regenerate the state with "
            "minhash_signature_table(corpus, ...) or pass the split explicitly"
        )
    num_perm, bands = int(probe[0]["_np"]), int(probe[0]["_nb"])
    if bands <= 0 or num_perm <= 0 or num_perm % bands or num_perm // bands != rows:
        raise ValueError(
            f"stored signature table is internally inconsistent: _sig width "
            f"{num_perm}, {bands} bands, schema rows-per-band {rows} — "
            "regenerate the state with minhash_signature_table(corpus, ...)"
        )
    return num_perm, bands


def check_signature_layout(stored: DataFrame, num_perm: int, bands: int) -> None:
    """Fail fast on stale persisted MinHash state (ADVICE r06 / VERDICT
    r06 item 6). Round 6 changed ``_bands`` from array<string> to
    array<struct<b, s0..>> (functions/hashing.py::band_keys), which
    silently invalidates any ``minhash_signature_table`` written before
    it: a raw unionByName/join over the old layout dies with a type
    mismatch far from the cause — or worse, a future layout could
    unify and silently miss duplicates. The stored SCHEMA carries the
    layout version (no separate version column to drift out of sync
    with the data), so the schema probe is metadata-only; a final
    1-row LIMIT probe pins
    the widths the schema cannot carry (signature length and band
    count are array SIZES, invisible to the type) — so equal-ratio
    mismatches like a (24, 6) table consumed as (12, 3) (both rows=4)
    also fail fast instead of silently degrading recall. The one
    mismatch no probe can see is the ``fast`` hash tier: md5- and
    xxhash64-built tables are value- and schema-identical in shape, so
    tier agreement stays a documented caller contract."""
    schema_rows = _check_signature_structure(stored)
    rows = num_perm // bands
    if schema_rows != rows:
        raise ValueError(
            f"stored signature table was built with {schema_rows} "
            f"rows per band, but this run is configured for {rows} "
            f"(num_perm={num_perm}, bands={bands}) — parameters must match "
            "between the stored table and batch runs; regenerate the state "
            "or pass the original parameters"
        )
    probe = stored.select(
        F.size("_sig").alias("_np"), F.size("_bands").alias("_nb")
    ).limit(1).collect()
    if probe and (probe[0]["_np"] != num_perm or probe[0]["_nb"] != bands):
        raise ValueError(
            f"stored signature table was built with num_perm="
            f"{probe[0]['_np']}, bands={probe[0]['_nb']}, but this run is "
            f"configured for num_perm={num_perm}, bands={bands} — "
            "parameters must match between the stored table and batch "
            "runs; regenerate the state or pass the original parameters"
        )


# Default band-bucket count for the persisted band index. 64 keeps the
# per-batch bucket list trivially collectable (it is bounded by this
# constant) while giving a small micro-batch real partition pruning:
# a 100-doc batch at bands=4 touches ≤400 band keys ≈ ≤64 buckets, but
# a 10-doc trickle touches ≤40 — reading ≤40/64 of the state instead of
# all of it. The count is pinned INTO the stored index (the `_nbkt`
# column) so readers adopt it instead of trusting this constant.
BAND_INDEX_BUCKETS = 64


def band_bucket_expr(n_buckets: int):
    """Partition bucket of one exploded band row:
    pmod(xxhash64(_band_idx, _band_key), n_buckets). A deterministic
    function of the band coordinates ONLY, so two rows that can ever
    band-collide (equal idx AND key) always share a bucket — pruning a
    corpus read to the batch's buckets can never lose a candidate."""
    return F.pmod(F.xxhash64("_band_idx", "_band_key"), F.lit(n_buckets)).cast("int")


def minhash_band_index(
    hashed: DataFrame,
    id_col: str = "doc_id",
    n_buckets: int = BAND_INDEX_BUCKETS,
) -> DataFrame:
    """The band-bucketed PROBE INDEX for a signature table (VERDICT r08
    item 1): one row per (doc, band_idx, band_key) with its bucket.
    Persist it ``.write.partitionBy("_bkt")`` beside the doc-level
    signature state; a micro-batch then reads ONLY the partition
    directories its own band keys hash into, so the per-batch probe
    join's input tracks the BATCH's bucket coverage instead of scanning
    and shuffling the full corpus state (BASELINE.md round-8 ingest
    curve: the full-state band join was the 7.7→13.2s/batch slope).

    Layout is self-describing like the signature table's: ``_nbkt`` (a
    constant column, ~free in parquet) records the bucket count the
    rows were hashed with, so readers ADOPT it — recomputing buckets
    with a different modulus would prune away true candidates.

    ``_layout_id`` is the index's MODEL IDENTITY (the ``_model_id``
    rule from the IVF side, VERDICT r10 item 3): the banding function
    is fully parametric — (num_perm, bands, n_buckets) IS the model,
    there is no trained content — so the stamp is one xxhash64 over
    those three, read off the signature rows themselves (size(_sig),
    size(_bands)) so it can never disagree with the data it describes.
    ``_nbkt`` alone cannot distinguish two indexes built under
    different SPLITS: a signature table re-materialized at (24, 4)
    paired with a stale (12, 3) index has band keys from a different
    banding — the probe join would silently lose true candidates, not
    error. ``check_band_index_layout`` compares the stamp; the
    streaming ingest heals a mismatched index by recompute (it is
    derived state), while ``dedup_minhash_incremental`` REFUSES a
    user-passed mismatch with the rebuild remedy.

    (The hash function TIER — fast xxhash64 vs md5 — is outside the
    stamp, as it is outside the signature table's own layout record:
    the stored-state contract pins it at the pipeline level. A tier
    mismatch changes every band key, so in practice the count-probe
    reconcile and the verify stage's id join surface it.)"""
    return (
        hashed.select(
            F.col(id_col),
            F.posexplode("_bands").alias("_band_idx", "_band_key"),
            F.xxhash64(
                F.size("_sig"), F.size("_bands"), F.lit(n_buckets)
            ).alias("_layout_id"),
        )
        .withColumn("_nbkt", F.lit(n_buckets))
        .withColumn("_bkt", band_bucket_expr(n_buckets))
    )


def check_band_index_layout(
    index: DataFrame, num_perm: int, bands: int
) -> int:
    """Identity gate for a stored band index against the split this
    run is using (the ``check_ivf_layout`` rule applied to the banded
    state): the index must carry the self-describing columns AND its
    ``_layout_id`` stamp must equal the hash of (num_perm, bands,
    _nbkt) — a stale index built under a different split has band keys
    from a different banding function, so probing through it would
    silently LOSE true candidates (pruned away, not errored). 1-row
    footer probes + one 1-row hash job; returns the adopted bucket
    count."""
    missing = {"_band_idx", "_band_key", "_nbkt", "_bkt", "_layout_id"} - set(
        index.columns
    )
    if missing:
        raise ValueError(
            f"stored band index is missing column(s) {sorted(missing)} — "
            "not a (current) minhash_band_index output; rebuild it with "
            "minhash_band_index(signature_table) and "
            "write_bucketed(..., '_bkt')"
        )
    probe = index.select("_nbkt", "_layout_id").limit(1).collect()
    if not probe:
        raise ValueError(
            "stored band index is empty — cannot check its identity; "
            "rebuild it from the signature table"
        )
    nbkt = int(probe[0]["_nbkt"])
    spark = index.sparkSession
    expected = spark.range(1).select(
        # the build stamps xxhash64(size(_sig) INT, size(_bands) INT,
        # lit(n_buckets) INT); the same INT-typed literals here keep
        # the hash comparable (xxhash64 is type-sensitive)
        F.xxhash64(
            F.lit(num_perm).cast("int"),
            F.lit(bands).cast("int"),
            F.lit(nbkt).cast("int"),
        ).alias("x")
    ).first()["x"]
    if int(probe[0]["_layout_id"]) != expected:
        raise ValueError(
            f"stored band index carries layout_id={probe[0]['_layout_id']} "
            f"but this run's split (num_perm={num_perm}, bands={bands}, "
            f"n_buckets={nbkt}) hashes to {expected} — the index was built "
            "under a DIFFERENT banding (e.g. a re-materialized signature "
            "table paired with a stale index); probing through it would "
            "silently lose true candidates. Rebuild the index from the "
            "current signature table"
        )
    return nbkt


def infer_band_index_buckets(index: DataFrame) -> int:
    """Bucket count a stored band index was written with (its ``_nbkt``
    column — the index is the parameter record, same rule as
    ``infer_signature_layout``). Fails with the rebuild remedy on a
    frame that is not a ``minhash_band_index`` output."""
    missing = {"_band_idx", "_band_key", "_nbkt", "_bkt"} - set(index.columns)
    if missing:
        raise ValueError(
            f"stored band index is missing column(s) {sorted(missing)} — "
            "not a minhash_band_index output; rebuild it with "
            "minhash_band_index(signature_table).write.partitionBy('_bkt')"
        )
    probe = index.select("_nbkt").limit(1).collect()
    if not probe:
        raise ValueError(
            "stored band index is empty — cannot infer its bucket count; "
            "rebuild it from the signature table"
        )
    return int(probe[0]["_nbkt"])


def resplit_signature_state(
    corpus: DataFrame,
    sigs_path: str,
    band_index_path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_perm: int | None = None,
    bands: int | None = None,
    fast: bool = False,
    n_buckets: int | None = None,
    threshold: float = 0.5,
    dup_sim: float = 0.9,
    recall_floor: float = 0.95,
) -> tuple[int, int]:
    """The WIRED remedy for a stale MinHash SPLIT (round 11 — the
    dedup twin of the ANN sink's rebuild-on-drift): re-probe the
    CURRENT corpus distribution, re-materialize the signature table
    (and, when maintained, the band index) under the newly chosen
    split, and atomically swap both in
    (``stored_state.commit_swap`` — the shared aside→replace→drop
    protocol, recovery via ``recover_torn_swap`` at entry).

    Why it exists: the stored state PINS the split consumers adopt
    (``infer_signature_layout``), which is right day to day — but the
    probe's pick is a function of the corpus's ambient similarity, and
    a corpus that drifts (BASELINE.md §sf10: the (12, 3) default's
    34.6 s/batch vs the probe pick's 15.5 s at an identical found set)
    leaves every later batch paying a verify bill the stored split no
    longer bounds. Re-specifying parameters by hand is the
    silent-mismatch footgun the layout gate refuses; this operator is
    the sanctioned path: one re-materialization (the |corpus|
    signature pass that was always owed once the split went stale),
    then every consumer adopts the new layout automatically.

    ``corpus`` is the SURVIVOR document set (the ingest's
    ``corpus_path`` read back); pass num_perm AND bands to pin the new
    split instead of probing. Both state tables swap in one commit —
    a signature table under the new split beside a band index under
    the old one would silently lose candidates, which is exactly what
    ``check_band_index_layout``'s identity stamp refuses. Returns the
    (num_perm, bands) the state now pins.

    Local filesystem only (the os.rename commit protocol — the
    profile.py rule); distributed stores need a transactional table
    format."""
    from ffi_etl_spark.operators.stored_state import (
        NEW_SUFFIX,
        commit_swap,
        recover_torn_swap,
        write_bucketed,
    )
    from ffi_etl_spark.streaming.profile import _local_target

    sigs_path = _local_target(sigs_path, "resplit_signature_state")
    paths = [sigs_path]
    if band_index_path is not None:
        band_index_path = _local_target(
            band_index_path, "resplit_signature_state"
        )
        paths.append(band_index_path)
    recover_torn_swap(paths)

    _require_full_split(num_perm, bands)
    if num_perm is None:
        num_perm, bands = resolve_minhash_split(
            corpus, text_col, id_col, shingle_k, threshold, dup_sim,
            recall_floor,
        )
    new_state = minhash_signature_table(
        corpus, text_col, id_col, shingle_k, num_perm, bands, fast
    )
    import shutil

    for p in paths:
        shutil.rmtree(p + NEW_SUFFIX, ignore_errors=True)
    # pin once: the state write and the band-index build both read it
    new_state = new_state.localCheckpoint(eager=True)
    new_state.write.parquet(sigs_path + NEW_SUFFIX)
    if band_index_path is not None:
        if n_buckets is None:
            # adopt the live index's bucket count when one exists (its
            # _nbkt is the parameter record); default otherwise
            try:
                live = corpus.sparkSession.read.parquet(band_index_path)
                n_buckets = infer_band_index_buckets(live)
            except Exception:
                n_buckets = BAND_INDEX_BUCKETS
        write_bucketed(
            minhash_band_index(new_state, id_col, n_buckets),
            band_index_path + NEW_SUFFIX,
            "_bkt",
        )
    commit_swap(paths)
    return num_perm, bands


def minhash_signature_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_perm: int | None = None,
    bands: int | None = None,
    fast: bool = False,
    threshold: float = 0.5,
    dup_sim: float = 0.9,
    recall_floor: float = 0.95,
) -> DataFrame:
    """The persistable MinHash state for a corpus: one row per doc with
    its distinct shingle-hash set (``_hashes``), signature (``_sig``),
    and banded LSH keys (``_bands``). This is what a daily-ingest
    pipeline MATERIALIZES once and reuses every batch — pass it to
    ``dedup_minhash_incremental(corpus_hashed=...)`` so each ingest pays
    only |batch| signatures plus the probe join, never a corpus rescan.
    Parameters must match between the stored table and the batch runs
    (same shingle_k / num_perm / bands / fast).

    Default split = ``resolve_minhash_split``'s probe pick (VERDICT r07
    item 2): the state is built ONCE, so this is exactly where the
    measured-bad fixed split used to get frozen into a pipeline —
    BASELINE.md sf3: 34.6s/batch under the default (12, 3) vs 15.5s
    under the probe's (24, 4) at the identical true-dup found set.
    Downstream consumers adopt the stored layout automatically
    (``infer_signature_layout``); pass num_perm AND bands to pin a
    split by hand."""
    _require_full_split(num_perm, bands)
    if num_perm is None:
        num_perm, bands = resolve_minhash_split(
            df, text_col, id_col, shingle_k, threshold, dup_sim, recall_floor
        )
    rows = num_perm // bands
    hashed = _shingle_sets(df, text_col, id_col, shingle_k, fast, num_perm)
    return hashed.withColumn("_bands", band_keys(F.col("_sig"), bands, rows))


def dedup_minhash_incremental(
    corpus: DataFrame | None,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_perm: int | None = None,
    bands: int | None = None,
    threshold: float = 0.5,
    fast: bool = False,
    broadcast_verify: bool = True,
    corpus_hashed: DataFrame | None = None,
    batch_hashed: DataFrame | None = None,
    dup_sim: float | None = None,
    recall_floor: float | None = None,
    corpus_band_index: DataFrame | None = None,
    trust_layout: bool = False,
) -> DataFrame:
    """Near-dup pairs between a NEW batch and an existing corpus (plus
    batch-internal pairs) — corpus×corpus pairs are never generated.

    This is the daily-ingest shape of MinHash-LSH at 100 TB: the
    standing corpus was already deduplicated, so re-pairing it against
    itself every ingest is O(corpus²·collision) wasted work. Here the
    band self-join is replaced by ``new_bands ⋈ all_bands``: the
    candidate count scales with the BATCH's band collisions, and the
    (far larger) corpus side participates only as join probe input.

    Two corpus forms:
      * ``corpus`` (raw documents) — signatures compute over
        corpus ∪ batch in one pass. Correct, but re-pays the corpus
        text scan + signature compute every call.
      * ``corpus_hashed`` (a ``minhash_signature_table`` output, the
        production path) — the stored state is reused verbatim and the
        call computes |batch| signatures + the probe join only. Note
        the state is wide (the exact-verify ``_hashes`` set is ~8
        bytes/shingle, larger than the text): at sf0.1 reading it
        costs about what recomputing does, so WALL CLOCK there sits
        inside the dedup family's noise band for both forms.

    The structural win is the CANDIDATE count, which is deterministic
    and measured: at sf0.1 the full self-join emits 191,507 band
    candidates; the incremental join emits 4,868 for a 1% batch (39x)
    and 39,812 for a 10% batch (4.8x) — the verify bill, the dominant
    per-candidate term at 100 TB, tracks the batch fraction instead of
    corpus².

    Output: (id_a, id_b, jaccard_sim, pair_type) with pair_type
    'new_new' for batch-internal pairs, 'new_old' for batch-vs-corpus.
    Ids must be disjoint across the two inputs — enforced with a cheap
    semi-join probe (limit-1, so it short-circuits on the first hit)
    because a violated precondition would not fail loudly: a duplicated
    id would silently mislabel its pairs on both sides.

    Default split (VERDICT r07 item 2): with ``corpus_hashed``, the
    stored table's pinned layout is ADOPTED (``infer_signature_layout``
    — the schema + a 1-row size probe are the parameter record); with a
    raw ``corpus``, the standing distribution is probed and
    ``resolve_minhash_split`` picks the split. Pass num_perm AND bands
    to pin one explicitly — the layout gate then enforces it against
    any stored state.

    ``corpus_band_index`` (requires ``corpus_hashed``): a
    ``minhash_band_index`` frame giving the corpus side of the band
    probe join directly (VERDICT r08 item 1). The caller may — and the
    streaming ingest does — prune it to the batch's buckets
    (``band_bucket_expr`` with the index's OWN ``_nbkt``), which is
    lossless because bucket is a function of the band coordinates: the
    per-batch probe input then tracks the batch, not the corpus. With
    an index, the wide doc-level state is touched only by the verify
    stage, and only for candidate ids (broadcast semi-join) — never
    scanned for bands and never broadcast corpus-wide.

    ``trust_layout``: skip the stored-state layout gates when the
    CALLER already ran them this batch (ADVICE r08 — the streaming
    ingest gates once in its split resolution and builds batch_hashed
    itself, so re-gating here was 2-3 redundant 1-row probe jobs per
    micro-batch). Leave False anywhere the frames' provenance is not
    this-process-just-checked."""
    if (corpus is None) == (corpus_hashed is None):
        raise ValueError(
            "dedup_minhash_incremental: pass exactly one of corpus "
            "(raw documents) or corpus_hashed (minhash_signature_table)"
        )
    corpus_ids = (
        corpus.select(id_col) if corpus is not None else corpus_hashed.select(id_col)
    )
    overlap = (
        corpus_ids.join(batch.select(id_col), id_col, "left_semi")
        .limit(1)
        .count()
    )
    if overlap:
        raise ValueError(
            "dedup_minhash_incremental: corpus and batch share ids — the "
            "two inputs must be disjoint (a shared id would be flagged "
            "new on one side and old on the other)"
        )
    if batch_hashed is not None and corpus_hashed is None:
        raise ValueError(
            "dedup_minhash_incremental: batch_hashed requires corpus_hashed "
            "(both sides must share one signature parameterization)"
        )
    if corpus_band_index is not None and corpus_hashed is None:
        raise ValueError(
            "dedup_minhash_incremental: corpus_band_index requires "
            "corpus_hashed (the index carries band keys only; the verify "
            "stage still needs the doc-level state's _hashes)"
        )
    _require_full_split(num_perm, bands)
    adopted = False
    if num_perm is None:
        # adaptive default (VERDICT r07 item 2): a stored signature
        # table PINS the split — adopt it (re-specifying it was the
        # silent-mismatch footgun the layout gate exists for); with a
        # raw corpus, probe the STANDING distribution once per call and
        # pick the split that bounds the verify bill (BASELINE.md sf3:
        # 34.6s default vs 15.5s probe pick, identical true-dup set).
        num_perm, bands = resolve_or_adopt_split(
            corpus, corpus_hashed, text_col, id_col, shingle_k,
            threshold, dup_sim, recall_floor,
        )
        adopted = corpus_hashed is not None
    rows = num_perm // bands
    if corpus_hashed is not None and not adopted and not trust_layout:
        # metadata-only layout gate: a pre-round-6 stored table (string
        # band keys) or a parameter-mismatched one must name the remedy
        # here, not die in the union/join below. Skipped when the split
        # was just INFERRED from this same table (review r08: the gate
        # re-run can never fail there — one probe job saved per call in
        # the ingest hot path), or when the caller pre-gated
        # (trust_layout, ADVICE r08).
        check_signature_layout(corpus_hashed, num_perm, bands)
    if batch_hashed is not None and not trust_layout:
        # both sides of the band join must share one parameterization —
        # previously a documented contract, now the same cheap gate.
        # trust_layout skips it for frames the caller just built with
        # these exact parameters (the streaming ingest's own batch).
        check_signature_layout(batch_hashed, num_perm, bands)
    if corpus_band_index is not None and not trust_layout:
        # identity gate (VERDICT r10 item 3): a user-passed index built
        # under a different split would silently LOSE candidates in the
        # pruned probe join — refuse with the rebuild remedy. The
        # streaming ingest pre-gates (and heals by recompute) and
        # passes trust_layout.
        check_band_index_layout(corpus_band_index, num_perm, bands)
    if corpus is not None:
        union = corpus.select(id_col, text_col).unionByName(
            batch.select(id_col, text_col)
        )
        hashed = _shingle_sets(union, text_col, id_col, shingle_k, fast, num_perm)
        hashed = _pin(hashed.withColumn("_bands", band_keys(F.col("_sig"), bands, rows)))
    else:
        # pin ONLY the freshly computed batch signatures: the corpus
        # side is a stored table whose re-read per consumer is cheaper
        # than caching corpus-scale state for one batch's run. A caller
        # that already holds the batch signatures (the streaming ingest
        # reuses them for its state append) passes batch_hashed and the
        # shingle pass runs ONCE per batch, not twice.
        if batch_hashed is None:
            batch_hashed = _pin(
                minhash_signature_table(
                    batch, text_col, id_col, shingle_k, num_perm, bands, fast
                )
            )
        hashed = None

    # the batch id list rides the same broadcast-vs-shuffle switch as
    # the verify table: broadcastable for a daily batch, shuffle-join
    # fallback when the batch itself outgrows the driver
    new_ids = batch.select(F.col(id_col).alias("_id")).distinct()
    if broadcast_verify:
        new_ids = F.broadcast(new_ids)

    if corpus_band_index is not None:
        # pruned probe join (VERDICT r08 item 1): the corpus side of
        # the band join is the persisted index — already exploded,
        # already bucket-partitioned, possibly pruned by the caller to
        # the batch's buckets — read with only (id, band) columns. The
        # batch side is |batch|·bands rows: broadcast it so the corpus
        # read is a map-side hash probe, never shuffled. Ids are
        # disjoint (gated above), so every hit is a new×old candidate.
        batch_bands = batch_hashed.select(
            F.col(id_col).alias("_id"),
            F.posexplode("_bands").alias("_band_idx", "_band_key"),
        )
        corpus_bands = corpus_band_index.select(
            F.col(id_col).alias("_id"), "_band_idx", "_band_key"
        )
        b, c = batch_bands.alias("n"), corpus_bands.alias("c")
        new_old_cands = c.join(
            F.broadcast(b) if broadcast_verify else b,
            (F.col("n._band_idx") == F.col("c._band_idx"))
            & (F.col("n._band_key") == F.col("c._band_key")),
        ).select(
            F.least(F.col("n._id"), F.col("c._id")).alias("id_a"),
            F.greatest(F.col("n._id"), F.col("c._id")).alias("id_b"),
        )
        # batch-internal candidates: the standard band self-join over
        # the (small) batch signatures only
        pairs = new_old_cands.unionByName(
            _candidate_pairs(batch_hashed, id_col)
        ).distinct()
    else:
        if hashed is not None:
            bands_src = hashed
        else:
            # bands-only union: column pruning keeps the wide _hashes
            # out of the stored-state scan that feeds the band join
            bands_src = corpus_hashed.select(id_col, "_bands").unionByName(
                batch_hashed.select(id_col, "_bands")
            )
        all_bands = bands_src.select(
            F.col(id_col).alias("_id"),
            F.posexplode("_bands").alias("_band_idx", "_band_key"),
        )
        new_bands = all_bands.join(new_ids, "_id")

        n, c = new_bands.alias("n"), all_bands.alias("c")
        pairs = (
            n.join(
                c,
                (F.col("n._band_idx") == F.col("c._band_idx"))
                & (F.col("n._band_key") == F.col("c._band_key"))
                & (F.col("n._id") != F.col("c._id")),
            )
            # new×new collisions arrive twice (once from each side) —
            # canonicalize then distinct; new×old arrives exactly once
            .select(
                F.least(F.col("n._id"), F.col("c._id")).alias("id_a"),
                F.greatest(F.col("n._id"), F.col("c._id")).alias("id_b"),
            )
            .distinct()
        )

    if corpus_hashed is not None:
        # candidate-restricted verify (VERDICT r08 item 1's second
        # term): the wide per-doc hash sets used to be pulled — and
        # under broadcast_verify, COLLECTED AND BROADCAST — for the
        # ENTIRE corpus every call, an O(corpus·set_width) per-batch
        # bill. Only candidate ids ever reach the verify lookups, so
        # semi-join the stored state down to them first (candidates are
        # batch-scale by the incremental design) and union the batch's
        # own sets; what gets broadcast is then candidate-scale. The
        # pairs frame feeds both the id list and the verify probe — pin
        # it so the band join computes once.
        pairs = _pin(pairs)
        cand = (
            pairs.select(F.col("id_a").alias(id_col))
            .unionByName(pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        sets = corpus_hashed.select(id_col, "_hashes").join(
            F.broadcast(cand) if broadcast_verify else cand,
            id_col,
            "left_semi",
        ).unionByName(batch_hashed.select(id_col, "_hashes"))
    else:
        sets = hashed.select(F.col(id_col), F.col("_hashes"))
    flags = new_ids.withColumn("_is_new", F.lit(True))
    verified = (
        _verify_join(pairs, sets, id_col, broadcast_verify)
        .filter(size_bound_filter(threshold))
        .withColumn(
            "jaccard_sim",
            jaccard_with_sizes(F.col("_ha"), F.col("_hb"), F.col("_na"), F.col("_nb")),
        )
        .filter(F.col("jaccard_sim") >= threshold)
        .join(flags.withColumnsRenamed({"_id": "id_a", "_is_new": "_new_a"}), "id_a", "left")
        .join(flags.withColumnsRenamed({"_id": "id_b", "_is_new": "_new_b"}), "id_b", "left")
        .select(
            "id_a",
            "id_b",
            "jaccard_sim",
            F.when(
                F.coalesce(F.col("_new_a"), F.lit(False))
                & F.coalesce(F.col("_new_b"), F.lit(False)),
                "new_new",
            )
            .otherwise("new_old")
            .alias("pair_type"),
        )
    )
    return verified


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fast: bool = False,
) -> DataFrame:
    """60-bit SimHash per document over whitespace tokens. Token hashes
    are materialized in their own projection so each of the 60 bit-folds
    reads the array instead of re-deriving hashes. ``fast=True`` swaps
    the md5-derived token hash for native xxhash64 (one JVM intrinsic vs
    digest + hex parse) — same algorithm, engine-private bits (no DuckDB
    oracle); the production tier at 100 TB."""
    from ffi_etl_spark.functions.hashing import simhash64_from_hashes

    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    if fast:
        token_hash = lambda t: F.pmod(F.xxhash64(t), F.lit(2 ** 60))  # noqa: E731
    else:
        token_hash = md5_int60
    hashed = _spread(df, id_col).select(
        F.col(id_col), F.transform(tokens, token_hash).alias("_th")
    )
    return hashed.select(F.col(id_col), simhash64_from_hashes(F.col("_th")).alias("simhash"))


def dedup_simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    fast: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash: band on 4 × 15-bit chunks (pigeonhole:
    ≤3 differing bits ⇒ ≥1 identical chunk), verify Hamming distance."""
    fp = _pin(simhash_fingerprints(df, text_col, id_col, fast=fast))
    # band key = chunk_idx*2^15 + chunk_value, one INT per band: the
    # chunk index rides in bits 15-16 so cross-chunk values can never
    # collide, and the join key stays a codegen integer compare/hash
    # (the original string "i:chunk" keys paid concat_ws + string
    # hashing, plus a no-op interpreted transform() pass — measured
    # ~5-8% of the operator at sf0.1 for zero semantic content)
    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), 15 * i).bitwiseAND(F.lit((1 << 15) - 1))
            + F.lit(i << 15)
            for i in range(4)
        ]
    )
    bands = fp.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        F.explode(chunks).alias("_band_key"),
    )
    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l._band_key") == F.col("r._band_key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l.simhash").alias("_sa"),
            F.col("r.simhash").alias("_sb"),
        )
        .distinct()
    )
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dedup_ngram_jaccard(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 12,
    bands: int = 6,
    threshold: float = 0.4,
    broadcast_verify: bool = True,
) -> DataFrame:
    """Near-dup pairs on word-n-gram sets: LSH candidates (aggressive
    banding for recall), exact n-gram Jaccard verify.

    N-gram hash sets are built the same codegen way as ``_shingle_sets``:
    explode the n-gram start positions to rows, hash row-wise, collect_set
    back on the already-spread partitioning (no extra shuffle)."""
    rows = num_perm // bands
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    cnt = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(1))
    hashed = (
        _spread(df, id_col)
        .select(F.col(id_col), tokens.alias("_toks"), F.explode(F.sequence(F.lit(1), cnt)).alias("_i"))
        .select(
            F.col(id_col),
            md5_int32(F.concat_ws(" ", F.slice(F.col("_toks"), F.col("_i"), F.lit(n)))).alias("_h"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("_h").alias("_hashes"), *_sig_aggs(num_perm))
        .select(
            id_col,
            "_hashes",
            F.array(*[F.col(f"_m{p}") for p in range(num_perm)]).alias("_sig"),
        )
    )
    hashed = _pin(hashed.withColumn("_bands", band_keys(F.col("_sig"), bands, rows)))
    pairs = _candidate_pairs(hashed, id_col)
    sets = hashed.select(F.col(id_col), F.col("_hashes"))
    return (
        _verify_join(pairs, sets, id_col, broadcast_verify)
        .filter(size_bound_filter(threshold))
        .withColumn(
            "jaccard_sim",
            jaccard_with_sizes(F.col("_ha"), F.col("_hb"), F.col("_na"), F.col("_nb")),
        )
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def dedup_containment(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_perm: int = 12,
    bands: int = 3,
    threshold: float = 0.9,
    fast: bool = False,
    broadcast_verify: bool = True,
) -> DataFrame:
    """Containment near-dups: pairs where the SMALLER document's
    shingle set is mostly inside the larger's —
    ``|A∩B| / min(|A|,|B|) >= threshold`` — the duplication Jaccard
    structurally misses (a paragraph pasted into a long page has tiny
    Jaccard but containment ~1). This is the sub-document dedup signal
    beside ``dup_span_profile``'s span-level one.

    Candidates come from the SAME MinHash band join as the Jaccard
    tier, with its recall caveat stated honestly: MinHash collides by
    JACCARD, so containment pairs with very lopsided sizes (tiny A in
    huge B → low Jaccard) may not band-collide; full asymmetric
    containment search needs a prefix-filtered inverted index
    (textops.py::inverted_index is the building block). For
    comparable-size pairs — template families, partial rewrites — the
    band join recalls them and the exact containment verify here is
    precise. No size prefilter: lopsidedness is the point."""
    hashed = _pin(
        minhash_signature_table(
            df, text_col, id_col, shingle_k, num_perm, bands, fast
        )
    )
    pairs = _candidate_pairs(hashed, id_col)
    sets = hashed.select(F.col(id_col), F.col("_hashes"))
    inter = F.size(F.array_intersect(F.col("_ha"), F.col("_hb")))
    containment = inter.cast("double") / F.least(F.col("_na"), F.col("_nb"))
    return (
        _verify_join(pairs, sets, id_col, broadcast_verify)
        .withColumn("containment", containment)
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )
