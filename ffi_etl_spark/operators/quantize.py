"""Embedding scalar quantization: float vectors -> per-dimension int8
codes.

The storage/bandwidth lever for vector search at scale: a 64-dim
float32 embedding is 256 bytes; its uint8-coded form is 64 bytes plus a
shared per-dimension (min, max) codebook. IVF/LSH tiers
(operators/similarity.py) can scan 4x more candidates per byte of IO
with distance error bounded by the per-dimension quantization step.

Shape: one posexplode to (vec_id, dim, x) rows — a narrow generator —
then ONE aggregation keyed on dim (output = n_dims rows, broadcast
back) and one per-vector reassembly aggregation. Two shuffles total,
both bounded: the dim agg shuffles n_dims*partitions partial rows, the
reassembly shuffles n_rows*n_dims code rows once (at 100 TB, the
reassembly is the dominant exchange — the codebook side is free).

Determinism: codes use floor((x - mn) * 255 / (mx - mn)) — floor, not
round, per the engine's cross-engine parity rule (half-tie semantics
differ between engines; floor of bit-equal quotients never does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def achlioptas_signs(in_dim: int, out_dim: int, seed: str = "jl") -> list[list[float]]:
    """±1 projection matrix from md5 parity — the Achlioptas (2001)
    database-friendly Johnson-Lindenstrauss construction, made
    deterministic and engine-portable: sign(j, i) is the parity of
    md5(f"{seed}_{j}_{i}"), so ANY engine regenerates the identical
    matrix from the seed string alone (no RNG state to ship)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{seed}_{j}_{i}".encode()).hexdigest()[:8], 16) % 2 == 0
            else -1.0
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_project(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "jl",
) -> DataFrame:
    """JL random projection: (id, y0..y{out_dim-1}) — each output dim is
    the sequential-fold dot product of the vector with a ±1 sign row
    (functions/vectors.py::dot, bit-equal to DuckDB's list order), so
    the projection is reproducible across engines and partitionings.

    Fully narrow — no shuffle at all: the matrix is out_dim literal
    arrays folded per row inside the scan stage. The 4x-16x
    dimensionality cut feeds the ANN tiers (sign-LSH/IVF recall is
    near-preserved at out_dim ~ O(log n / eps^2) per the JL lemma)."""
    from ffi_etl_spark.functions.vectors import dot

    signs = achlioptas_signs(in_dim, out_dim, seed)
    cols = [
        dot(
            F.col(vec_col), F.array(*[F.lit(s) for s in signs[j]])
        ).alias(f"y{j}")
        for j in range(out_dim)
    ]
    return df.select(F.col(id_col), *cols)


def quantize_codes_long(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, dim, code) long-format uint8 codes — the internal form the
    code-space operators (kNN over codes) consume directly, skipping
    the reassembly shuffle entirely."""
    ex = df.select(
        F.col(id_col), F.posexplode(vec_col).alias("dim", "x")
    ).withColumn("x", F.col("x").cast("double"))
    stats = ex.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    # constant dimension (mx == mn) carries no information: code 0, not
    # a 0/0 NULL that would silently desynchronize codes_csv from
    # n_dims (array_join drops null elements) and NaN-crash the oracle
    code = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.floor(
            ((F.col("x") - F.col("mn")) * F.lit(255.0)) / (F.col("mx") - F.col("mn"))
        ).cast("int")
    )
    return ex.join(F.broadcast(stats), "dim").select(
        F.col(id_col), F.col("dim"), code.alias("code")
    )


def quantize_embeddings_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, n_dims, codes_csv): per-dimension min/max scaled uint8 codes,
    emitted as a comma-joined string (gated-output contract: no raw
    array columns)."""
    codes = quantize_codes_long(df, vec_col, id_col)
    return codes.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "code"))),
                lambda s: s["code"].cast("string"),
            ),
            ",",
        ).alias("codes_csv"),
    )


def knn_int8_codes(
    df: DataFrame,
    probe_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-``k`` nearest neighbors per probe in QUANTIZED code space:
    squared L2 over the uint8 codes — pure integer arithmetic, so
    distances, ties, and therefore the whole ranking are bit-exact on
    any engine (unlike float-space kNN, where last-ulp differences can
    flip rank boundaries). This is the payoff query for
    ``quantize_embeddings_int8``: the scan reads 1/4 the bytes and the
    distance kernel is integer multiply-add.

    Shape: the probe side (|probes| x n_dims code rows) broadcasts into
    a dim-keyed join against the long-format corpus codes, one
    (probe, candidate) aggregate sums the squared deltas, and the
    per-probe top-k runs as a WindowGroupLimit. The corpus shuffles
    once, on the candidate key.
    """
    from pyspark.sql import Window

    codes = quantize_codes_long(df, vec_col, id_col)
    probes = codes.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("pid"), F.col("dim"), F.col("code").alias("pcode")
    )
    delta = F.col("code") - F.col("pcode")
    dists = (
        codes.join(F.broadcast(probes), "dim")
        .filter(F.col(id_col) != F.col("pid"))
        .groupBy("pid", id_col)
        .agg(F.sum(delta * delta).alias("d2"))
    )
    w = Window.partitionBy("pid").orderBy("d2", id_col)
    return (
        dists.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .orderBy("pid", "rk")
    )


def mmr_diverse_topk(
    df: DataFrame,
    probe_id: int,
    n_candidates: int = 20,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking in quantized code space —
    the diversity-aware top-k a curation pipeline uses so "nearest k"
    isn't k copies of the same template (Carbonell & Goldstein 1998).

    With λ = 1/2 the MMR objective scales to pure integers:
    ``mmr(c) = min_{s∈S} d2(c, s) − d2(q, c)`` (prefer candidates FAR
    from everything already selected, NEAR the query), over the int8
    squared-L2 kernel — every score an exact BIGINT, ties to the
    smaller id, so the full selection ORDER is bit-deterministic.

    Shape: the candidate pool (top-``n_candidates`` by query distance)
    and its pairwise distance table are tiny (n² rows) and eagerly
    checkpointed once; each of the k selection rounds is one broadcast
    semi/anti join + a 1-row argmax — never any corpus-scale work
    beyond the initial kNN (whose corpus shuffle is the knn_int8_codes
    shape). Output: (rank, id, d2q, div_min) in selection order;
    div_min is NULL for rank 1 (no selected set yet).
    """
    codes = quantize_codes_long(df, vec_col, id_col)
    probe = codes.filter(F.col(id_col) == probe_id).select(
        "dim", F.col("code").alias("pcode")
    )
    d2q = (
        codes.filter(F.col(id_col) != probe_id)
        .join(F.broadcast(probe), "dim")
        .groupBy(F.col(id_col).alias("id"))
        .agg(
            F.sum((F.col("code") - F.col("pcode")) * (F.col("code") - F.col("pcode")))
            .cast("long")
            .alias("d2q")
        )
        .orderBy("d2q", "id")
        .limit(n_candidates)
        .localCheckpoint(eager=True)
    )
    cc = codes.join(F.broadcast(d2q.select("id")), F.col(id_col) == F.col("id")).select(
        "id", "dim", "code"
    )
    a, b = cc.alias("a"), cc.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim")) & (F.col("a.id") != F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("ca"), F.col("b.id").alias("cb"))
        .agg(
            F.sum(
                (F.col("a.code") - F.col("b.code"))
                * (F.col("a.code") - F.col("b.code"))
            )
            .cast("long")
            .alias("d2p")
        )
        .localCheckpoint(eager=True)
    )
    first = (
        d2q.agg(F.min(F.struct("d2q", "id")).alias("_w"))
        .select(
            F.lit(1).alias("rank"),
            F.col("_w.id").alias("id"),
            F.col("_w.d2q").alias("d2q"),
            F.lit(None).cast("long").alias("div_min"),
        )
        .localCheckpoint(eager=True)
    )
    picks = [first]
    sel = first.select("id")
    for r in range(2, k + 1):
        remaining = d2q.join(sel, "id", "left_anti")
        div = (
            remaining.join(
                F.broadcast(pair.join(sel, pair.cb == sel.id).select("ca", "d2p")),
                F.col("id") == F.col("ca"),
            )
            .groupBy("id", "d2q")
            .agg(F.min("d2p").cast("long").alias("div_min"))
        )
        winner = (
            div.agg(
                F.min(
                    F.struct(
                        (F.col("d2q") - F.col("div_min")).alias("neg_mmr"),
                        F.col("id"),
                        F.col("d2q").alias("dq"),
                        F.col("div_min").alias("dm"),
                    )
                ).alias("_w")
            )
            .select(
                F.lit(r).alias("rank"),
                F.col("_w.id").alias("id"),
                F.col("_w.dq").alias("d2q"),
                F.col("_w.dm").alias("div_min"),
            )
            .localCheckpoint(eager=True)
        )
        picks.append(winner)
        sel = sel.unionByName(winner.select("id")).localCheckpoint(eager=True)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


# Fixed-point scale for PQ centroids: FLOOR(sum·2^10 / count) keeps the
# floored MEAN exact in integer space (sum·1024 ≤ 2^53 for any corpus
# this engine meets per-subspace), so Lloyd assignment, encoding, and
# ADC distances are all exact BIGINT arithmetic — bit-identical on any
# engine, the quantized_centroid_sums rule extended to L2 k-means.
PQ_SCALE = 1024


def pq_train_encode(
    codes,
    dim: int = 64,
    m: int = 8,
    k_sub: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
):
    """Product quantization over uint8 code vectors (Jégou et al. 2011,
    the canonical vector-compression tier past scalar quantization):
    split each ``dim``-dim code vector into ``m`` subspaces of
    ``dim/m`` dims, run ``n_iter`` exact-integer Lloyd rounds PER
    subspace (k = ``k_sub``), and encode every vector as its m
    nearest-subcentroid ids — 64 uint8 codes become m 4-bit ids at
    k_sub=16, a further 16× storage cut on top of SQ's 4×.

    Exactness (the oracle contract): centroids are fixed-point floored
    means (``FLOOR(sum·PQ_SCALE / count)`` — exact double arithmetic
    under 2^53, floor has no tie ambiguity), distances are integer
    squared L2 between ``code·PQ_SCALE`` and the centroid, and the
    argmin tie-breaks to the lowest centroid id — so the whole
    training iteration is bit-stable and DuckDB-replayable, the
    ``kmeans_lloyd(quantize_bits=...)`` posture applied to L2.

    Input is the LONG code form (``quantize_codes_long`` output:
    (id, dim, code)); queries later encode against the SAME per-dim SQ
    codebook, so corpus and query codes live on one scale.

    Returns ``(codebooks, encoded)``: codebooks =
    (_j, _cid, _p, _cent) — m·k_sub·(dim/m) integer rows, the
    broadcastable model; encoded = (id, _j, _cid) — the long PQ code
    form the ADC join consumes directly (pack with
    ``pq_pack_codes`` for storage).

    Shape: each round is one (j, cid, p)-keyed aggregate (map-side
    combined; output m·k_sub·dim/m rows) and one candidates join of
    n·k_sub·dim rows per subspace — at 100 TB, train on a bounded
    sample (the ``ivf_train_quantizer`` rule) and ENCODE the full
    corpus in the one unavoidable pass; encoding cost equals one
    Lloyd assignment."""
    d_sub = dim // m
    if d_sub * m != dim:
        raise ValueError(f"dim={dim} is not divisible by m={m} subspaces")
    sub = codes.select(
        F.col(id_col),
        (F.col("dim") / d_sub).cast("int").alias("_j"),
        (F.col("dim") % d_sub).alias("_p"),
        F.col("code"),
    )
    assigned = (
        sub.select(id_col, "_j")
        .distinct()
        .withColumn("_cid", (F.col(id_col) % k_sub).cast("int"))
        .localCheckpoint(eager=True)
    )
    cents = None
    for _r in range(n_iter):
        cents = (
            sub.join(assigned, [id_col, "_j"])
            .groupBy("_j", "_cid", "_p")
            .agg(
                F.floor(
                    F.sum("code").cast("double")
                    * F.lit(float(PQ_SCALE))
                    / F.count(F.lit(1))
                )
                .cast("long")
                .alias("_cent")
            )
            .localCheckpoint(eager=True)
        )
        delta = F.col("code") * F.lit(PQ_SCALE) - F.col("_cent")
        assigned = (
            sub.join(F.broadcast(cents), ["_j", "_p"])
            .groupBy(id_col, "_j", "_cid")
            .agg(F.sum(delta * delta).alias("_d2"))
            .groupBy(id_col, "_j")
            .agg(F.min(F.struct("_d2", "_cid")).alias("_w"))
            .select(id_col, "_j", F.col("_w._cid").alias("_cid"))
            .localCheckpoint(eager=True)
        )
    return cents, assigned


def pq_pack_codes(encoded, id_col: str = "vec_id"):
    """(id, pq_csv): the stored form — m comma-joined subcentroid ids
    in subspace order (the gated-output contract: no raw arrays)."""
    return encoded.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_j", "_cid"))),
                lambda s: s["_cid"].cast("string"),
            ),
            ",",
        ).alias("pq_csv")
    )


def pq_adc_topk(
    codebooks,
    encoded,
    codes,
    probe_ids: list[int],
    k: int = 10,
    dim: int = 64,
    m: int = 8,
    id_col: str = "vec_id",
):
    """Asymmetric-distance (ADC) top-``k`` per probe over a
    PQ-encoded corpus: the query keeps its full SQ code vector, each
    candidate is its reconstructed subcentroids, and
    d2(q, x̂) decomposes EXACTLY across subspaces —
    Σ_j d2(q_j, cent[j][code_j]). Per query the engine builds the
    m·k_sub LOOK-UP TABLE once (one broadcast join of the probe's
    code rows against the codebook — the classic ADC trick), then
    scoring a candidate is m integer lookups + an m-term integer sum,
    NOT a dim-term fold: 8× less per-pair compute than exact code-space
    kNN and 16× less candidate storage read, the PQ trade. All
    distances are exact BIGINT (the PQ_SCALE fixed point), so the
    ranking and its ties are bit-identical on any engine.

    Shape: LUT = |probes|·m·k_sub rows (broadcast); the candidate
    side joins its (j, cid) pairs against the LUT and one
    (probe, candidate)-keyed aggregate sums the m per-subspace terms.
    The corpus shuffles once, on the candidate key."""
    d_sub = dim // m
    qsub = codes.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("_qid"),
        (F.col("dim") / d_sub).cast("int").alias("_j"),
        (F.col("dim") % d_sub).alias("_p"),
        F.col("code"),
    )
    delta = F.col("code") * F.lit(PQ_SCALE) - F.col("_cent")
    lut = (
        qsub.join(F.broadcast(codebooks), ["_j", "_p"])
        .groupBy("_qid", "_j", "_cid")
        .agg(F.sum(delta * delta).alias("_d2"))
    )
    scored = (
        encoded.join(F.broadcast(lut), ["_j", "_cid"])
        .filter(F.col(id_col) != F.col("_qid"))
        .groupBy(F.col("_qid").alias("pid"), F.col(id_col))
        .agg(F.sum("_d2").alias("adc_d2"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pid").orderBy("adc_d2", id_col)
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("pid", id_col, "adc_d2", "rk")
    )


def pq_adc_rerank_topk(
    codebooks,
    encoded,
    codes,
    probe_ids: list[int],
    k: int = 10,
    rerank_factor: int = 4,
    dim: int = 64,
    m: int = 8,
    id_col: str = "vec_id",
):
    """ADC shortlist + EXACT code-space re-rank — the recall-recovery
    pattern of the int8 IVF tier applied to PQ: rank candidates by
    asymmetric distance (m lookups each — the cheap pass over the
    16×-compressed codes), keep the top ``rerank_factor·k`` per probe,
    then re-score ONLY those with the exact 64-term integer d2 over
    the full SQ codes (a |probes|·rerank_factor·k·dim join — bounded
    by the shortlist, independent of corpus size). Still exact BIGINT
    end to end, so the final ranking is engine-bit-identical; recall
    against exact code-space kNN is test-locked (pytest: ADC alone
    0.24 at gate scale, re-ranked ≥0.5 at factor 4)."""
    short = pq_adc_topk(
        codebooks, encoded, codes, probe_ids,
        k=rerank_factor * k, dim=dim, m=m, id_col=id_col,
    ).select("pid", id_col)
    pcodes = codes.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("pid"), F.col("dim"), F.col("code").alias("pcode")
    )
    delta = F.col("code") - F.col("pcode")
    rescored = (
        codes.join(F.broadcast(short), id_col)
        .join(F.broadcast(pcodes), ["pid", "dim"])
        .groupBy("pid", id_col)
        .agg(F.sum(delta * delta).cast("long").alias("code_d2"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pid").orderBy("code_d2", id_col)
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("pid", id_col, "code_d2", "rk")
    )


def ann_ivfpq_topk(
    centroids,
    assignments,
    pq_codebooks,
    pq_encoded,
    codes,
    probe_ids: list[int],
    k: int = 10,
    nprobe: int = 1,
    probe_frac: float | None = None,
    rerank_factor: int | None = None,
    dim: int = 64,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF × PQ — the two compression tiers COMPOSED, the FAISS
    ``IVFPQ`` shape re-expressed relationally: the coarse quantizer
    bounds WHICH candidates are scored (each probe visits its
    ``nprobe`` nearest cells — ``probe_frac`` is the round-11 scale
    dial, ceil(frac · cells) off the stored ``_cells`` stamp) and PQ
    bounds WHAT scoring a candidate costs (m LUT lookups + an m-term
    integer sum against the probe's ADC table). Per probe the work is
    nprobe·√n·m integer adds over 4-bit codes — against 100 TB of
    float vectors, the probe touches neither the float column nor the
    full SQ codes, only the m-id PQ rows of the probed cells.

    Inputs are the two families' own stored forms: (``centroids``,
    ``assignments``) from ``ivf_index_tables`` (cell routing only —
    the float vectors in it are never read), (``pq_codebooks``,
    ``pq_encoded``) from ``pq_train_encode``, and the long SQ
    ``codes`` for the probe-side LUT (probes keep full codes — ADC is
    asymmetric by design). ``rerank_factor`` re-scores the top
    rerank_factor·k by exact code-space d2, the recovery pattern both
    parent tiers use. All distances exact BIGINT; output
    (pid, id, adc_d2|code_d2, rk)."""
    import math as _math

    from ffi_etl_spark.operators.similarity import (
        assign_to_centroid,
        assign_top_centroids,
    )

    d_sub = dim // m
    if probe_frac is not None:
        if not 0.0 < probe_frac <= 1.0:
            raise ValueError(
                f"probe_frac={probe_frac} is outside (0, 1] — it is the "
                "fraction of the stored model's cells each probe visits"
            )
        probe = centroids.select("_cells").limit(1).collect()
        if not probe:
            raise ValueError(
                "stored IVF centroids table is empty — cannot derive the "
                "cell count probe_frac scales against"
            )
        nprobe = max(1, _math.ceil(probe_frac * int(probe[0]["_cells"])))
    model = centroids.select("centroid_id", "centroid")
    # probe-side cell routing needs the float vectors of the PROBES
    # only: reconstruct them is impossible from codes, so the caller's
    # queries ride in via the assignments table's own float rows (the
    # probes are corpus members in every gated use; external queries
    # would pass their own frame through assign_top_centroids)
    qvecs = assignments.filter(F.col(id_col).isin(probe_ids)).select(
        id_col, vec_col
    )
    if nprobe > 1:
        qa = assign_top_centroids(qvecs, model, nprobe, id_col, vec_col)
    else:
        qa = assign_to_centroid(qvecs, model, id_col, vec_col)
    qa = qa.select(F.col(id_col).alias("_qid"), "centroid_id")
    cand = (
        assignments.select(F.col(id_col), F.col("centroid_id"))
        .join(F.broadcast(qa), "centroid_id")
        .filter(F.col(id_col) != F.col("_qid"))
        .select("_qid", id_col)
    )
    qsub = codes.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("_qid"),
        (F.col("dim") / d_sub).cast("int").alias("_j"),
        (F.col("dim") % d_sub).alias("_p"),
        F.col("code"),
    )
    delta = F.col("code") * F.lit(PQ_SCALE) - F.col("_cent")
    lut = (
        qsub.join(F.broadcast(pq_codebooks), ["_j", "_p"])
        .groupBy("_qid", "_j", "_cid")
        .agg(F.sum(delta * delta).alias("_d2"))
    )
    scored = (
        cand.join(pq_encoded, id_col)
        .join(F.broadcast(lut), ["_qid", "_j", "_cid"])
        .groupBy(F.col("_qid").alias("pid"), F.col(id_col))
        .agg(F.sum("_d2").alias("adc_d2"))
    )
    from pyspark.sql import Window

    shortlist_n = k if rerank_factor is None else rerank_factor * k
    w = Window.partitionBy("pid").orderBy("adc_d2", id_col)
    short = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= shortlist_n)
    )
    if rerank_factor is None:
        return short.select("pid", id_col, "adc_d2", "rk")
    pcodes = codes.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("pid"), F.col("dim"), F.col("code").alias("pcode")
    )
    rdelta = F.col("code") - F.col("pcode")
    rescored = (
        codes.join(F.broadcast(short.select("pid", id_col)), id_col)
        .join(F.broadcast(pcodes), ["pid", "dim"])
        .groupBy("pid", id_col)
        .agg(F.sum(rdelta * rdelta).cast("long").alias("code_d2"))
    )
    w2 = Window.partitionBy("pid").orderBy("code_d2", id_col)
    return (
        rescored.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select("pid", id_col, "code_d2", "rk")
    )
