"""Round-5b gated queries: model-evaluation completion + new sketch ops.

The reference has no ML-evaluation surface (its scope is survey ETL —
SURVEY.md §2); these extend the engine's training-data/modeling family
(tree_ensemble_score / model_auc_exact, round 5) with the rest of the
standard evaluation toolkit, each a full differential oracle:

* ``model_classification_report`` — per-class precision/recall/F1 from
  integer confusion counts (one division per metric, F1 in the
  single-division ``2tp/(2tp+fp+fn)`` form);
* ``model_calibration_bins`` — reliability-diagram bins whose mean
  score is an EXACT float sum (tree-ensemble margins are dyadic
  rationals, so partition-order addition never rounds).

Both reuse the round-5 ``_TREES`` ensemble spec so the scored frame
under evaluation is itself differentially pinned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table
from ffi_etl_spark.queries import query
from ffi_etl_spark.operators.inference import DEMO_TREES as _TREES

# ---------------------------------------------------------------------------
# shared: the scored-events CTE both oracles start from
# ---------------------------------------------------------------------------


def _scored_cte() -> str:
    from ffi_etl_spark.operators.inference import ensemble_to_sql

    margin, predicted = ensemble_to_sql(_TREES, threshold=0.0)
    return f"""feats AS (
  SELECT event_id, value, CAST(event_id % 100 AS DOUBLE) AS idmod,
         CAST(event_type = 'purchase' AS BIGINT) AS y
  FROM events
), scored AS (
  SELECT y, {margin} AS s, CAST({predicted} AS BIGINT) AS p FROM feats
)"""


def _scored_events(spark, sf_dir):
    from ffi_etl_spark.operators.inference import score_ensemble

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "value",
        (F.col("event_id") % 100).cast("double").alias("idmod"),
        (F.col("event_type") == "purchase").alias("label"),
    )
    return score_ensemble(ev, _TREES, keep_cols=("label",))


def _report_oracle() -> str:
    return f"""
WITH {_scored_cte()}, pairs AS (
  SELECT y, p, CAST(COUNT(*) AS BIGINT) AS n FROM scored GROUP BY y, p
), by_true AS (
  SELECT y AS cls, CAST(SUM(n) AS BIGINT) AS support,
         CAST(SUM(CASE WHEN p = y THEN n ELSE 0 END) AS BIGINT) AS tp
  FROM pairs GROUP BY y
), by_pred AS (
  SELECT p AS cls, CAST(SUM(n) AS BIGINT) AS n_pred FROM pairs GROUP BY p
), rep AS (
  SELECT COALESCE(t.cls, q.cls) AS cls,
         COALESCE(t.tp, 0) AS tp,
         COALESCE(q.n_pred, 0) - COALESCE(t.tp, 0) AS fp,
         COALESCE(t.support, 0) - COALESCE(t.tp, 0) AS fn,
         COALESCE(t.support, 0) AS support
  FROM by_true t FULL OUTER JOIN by_pred q ON t.cls = q.cls
)
SELECT CAST(cls AS BIGINT) AS cls, CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
       CAST(support AS BIGINT) AS support,
       CASE WHEN tp + fp > 0
            THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS prec,
       CASE WHEN tp + fn > 0
            THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
       END AS f1
FROM rep
"""


@query("model_classification_report", oracle=_report_oracle())
def _model_classification_report(spark, sf_dir):
    """operators/inference.py::classification_report over the round-5
    tree-ensemble predictions with `is a purchase` as the label — the
    confusion-matrix evaluation completing the scoring/AUC family. All
    counts are BIGINTs from one (label, predicted) aggregate; each
    metric is a single correctly-rounded division (F1 from raw counts,
    not chained P/R), so the doubles hash bit-strictly."""
    from ffi_etl_spark.operators.inference import classification_report

    rep = classification_report(_scored_events(spark, sf_dir))
    return rep.select(
        F.col("class").alias("cls"),
        "tp",
        "fp",
        "fn",
        "support",
        F.col("precision").alias("prec"),
        "recall",
        "f1",
    )


# ---------------------------------------------------------------------------
# Naive Bayes: train + score in one relational plan
# ---------------------------------------------------------------------------


def _nb_oracle() -> str:
    from ffi_etl_spark.operators.features import NB_BUCKETS, NB_SCALE_BITS

    b, s = NB_BUCKETS, float(1 << NB_SCALE_BITS)
    return rf"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
), db AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT % {b} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY doc_id, lang, bucket
), cb AS (
  SELECT lang AS cls, bucket, CAST(SUM(cnt) AS BIGINT) AS n_cb
  FROM db GROUP BY lang, bucket
), tot AS (
  SELECT cls, CAST(SUM(n_cb) AS BIGINT) AS total_c FROM cb GROUP BY cls
), model AS (
  SELECT cb.cls, cb.bucket,
         CAST(FLOOR({s!r} * ln(CAST(n_cb + 1 AS DOUBLE)
              / CAST(total_c + {b} AS DOUBLE))) AS BIGINT) AS q
  FROM cb JOIN tot ON tot.cls = cb.cls
), pri AS (
  SELECT lang AS cls, CAST(COUNT(*) AS BIGINT) AS nd
  FROM documents WHERE text IS NOT NULL GROUP BY lang
), nall AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents WHERE text IS NOT NULL
), consts AS (
  SELECT t.cls,
         CAST(FLOOR({s!r} * ln(1.0 / CAST(t.total_c + {b} AS DOUBLE)))
              AS BIGINT) AS q0,
         CAST(FLOOR({s!r} * ln(CAST(p.nd AS DOUBLE) / CAST(nall.n AS DOUBLE)))
              AS BIGINT) AS prior_q
  FROM tot t JOIN pri p ON p.cls = t.cls CROSS JOIN nall
), scored AS (
  SELECT db.doc_id, db.lang AS actual, c.cls, c.prior_q,
         c.prior_q + CAST(SUM(db.cnt * COALESCE(m.q, c.q0)) AS BIGINT)
           AS score_q
  FROM db CROSS JOIN consts c
  LEFT JOIN model m ON m.cls = c.cls AND m.bucket = db.bucket
  GROUP BY db.doc_id, db.lang, c.cls, c.prior_q
), ranked AS (
  SELECT doc_id, actual, cls, score_q,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score_q DESC, cls DESC) AS rn
  FROM scored
)
SELECT doc_id AS id, actual, cls AS predicted, score_q,
       CAST(cls = actual AS INT) AS correct
FROM ranked WHERE rn = 1
"""


@query("nb_lang_train_score", oracle=_nb_oracle())
def _nb_lang_train_score(spark, sf_dir):
    """operators/features.py::nb_train_score over documents with lang
    as the class — multinomial naive Bayes trained and scored in one
    relational plan (hashing-trick vocabulary, Laplace smoothing).
    Every ln is fixed-point-quantized at the leaf (the round-5
    transcendental rule), so per-doc class scores are exact integer
    sums and the argmax (ties to the larger class string) hashes
    bit-strictly. The oracle replays train AND score end-to-end.

    Expect majority-class predictions HERE: testdata text is
    lang-independent token soup, so the only learnable signal is the
    prior — that is a property of the synthetic corpus, not the
    operator (tests/test_model_eval.py plants a class-distinct
    vocabulary and the same operator scores it 100%)."""
    from ffi_etl_spark.operators.features import nb_train_score

    return nb_train_score(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (per-group, mergeable, cross-engine exact)
# ---------------------------------------------------------------------------


def _hll_oracle() -> str:
    from ffi_etl_spark.operators.sketches import (
        HLL_P,
        HLL_TAIL_BITS,
        hll_scale_constant,
    )

    m, b1 = 1 << HLL_P, HLL_TAIL_BITS + 1
    return f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events
), rb AS (
  SELECT event_type, hv % {m} AS bucket,
         CASE WHEN hv // {m} = 0 THEN {b1}
              ELSE {b1} - length(bin(hv // {m})) END AS r
  FROM h
), regs AS (
  SELECT event_type, bucket, MAX(r) AS reg FROM rb GROUP BY event_type, bucket
), z AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS used_registers,
         CAST(SUM(1::BIGINT << CAST({b1} - reg AS INT)) AS BIGINT) AS zp
  FROM regs GROUP BY event_type
), ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT z.event_type, used_registers,
       CAST({m} - used_registers AS BIGINT) AS n_zero,
       CAST(zp + ({m} - used_registers) * (1::BIGINT << {b1}) AS BIGINT)
         AS z_scaled,
       {hll_scale_constant()!r}
         / CAST(zp + ({m} - used_registers) * (1::BIGINT << {b1}) AS DOUBLE)
         AS hll_estimate,
       CASE WHEN {m} - used_registers > 0
            THEN printf('%.6e', {float(m)!r}
                 * ln({float(m)!r} / CAST({m} - used_registers AS DOUBLE)))
       END AS lc_estimate_s,
       exact_distinct
FROM z JOIN ex ON ex.event_type = z.event_type
"""


@query("hll_distinct_sketch", oracle=_hll_oracle())
def _hll_distinct_sketch(spark, sf_dir):
    """operators/sketches.py::hll_registers + hll_estimate — per-
    event-type HyperLogLog distinct-user sketch beside the exact
    count. The register table is integer-exact and engine-portable
    (md5 bits, bin()-length ranks), Z accumulates as shifted BIGINTs
    under any order, and the estimate is one division by an exact
    integer — so the raw double hashes bit-strictly. exact_distinct
    rides along to expose the sketch error honestly (KMV covers
    set-algebra merges; HLL is the fixed-memory per-group workhorse:
    1024 registers regardless of cardinality)."""
    from ffi_etl_spark.operators.sketches import hll_estimate, hll_registers

    ev = table(spark, sf_dir, "events")
    regs = hll_registers(ev, "user_id", ("event_type",))
    est = hll_estimate(regs, ("event_type",))
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "event_type")


_CAL_LO, _CAL_HI, _CAL_BINS = -1.0, 2.0, 12


def _calibration_oracle() -> str:
    width = (_CAL_HI - _CAL_LO) / _CAL_BINS
    return f"""
WITH {_scored_cte()}, binned AS (
  SELECT CAST(GREATEST(0, LEAST({_CAL_BINS - 1},
              FLOOR((s - ({_CAL_LO!r})) / {width!r}))) AS BIGINT) AS bin,
         s, y
  FROM scored
)
SELECT bin,
       {_CAL_LO!r} + CAST(bin AS DOUBLE) * {width!r} AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       SUM(s) / CAST(COUNT(*) AS DOUBLE) AS mean_score,
       CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS frac_pos
FROM binned GROUP BY bin
"""


@query("model_calibration_bins", oracle=_calibration_oracle())
def _model_calibration_bins(spark, sf_dir):
    """operators/inference.py::calibration_bins over the tree-ensemble
    margin — reliability-diagram evaluation. Exactness argument: the
    margins are dyadic rationals (leaf outputs are multiples of 2^-4),
    so SUM(margin) is exact under any partition order and mean_score
    is one final division; the bin index is exact dyadic arithmetic
    (width 0.25). frac_pos is an integer ratio. Hence raw doubles in
    the gated output, hashed bit-strictly."""
    from ffi_etl_spark.operators.inference import calibration_bins

    return calibration_bins(
        _scored_events(spark, sf_dir),
        lo=_CAL_LO,
        hi=_CAL_HI,
        n_bins=_CAL_BINS,
    )


# ---------------------------------------------------------------------------
# Unigram-LM Viterbi segmentation (tokenizer-family completion)
# ---------------------------------------------------------------------------


def _uni_dp_chain(prefix: str, vocab_cte: str, base_cte: str) -> tuple[str, str]:
    """(rounds_sql, finals_sql) for one unrolled Viterbi chain whose
    round CTEs are named ``{prefix}{r}`` over the given vocab CTE —
    shared by the seed oracle and the EM refit's second chain."""
    from ffi_etl_spark.operators.tokenizer import UNI_MAX_PIECE, UNI_MAX_WORD

    mp = UNI_MAX_PIECE
    rounds = []
    for r in range(1, UNI_MAX_WORD + 1):
        branches = []
        for j in range(max(0, r - mp), r):
            src = f"{prefix}{j}" if j else base_cte
            branches.append(f"""
      SELECT {src}.w, {src}.wlen, {src}.score + v.score_q AS total,
             {src}.n + 1 AS n2,
             CASE WHEN {src}.path = '' THEN v.piece
                  ELSE {src}.path || ' ' || v.piece END AS path2,
             {j} AS j
      FROM {src} JOIN {vocab_cte} v ON v.piece = substr({src}.w, {j + 1}, {r - j})
      WHERE {src}.wlen >= {r}""")
        union = "\n      UNION ALL".join(branches)
        rounds.append(f"""{prefix}{r} AS MATERIALIZED (
  SELECT w, wlen, total AS score, n2 AS n, path2 AS path FROM (
    SELECT c.*, ROW_NUMBER() OVER (PARTITION BY w
                                   ORDER BY total DESC, j DESC) AS rn
    FROM ({union}
    ) c
  ) WHERE rn = 1
)""")
    finals = "\n  UNION ALL ".join(
        f"SELECT * FROM {prefix}{r} WHERE wlen = {r}"
        for r in range(1, UNI_MAX_WORD + 1)
    )
    return ",\n".join(rounds), finals


def _unigram_oracle() -> str:
    from ffi_etl_spark.operators.tokenizer import (
        UNI_MAX_PIECE,
        UNI_MAX_WORD,
        UNI_SCALE_BITS,
        UNI_VOCAB,
    )

    s, mp, wcap, vcap = float(1 << UNI_SCALE_BITS), UNI_MAX_PIECE, 5000, UNI_VOCAB
    rounds_sql, finals = _uni_dp_chain("s", "vocab", "s0")
    return rf"""
WITH raw AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS raw FROM documents
), lex AS MATERIALIZED (
  SELECT substr(raw, 1, {UNI_MAX_WORD}) AS w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM raw WHERE raw <> '' GROUP BY 1
  ORDER BY freq DESC, w LIMIT {wcap}
), spans AS (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT l.freq, substr(l.w, j.j, s.l) AS piece
    FROM lex l
    CROSS JOIN (SELECT unnest(generate_series(1, {UNI_MAX_WORD})) AS j) j
    CROSS JOIN (SELECT unnest(generate_series(1, {mp})) AS l) s
    WHERE j.j + s.l - 1 <= length(l.w)
  ) GROUP BY piece
), topv AS MATERIALIZED (
  SELECT piece, cnt FROM spans ORDER BY cnt DESC, piece LIMIT {vcap}
), chars AS (
  SELECT piece, cnt FROM spans WHERE length(piece) = 1
), vocab0 AS (
  SELECT piece, MAX(cnt) AS cnt
  FROM (SELECT * FROM topv UNION ALL SELECT * FROM chars) GROUP BY piece
), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vocab0),
vocab AS MATERIALIZED (
  SELECT piece,
         CAST(FLOOR({s!r} * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)))
              AS BIGINT) AS score_q
  FROM vocab0 CROSS JOIN tot
), s0 AS MATERIALIZED (
  SELECT w, CAST(length(w) AS INT) AS wlen, CAST(0 AS BIGINT) AS score,
         CAST(0 AS BIGINT) AS n, '' AS path
  FROM lex
), {rounds_sql}, res AS (
  {finals}
)
SELECT w, CAST(wlen AS INT) AS wlen, CAST(n AS BIGINT) AS n_pieces,
       CAST(score AS BIGINT) AS score_q, path AS segmentation
FROM res
"""


@query("unigram_lm_segment", oracle=_unigram_oracle())
def _unigram_lm_segment(spark, sf_dir):
    """operators/tokenizer.py::unigram_viterbi_segment over documents —
    the SentencePiece-unigram counterpart to bpe_learn_merges/
    bpe_encode: frequency-seeded piece vocabulary (quantized-ln
    scores, single-char fallback for coverage), then a Viterbi DP over
    DISTINCT words that unrolls statically into ≤16 rounds because
    words are length-capped. All DP arithmetic is integer (quantized
    leaf scores), ties break on (total, last-split) — the oracle
    replays lexicon, vocabulary, and all 16 rounds as materialized
    CTEs, so the full segmentation table hashes bit-strictly."""
    from ffi_etl_spark.operators.tokenizer import unigram_viterbi_segment

    out = unigram_viterbi_segment(table(spark, sf_dir, "documents"))
    return out.withColumn("wlen", F.col("wlen").cast("int"))


# ---------------------------------------------------------------------------
# Quantile-summary compaction (the maintenance step for streamed parts)
# ---------------------------------------------------------------------------

_QSC_SHARDS, _QSC_K, _QSC_STRIDE = 8, 64, 4
# pre-compaction estimate error ≤ k(S−1); stride spacing adds ≤ k·stride
_QSC_BAND = _QSC_K * (_QSC_SHARDS - 1) + _QSC_K * _QSC_STRIDE
_QSC_QUANTILES = (0.25, 0.5, 0.9)


def _qsc_oracle() -> str:
    targets = "\nUNION ALL ".join(
        f"SELECT 'p{int(q * 100)}' AS q_label, "
        f"CAST(CEIL({q} * n) AS BIGINT) AS target_rank FROM tot"
        for q in _QSC_QUANTILES
    )
    return f"""
WITH ev AS (
  SELECT value, event_id FROM events
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev
), sharded AS (
  SELECT value, event_id,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
           % {_QSC_SHARDS} AS shard
  FROM ev
), ranked AS (
  SELECT value, event_id, shard,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY value, event_id)
           AS shard_rank,
         COUNT(*) OVER (PARTITION BY shard) AS shard_n
  FROM sharded
), summ AS MATERIALIZED (
  SELECT shard, value, event_id, shard_rank FROM ranked
  WHERE shard_rank % {_QSC_K} = 0 OR shard_rank = shard_n
), est AS MATERIALIZED (
  SELECT a.value, a.event_id,
         CAST(a.shard_rank + {_QSC_K} * COUNT(b.shard) AS BIGINT) AS est_rank
  FROM summ a LEFT JOIN summ b
    ON b.shard <> a.shard
   AND (b.value < a.value OR (b.value = a.value AND b.event_id < a.event_id))
  GROUP BY a.value, a.event_id, a.shard_rank
), numbered AS (
  SELECT value, event_id, est_rank,
         ROW_NUMBER() OVER (ORDER BY est_rank, value, event_id) AS rn,
         COUNT(*) OVER () AS nt
  FROM est
), compacted AS MATERIALIZED (
  SELECT value, event_id, est_rank AS shard_rank FROM numbered
  WHERE rn % {_QSC_STRIDE} = 0 OR rn = nt
), targets AS (
  {targets}
), scored AS (
  SELECT t.q_label, t.target_rank, c.value, c.event_id, c.shard_rank AS est_rank,
         ROW_NUMBER() OVER (
           PARTITION BY t.q_label
           ORDER BY abs(c.shard_rank - t.target_rank), c.value, c.event_id
         ) AS rk
  FROM compacted c CROSS JOIN targets t
), chosen AS MATERIALIZED (
  SELECT q_label, target_rank, value, event_id, est_rank FROM scored WHERE rk = 1
), truth AS (
  SELECT c.q_label, CAST(COUNT(*) AS BIGINT) AS true_rank
  FROM ev CROSS JOIN chosen c
  WHERE ev.value < c.value OR (ev.value = c.value AND ev.event_id <= c.event_id)
  GROUP BY c.q_label
)
SELECT c.q_label, c.value AS est_value, c.est_rank, c.target_rank, t.true_rank,
       CAST(abs(t.true_rank - c.target_rank) <= {_QSC_BAND} AS INT) AS band_ok
FROM chosen c JOIN truth t USING (q_label)
ORDER BY q_label
"""


@query("quantile_summary_compact", oracle=_qsc_oracle())
def _quantile_summary_compact(spark, sf_dir):
    """operators/sketches.py::compact_quantile_summary — merge the
    8-shard summary into ONE coarser part (stride 4) and answer
    quantiles from the compacted table: the maintenance step that
    keeps a long-running stream's part count (and therefore its error
    bound) from growing without rebuilding from raw data. The whole
    pipeline — shard ranks, every-k-th sampling, integer rank
    estimation, stride filter, nearest-rank answer, exact-rank truth —
    replays in SQL, and the band flag pins the documented error bound
    k(S−1) + k·stride with exact integer ranks."""
    from ffi_etl_spark.operators.sketches import (
        compact_quantile_summary,
        quantile_summary,
        quantile_summary_query,
    )

    ev = table(spark, sf_dir, "events")
    summ = quantile_summary(ev, n_shards=_QSC_SHARDS, k=_QSC_K)
    comp = compact_quantile_summary(summ, k=_QSC_K, stride=_QSC_STRIDE)
    n = ev.agg(F.count(F.lit(1)).cast("long").alias("n"))
    res = quantile_summary_query(
        comp, n, list(_QSC_QUANTILES), k=_QSC_K, part_cols=("part",)
    )
    truth = (
        ev.select(F.col("value").alias("_v"), F.col("event_id").alias("_e"))
        .crossJoin(F.broadcast(res))
        .where(
            (F.col("_v") < F.col("est_value"))
            | ((F.col("_v") == F.col("est_value")) & (F.col("_e") <= F.col("est_id")))
        )
        .groupBy("q_label", "est_value", "est_rank", "target_rank")
        .agg(F.count(F.lit(1)).cast("long").alias("true_rank"))
    )
    return truth.select(
        "q_label",
        "est_value",
        "est_rank",
        "target_rank",
        "true_rank",
        (F.abs(F.col("true_rank") - F.col("target_rank")) <= F.lit(_QSC_BAND))
        .cast("int")
        .alias("band_ok"),
    ).orderBy("q_label")


# ---------------------------------------------------------------------------
# Isotonic calibration of the reliability bins (closed-form PAVA)
# ---------------------------------------------------------------------------


def _isotonic_oracle() -> str:
    width = (_CAL_HI - _CAL_LO) / _CAL_BINS
    return f"""
WITH {_scored_cte()}, binned AS (
  SELECT CAST(GREATEST(0, LEAST({_CAL_BINS - 1},
              FLOOR((s - ({_CAL_LO!r})) / {width!r}))) AS BIGINT) AS bin,
         s, y
  FROM scored
), b AS (
  SELECT bin,
         {_CAL_LO!r} + CAST(bin AS DOUBLE) * {width!r} AS bin_lo,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         SUM(s) / CAST(COUNT(*) AS DOUBLE) AS mean_score,
         CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS frac_pos
  FROM binned GROUP BY bin
), cums AS (
  SELECT bin, CAST(ROW_NUMBER() OVER (ORDER BY bin) AS BIGINT) AS t,
         CAST(SUM(n_pos) OVER (ORDER BY bin) AS BIGINT) AS cp,
         CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cn
  FROM b
), bounds AS (
  SELECT t, cp, cn FROM cums
  UNION ALL SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
), ivals AS (
  SELECT i0.t + 1 AS i, j.t AS j,
         CAST(j.cp - i0.cp AS DOUBLE) / CAST(j.cn - i0.cn AS DOUBLE) AS avg
  FROM cums j JOIN bounds i0 ON i0.t < j.t
), inner_min AS (
  SELECT ts.t, ivals.i, MIN(avg) AS m
  FROM ivals JOIN cums ts ON ivals.i <= ts.t AND ivals.j >= ts.t
  GROUP BY ts.t, ivals.i
), iso AS (
  SELECT t, MAX(m) AS iso_rate FROM inner_min GROUP BY t
)
SELECT b.bin, b.bin_lo, b.n, b.n_pos, b.mean_score, b.frac_pos, iso.iso_rate
FROM b JOIN cums ON cums.bin = b.bin JOIN iso ON iso.t = cums.t
"""


@query("model_isotonic_calibration", oracle=_isotonic_oracle())
def _model_isotonic_calibration(spark, sf_dir):
    """operators/inference.py::isotonic_calibrate over the reliability
    bins — PAVA computed in its closed minimax form (max over i≤t of
    min over j≥t of the interval positive rate): cumsum differences
    are exact integers, each interval average is one correctly-rounded
    division, and min/max merely SELECT among those doubles, so the
    monotone fit hashes bit-strictly. Quadratic in the bin count only;
    the corpus collapsed in calibration_bins."""
    from ffi_etl_spark.operators.inference import (
        calibration_bins,
        isotonic_calibrate,
    )

    bins = calibration_bins(
        _scored_events(spark, sf_dir), lo=_CAL_LO, hi=_CAL_HI, n_bins=_CAL_BINS
    )
    return isotonic_calibrate(bins)


# ---------------------------------------------------------------------------
# Sparse tf-idf cosine retrieval ("more like this")
# ---------------------------------------------------------------------------

_MLT_QUERY_DOC, _MLT_K, _MLT_BITS = 0, 25, 10


def _mlt_oracle() -> str:
    s = float(1 << _MLT_BITS)
    return rf"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY id, term
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
), weights AS MATERIALIZED (
  SELECT tf.id, tf.term,
         tf.tf * CAST(FLOOR({s!r} *
           ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
            / (CAST(df AS DOUBLE) + 0.5))) AS BIGINT) AS w
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
), qvec AS (
  SELECT term, w AS qw FROM weights WHERE id = {_MLT_QUERY_DOC}
), norms AS (
  SELECT id, CAST(SUM(w * w) AS BIGINT) AS norm2 FROM weights GROUP BY id
), qnorm AS (
  SELECT norm2 AS qnorm2 FROM norms WHERE id = {_MLT_QUERY_DOC}
), dots AS (
  SELECT w.id, CAST(COUNT(*) AS BIGINT) AS n_shared,
         CAST(SUM(w.w * q.qw) AS BIGINT) AS dot
  FROM weights w JOIN qvec q USING (term)
  WHERE w.id <> {_MLT_QUERY_DOC}
  GROUP BY w.id
)
SELECT d.id, d.n_shared, d.dot, nm.norm2,
       CAST(d.dot AS DOUBLE) / (sqrt(CAST(nm.norm2 AS DOUBLE))
                                * sqrt(CAST(q.qnorm2 AS DOUBLE))) AS cosine
FROM dots d JOIN norms nm USING (id) CROSS JOIN qnorm q
ORDER BY cosine DESC, id LIMIT {_MLT_K}
"""


@query("sparse_cosine_mlt", oracle=_mlt_oracle())
def _sparse_cosine_mlt(spark, sf_dir):
    """operators/textops.py::more_like_this — exact sparse tf-idf
    cosine retrieval anchored on doc 0, the lexical counterpart to
    knn_bruteforce. Weights are integers (tf × floor-quantized
    RATIONAL idf — no transcendental anywhere), dots/norms exact
    BIGINTs, cosine three IEEE-correctly-rounded float ops (sqrt is a
    basic op, not a transcendental) — so even the ORDER BY cosine
    LIMIT k is cross-engine stable and the gate hashes raw doubles."""
    from ffi_etl_spark.operators.textops import more_like_this

    return more_like_this(
        table(spark, sf_dir, "documents"),
        query_id=_MLT_QUERY_DOC,
        k=_MLT_K,
        idf_bits=_MLT_BITS,
    )


# ---------------------------------------------------------------------------
# Entity resolution: fuzzy pairs -> clusters -> golden records
# ---------------------------------------------------------------------------

_ER_ORACLE = """
WITH RECURSIVE names AS (
  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n,
         split_part(p_name, ' ', 1) AS blk
  FROM part GROUP BY p_name
), pairs AS (
  SELECT a.p_name AS na, b.p_name AS nb
  FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= 3
), edges AS (
  SELECT na AS a, nb AS b FROM pairs UNION ALL SELECT nb, na FROM pairs
), verts AS (
  SELECT DISTINCT a AS v FROM edges
), reach(v, m) AS (
  SELECT v, v FROM verts
  UNION
  SELECT e.b, r.m FROM reach r JOIN edges e ON e.a = r.v
), comp AS (
  SELECT v AS p_name, MIN(m) AS component FROM reach GROUP BY v
), allc AS (
  SELECT n.p_name, COALESCE(c.component, n.p_name) AS entity_id, n.n
  FROM names n LEFT JOIN comp c ON c.p_name = n.p_name
), ranked AS (
  SELECT entity_id, p_name, n,
         ROW_NUMBER() OVER (PARTITION BY entity_id
                            ORDER BY n DESC, p_name) AS rk
  FROM allc
), golden AS (
  SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS cluster_size,
         CAST(SUM(n) AS BIGINT) AS total_n
  FROM allc GROUP BY entity_id
)
SELECT g.entity_id, r.p_name AS canonical, g.cluster_size, g.total_n
FROM golden g JOIN ranked r ON r.entity_id = g.entity_id AND r.rk = 1
"""


@query("entity_resolution_golden", oracle=_ER_ORACLE)
def _entity_resolution_golden(spark, sf_dir):
    """The RESOLUTION step completing fuzzy_match_blocked's matching:
    blocked levenshtein pairs -> connected components (operators/
    graph.py alternating-star rounds; the oracle's recursive-CTE
    min-reachable-label is the same fixpoint) -> one golden record per
    entity by frequency-then-name survivorship (min over the
    (-n, name) struct — deterministic both engines). Unmatched names
    stay singleton entities via the left join. Same 100 TB shape as
    the matcher: the corpus collapses to distinct names first, the
    quadratic work is per-block, and survivorship is one aggregate."""
    from ffi_etl_spark.operators.graph import connected_components

    names = (
        table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("blk", F.split("p_name", " ")[0])
    )
    a, b = names.alias("a"), names.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 3)
        .select(
            F.col("a.p_name").alias("id_a"), F.col("b.p_name").alias("id_b")
        )
    )
    comp = connected_components(pairs).withColumnsRenamed(
        {"vertex": "p_name", "component": "entity_id"}
    )
    allc = names.join(comp, "p_name", "left").select(
        "p_name",
        F.coalesce(F.col("entity_id"), F.col("p_name")).alias("entity_id"),
        "n",
    )
    return allc.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
        F.sum("n").cast("long").alias("total_n"),
        F.min(F.struct((-F.col("n")).alias("nn"), F.col("p_name").alias("nm")))
        .getField("nm")
        .alias("canonical"),
    ).select("entity_id", "canonical", "cluster_size", "total_n")


# ---------------------------------------------------------------------------
# Time-series evaluation: seasonal-naive backtest + OLS daily trend
# ---------------------------------------------------------------------------

_WAPE_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), scored AS (
  SELECT a.event_type, a.d, a.y, f.y AS fc
  FROM daily a JOIN daily f
    ON f.event_type = a.event_type AND f.d = a.d - INTERVAL 7 DAY
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(ABS(y - fc)) AS BIGINT) AS sum_abs_err,
       CAST(SUM(y) AS BIGINT) AS sum_actual,
       CAST(SUM(ABS(y - fc)) AS DOUBLE) / CAST(SUM(y) AS DOUBLE) AS wape
FROM scored GROUP BY event_type
"""


@query("forecast_backtest_wape", oracle=_WAPE_ORACLE)
def _forecast_backtest_wape(spark, sf_dir):
    """Seasonal-naive forecast backtest per event type: forecast(d) =
    actual(d−7), scored on every day with a week-ago predecessor, with
    WAPE = Σ|y−ŷ| / Σy — the sum-ratio form (NOT per-day MAPE means,
    which would accumulate floats): both sums are exact BIGINTs of
    daily counts, the metric one division, so raw doubles hash
    bit-strictly. The shape a forecasting pipeline runs to decide if a
    model beats the seasonal baseline — two K-row aggregates + one
    K-row self-join, corpus touched once."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    f = daily.select(
        F.col("event_type"),
        F.date_add(F.col("d"), 7).alias("d"),
        F.col("y").alias("fc"),
    )
    scored = daily.join(f, ["event_type", "d"])
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.abs(F.col("y") - F.col("fc"))).cast("long").alias("sum_abs_err"),
        F.sum("y").cast("long").alias("sum_actual"),
        (
            F.sum(F.abs(F.col("y") - F.col("fc"))).cast("double")
            / F.sum("y").cast("double")
        ).alias("wape"),
    )


_OLS_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM daily GROUP BY event_type
)
SELECT event_type, n,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
         CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
       END AS slope,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
         (CAST(sy AS DOUBLE)
          - (CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE)
       END AS intercept
FROM s
"""


@query("daily_trend_ols", oracle=_OLS_ORACLE)
def _daily_trend_ols(spark, sf_dir):
    """Per-event-type OLS of daily volume against the epoch-day index:
    slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) from EXACT integer moment
    sums (day index × count products stay far inside BIGINT), one
    division; the intercept re-derives through the same slope double
    with a fixed op sequence (sub, mul, div — all IEEE-correctly
    rounded), so both doubles are bit-identical cross-engine. NULL
    slope for a single-day series (degenerate denominator). The
    regression a monitoring pipeline fits to thousands of series at
    once — one K-row aggregate after the daily rollup."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("x"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / den.cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "event_type",
        "n",
        F.when(den != 0, slope).alias("slope"),
        F.when(den != 0, intercept).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Bloom filter build + membership audit (deterministic, cross-engine)
# ---------------------------------------------------------------------------

_BF_M, _BF_K = 1 << 13, 3  # 8192 bits, 3 md5-salted hash rows
# members = customers ordering in one month — a SELECTIVE set, so the
# probe population has real negatives and the measured FPR means
# something (at sf0.1 the filter runs at ~0.2 load -> ~10% expected
# FPR, deliberately: the audit DETECTS an undersized filter; size m
# up for production use)
_BF_MEMBER_PRED = "o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-02-01'"


def _bf_oracle() -> str:
    probe_bits = " AND ".join(
        f"EXISTS (SELECT 1 FROM bits WHERE bit ="
        f" ('0x' || substr(md5('bf{j}_' || CAST(c.c_custkey AS VARCHAR)), 1, 8))::BIGINT % {_BF_M})"
        for j in range(_BF_K)
    )
    member_bits = "\nUNION ALL ".join(
        f"SELECT ('0x' || substr(md5('bf{j}_' || CAST(k AS VARCHAR)), 1, 8))::BIGINT % {_BF_M} AS bit FROM members"
        for j in range(_BF_K)
    )
    pred = _BF_MEMBER_PRED
    return f"""
WITH members AS (
  SELECT DISTINCT o_custkey AS k FROM orders WHERE {pred}
), bits AS (
  SELECT DISTINCT bit FROM ({member_bits})
), probed AS (
  SELECT c.c_custkey,
         CAST(({probe_bits}) AS INT) AS claimed,
         CAST(EXISTS (SELECT 1 FROM members m WHERE m.k = c.c_custkey) AS INT)
           AS actual
  FROM customer c
)
SELECT CAST((SELECT COUNT(*) FROM members) AS BIGINT) AS n_members,
       CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_bits_set,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(actual) AS BIGINT) AS n_present,
       CAST(SUM(claimed) AS BIGINT) AS n_claimed,
       CAST(SUM(CASE WHEN claimed = 1 AND actual = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       CAST(SUM(CASE WHEN claimed = 0 AND actual = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_neg,
       CASE WHEN COUNT(*) - SUM(actual) > 0 THEN
         CAST(SUM(CASE WHEN claimed = 1 AND actual = 0 THEN 1 ELSE 0 END)
              AS DOUBLE) / CAST(COUNT(*) - SUM(actual) AS DOUBLE)
       END AS fpr
FROM probed
"""


@query("bloom_filter_audit", oracle=_bf_oracle())
def _bloom_filter_audit(spark, sf_dir):
    """Deterministic Bloom filter over customers-with-orders, audited
    against ground truth: ``n_false_neg`` is structurally 0 (the Bloom
    guarantee — gate-pinned, not assumed) and the measured false-
    positive rate is one division of exact counts. Bits are md5-salted
    buckets (the count-min idiom), so the filter an engine builds is
    byte-reproducible anywhere — unlike Spark's session-private
    ``bloom_filter_agg`` (which remains the production fast lane,
    session.BLOOM_JOIN_CONFS). Shape: the member set collapses to ≤k·n
    distinct bit rows (broadcastable); probing is a scan-side
    semi-join per hash row — the explicit form of runtime-filter
    pruning at 100 TB."""
    from ffi_etl_spark.functions.hashing import md5_int32

    def bit(col, j):
        return md5_int32(F.concat(F.lit(f"bf{j}_"), col.cast("string"))) % _BF_M

    from pyspark import StorageLevel

    members = (
        table(spark, sf_dir, "orders")
        .where(F.expr(_BF_MEMBER_PRED))
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        # feeds the k bit branches, the truth join, and the count —
        # pin the shared aggregate (round-5 lesson d)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bits = None
    for j in range(_BF_K):
        b = members.select(bit(F.col("k"), j).alias("bit"))
        bits = b if bits is None else bits.unionByName(b)
    bits = bits.distinct().persist(StorageLevel.MEMORY_AND_DISK)

    cust = table(spark, sf_dir, "customer").select("c_custkey")
    probed = cust
    for j in range(_BF_K):
        probed = probed.join(
            F.broadcast(bits.withColumnRenamed("bit", f"_b{j}")),
            bit(F.col("c_custkey"), j) == F.col(f"_b{j}"),
            "left",
        )
    claimed = None
    for j in range(_BF_K):
        c = F.col(f"_b{j}").isNotNull()
        claimed = c if claimed is None else (claimed & c)
    probed = probed.join(
        members.withColumnRenamed("k", "_mk"),
        F.col("c_custkey") == F.col("_mk"),
        "left",
    ).select(
        claimed.cast("int").alias("claimed"),
        F.col("_mk").isNotNull().cast("int").alias("actual"),
    )
    n_members = members.agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    n_bits = bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    agg = probed.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum("actual").cast("long").alias("n_present"),
        F.sum("claimed").cast("long").alias("n_claimed"),
        F.sum(((F.col("claimed") == 1) & (F.col("actual") == 0)).cast("int"))
        .cast("long")
        .alias("n_false_pos"),
        F.sum(((F.col("claimed") == 0) & (F.col("actual") == 1)).cast("int"))
        .cast("long")
        .alias("n_false_neg"),
    )
    return agg.crossJoin(F.broadcast(n_members)).crossJoin(
        F.broadcast(n_bits)
    ).select(
        "n_members",
        "n_bits_set",
        "n_probes",
        "n_present",
        "n_claimed",
        "n_false_pos",
        "n_false_neg",
        F.when(
            F.col("n_probes") - F.col("n_present") > 0,
            F.col("n_false_pos").cast("double")
            / (F.col("n_probes") - F.col("n_present")).cast("double"),
        ).alias("fpr"),
    )


# ---------------------------------------------------------------------------
# Statistical inference: Wilson proportion CIs + chi-square independence
# ---------------------------------------------------------------------------

_WILSON_Z = 1.96  # 95% two-sided


def _wilson_oracle() -> str:
    z = _WILSON_Z
    return f"""
WITH g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE value > 50.0) AS BIGINT) AS k
  FROM events GROUP BY event_type
), p AS (
  SELECT event_type, n, k,
         CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS phat,
         {z!r} * {z!r} / CAST(n AS DOUBLE) AS zzn
  FROM g
)
SELECT event_type, n, k, phat,
       ((phat + zzn / 2.0)
        - {z!r} * sqrt((phat * (1.0 - phat) + zzn / 4.0) / CAST(n AS DOUBLE)))
       / (1.0 + zzn) AS wilson_lo,
       ((phat + zzn / 2.0)
        + {z!r} * sqrt((phat * (1.0 - phat) + zzn / 4.0) / CAST(n AS DOUBLE)))
       / (1.0 + zzn) AS wilson_hi
FROM p
"""


@query("conversion_wilson_ci", oracle=_wilson_oracle())
def _conversion_wilson_ci(spark, sf_dir):
    """Per-event-type proportion (share of value>50 events) with the
    95% Wilson score interval — the interval estimate an experiment
    readout needs (Wilson, not Wald: behaves at extreme p̂ and small
    n). Bit-exact cross-engine with NO flake budget: p̂ is one
    division of exact counts, and the bound formula is a fixed
    sequence of +,−,×,÷,sqrt — all IEEE-correctly-rounded basic ops
    (the more_like_this sqrt rule; nothing transcendental). One K-row
    aggregate over one scan."""
    z = _WILSON_Z
    g = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_if(F.col("value") > 50.0).cast("long").alias("k"),
        )
    )
    phat = F.col("k").cast("double") / F.col("n").cast("double")
    zzn = F.lit(z * z) / F.col("n").cast("double")
    rad = F.lit(z) * F.sqrt(
        (phat * (F.lit(1.0) - phat) + zzn / F.lit(4.0)) / F.col("n").cast("double")
    )
    center = phat + zzn / F.lit(2.0)
    denom = F.lit(1.0) + zzn
    return g.select(
        "event_type",
        "n",
        "k",
        phat.alias("phat"),
        ((center - rad) / denom).alias("wilson_lo"),
        ((center + rad) / denom).alias("wilson_hi"),
    )


_CHI2_BITS = 20


def _chi2_oracle() -> str:
    s = float(1 << _CHI2_BITS)
    return f"""
WITH cells AS (
  SELECT event_type AS r, CAST(value > 50.0 AS INT) AS c,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY event_type, CAST(value > 50.0 AS INT)
), margins AS (
  SELECT r, CAST(SUM(o) AS BIGINT) AS nr FROM cells GROUP BY r
), cmargins AS (
  SELECT c, CAST(SUM(o) AS BIGINT) AS nc FROM cells GROUP BY c
), tot AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells
), terms AS (
  SELECT cells.r, cells.c,
         CAST(FLOOR({s!r} *
           (CAST((cells.o * tot.n - margins.nr * cmargins.nc) AS DOUBLE)
            * CAST((cells.o * tot.n - margins.nr * cmargins.nc) AS DOUBLE)
            / (CAST(tot.n AS DOUBLE) * CAST(margins.nr AS DOUBLE)
               * CAST(cmargins.nc AS DOUBLE)))) AS BIGINT) AS term_q
  FROM cells
  JOIN margins ON margins.r = cells.r
  JOIN cmargins ON cmargins.c = cells.c
  CROSS JOIN tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(term_q) AS BIGINT) AS chi2_q,
       CAST(SUM(term_q) AS DOUBLE) / {s!r} AS chi2
FROM terms
"""


@query("chi2_independence", oracle=_chi2_oracle())
def _chi2_independence(spark, sf_dir):
    """Chi-square independence test for event_type × (value>50) —
    ``Σ (O·N − r·c)² / (N·r·c)`` (the margins-multiplied form: every
    numerator an exact BIGINT). Each cell's term is a deterministic
    double (integer-exact operands, fixed op sequence) FIXED-POINT
    QUANTIZED before the sum (floor(2^20·term) — the transcendental-
    rule trick applied to an order-dependent float SUM), so the
    statistic is an exact integer plus one final exact power-of-two
    division. p-values need the chi² CDF (transcendental) — callers
    compare chi2 against critical-value literals instead. Two K-row
    aggregates over one scan."""
    s = float(1 << _CHI2_BITS)
    cells = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("r"),
            (F.col("value") > 50.0).cast("int").alias("c"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    from pyspark import StorageLevel

    cells = cells.persist(StorageLevel.MEMORY_AND_DISK)
    margins = cells.groupBy("r").agg(F.sum("o").cast("long").alias("nr"))
    cmargins = cells.groupBy("c").agg(F.sum("o").cast("long").alias("nc"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    num = F.col("o") * F.col("n") - F.col("nr") * F.col("nc")
    term = (
        num.cast("double")
        * num.cast("double")
        / (
            F.col("n").cast("double")
            * F.col("nr").cast("double")
            * F.col("nc").cast("double")
        )
    )
    terms = (
        cells.join(F.broadcast(margins), "r")
        .join(F.broadcast(cmargins), "c")
        .crossJoin(F.broadcast(tot))
        .select(F.floor(F.lit(s) * term).cast("long").alias("term_q"))
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("term_q").cast("long").alias("chi2_q"),
        (F.sum("term_q").cast("double") / F.lit(s)).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Incremental JOIN maintenance (the join-side IVM companion)
# ---------------------------------------------------------------------------

_IVMJ_ORACLE = """
WITH dim_now AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
              ELSE c_acctbal END AS c_acctbal
  FROM customer
)
SELECT o.o_orderkey, o.o_custkey, d.c_name, d.c_acctbal
FROM orders o JOIN dim_now d ON d.c_custkey = o.o_custkey
"""


@query("incremental_join_maintenance", oracle=_IVMJ_ORACLE)
def _incremental_join_maintenance(spark, sf_dir):
    """operators/ivm.py::maintain_fact_dim_join — the join-side IVM
    story beside incremental_agg_maintenance's aggregates: a stored
    orders⋈customer join absorbs (a) a fact delta (orders with key%10
    = 0, arriving 'tonight') via Δ⋈dim and (b) a dimension update
    (every 7th customer's balance +100) by re-decorating stored rows
    from their OWN fact columns — the orders history is never
    rescanned. The gate is the maintenance identity itself: the
    maintained table must hash-equal the oracle's full recompute of
    (all orders)⋈(current dim). Like the agg-IVM gate, the bench-side
    cost here deliberately builds both halves live; steady state only
    pays the delta half."""
    from ffi_etl_spark.operators.ivm import maintain_fact_dim_join

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    dim_old = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    dim_now = dim_old.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + F.lit(100.0)
        ).otherwise(F.col("c_acctbal")),
    )
    fact_old = orders.where(F.col("o_orderkey") % 10 != 0)
    fact_delta = orders.where(F.col("o_orderkey") % 10 == 0)
    # "stored": yesterday's materialized join (built live here; in
    # production this is a parquet/Delta table read back)
    stored = fact_old.join(
        F.broadcast(dim_old), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "c_custkey", "c_name", "c_acctbal")
    out = maintain_fact_dim_join(
        stored,
        fact_delta.withColumnRenamed("o_custkey", "c_custkey"),
        dim_now,
        keys=("c_custkey",),
    )
    return out.select(
        "o_orderkey",
        F.col("c_custkey").alias("o_custkey"),
        "c_name",
        "c_acctbal",
    )


# ---------------------------------------------------------------------------
# MMR diversity-aware top-k (quantized code space)
# ---------------------------------------------------------------------------

_MMR_PROBE, _MMR_CANDS, _MMR_K = 0, 20, 5


def _mmr_oracle() -> str:
    rounds = []
    for r in range(2, _MMR_K + 1):
        rounds.append(f"""s{r} AS MATERIALIZED (
  SELECT {r} AS rank, id, d2q, div_min FROM (
    SELECT rm.id, rm.d2q, MIN(p.d2p) AS div_min
    FROM d2q rm
    JOIN pair p ON p.ca = rm.id AND p.cb IN (SELECT id FROM acc{r - 1})
    WHERE rm.id NOT IN (SELECT id FROM acc{r - 1})
    GROUP BY rm.id, rm.d2q
  ) ORDER BY d2q - div_min, id LIMIT 1
), acc{r} AS (
  SELECT id FROM acc{r - 1} UNION ALL SELECT id FROM s{r}
)""")
    rounds_sql = ",\n".join(rounds)
    finals = "\nUNION ALL ".join(
        f"SELECT * FROM s{r}" for r in range(1, _MMR_K + 1)
    )
    return f"""
WITH ex AS (
  SELECT vec_id,
         unnest(embedding::DOUBLE[]) AS x,
         unnest(range(0, len(embedding))) AS dim
  FROM embeddings
), stats AS (
  SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY dim
), codes AS (
  SELECT vec_id, dim,
         CASE WHEN mx = mn THEN 0
              ELSE CAST(floor(((x - mn) * 255.0) / (mx - mn)) AS INT) END AS code
  FROM ex JOIN stats USING (dim)
), d2q AS MATERIALIZED (
  SELECT c.vec_id AS id,
         CAST(SUM((c.code - p.code) * (c.code - p.code)) AS BIGINT) AS d2q
  FROM codes c
  JOIN (SELECT dim, code FROM codes WHERE vec_id = {_MMR_PROBE}) p USING (dim)
  WHERE c.vec_id <> {_MMR_PROBE}
  GROUP BY c.vec_id
  ORDER BY d2q, id LIMIT {_MMR_CANDS}
), pair AS MATERIALIZED (
  SELECT a.vec_id AS ca, b.vec_id AS cb,
         CAST(SUM((a.code - b.code) * (a.code - b.code)) AS BIGINT) AS d2p
  FROM codes a
  JOIN codes b ON b.dim = a.dim AND b.vec_id <> a.vec_id
  WHERE a.vec_id IN (SELECT id FROM d2q) AND b.vec_id IN (SELECT id FROM d2q)
  GROUP BY a.vec_id, b.vec_id
), s1 AS MATERIALIZED (
  SELECT 1 AS rank, id, d2q, CAST(NULL AS BIGINT) AS div_min
  FROM d2q ORDER BY d2q, id LIMIT 1
), acc1 AS (
  SELECT id FROM s1
), {rounds_sql}
SELECT CAST(rank AS INT) AS rank, id, d2q, div_min FROM ({finals})
"""


@query("mmr_diverse_topk", oracle=_mmr_oracle())
def _mmr_diverse_topk(spark, sf_dir):
    """operators/quantize.py::mmr_diverse_topk — Maximal-Marginal-
    Relevance selection over the int8 code space: with λ=1/2 the MMR
    objective is ``min_{s∈S} d2(c,s) − d2(q,c)`` — pure BIGINTs, so
    all 5 selection rounds (unrolled, 1-row argmax each, candidates
    and pairwise table checkpointed once) are bit-deterministic and
    the oracle replays them as materialized CTEs. The curation answer
    to 'nearest k without k copies of the same template'."""
    from ffi_etl_spark.operators.quantize import mmr_diverse_topk

    out = mmr_diverse_topk(
        table(spark, sf_dir, "embeddings"),
        probe_id=_MMR_PROBE,
        n_candidates=_MMR_CANDS,
        k=_MMR_K,
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


# ---------------------------------------------------------------------------
# k-fold cross-validated AUC (per-segment model evaluation)
# ---------------------------------------------------------------------------

_CV_FOLDS = 5


def _cv_auc_oracle() -> str:
    from ffi_etl_spark.operators.inference import ensemble_to_sql

    margin, _ = ensemble_to_sql(_TREES, threshold=0.0)
    return f"""
WITH feats AS (
  SELECT event_id, value, CAST(event_id % 100 AS DOUBLE) AS idmod,
         (event_type = 'purchase') AS label,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
           % {_CV_FOLDS} AS fold
  FROM events
), scored AS (
  SELECT fold, {margin} AS s, label FROM feats
), per_score AS (
  SELECT fold, s, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE label) AS BIGINT) AS np
  FROM scored GROUP BY fold, s
), ranked AS (
  SELECT fold, s, n, np,
         COALESCE(SUM(n) OVER (PARTITION BY fold ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
  FROM per_score
), agg AS (
  SELECT fold, CAST(SUM(np) AS BIGINT) AS n_pos,
         CAST(SUM(n) - SUM(np) AS BIGINT) AS n_neg,
         CAST(SUM(np * (2 * c + n + 1)) AS BIGINT) AS u2
  FROM ranked GROUP BY fold
)
SELECT fold, n_pos, n_neg, u2,
       CAST(u2 - n_pos * (n_pos + 1) AS DOUBLE)
         / (2.0 * CAST(n_pos * n_neg AS DOUBLE)) AS auc
FROM agg
"""


@query("cv_auc_folds", oracle=_cv_auc_oracle())
def _cv_auc_folds(spark, sf_dir):
    """operators/inference.py::auc_exact(group_cols=("fold",)) — the
    k-fold evaluation shape: deterministic md5 folds (the
    train/val/test-split idiom), the same integer Mann-Whitney
    pipeline per fold (score aggregate, cumulative window, and final
    reduce all keyed by fold), one division per fold at the end. The
    spread across folds is the variance estimate an experiment readout
    quotes next to the point AUC."""
    from ffi_etl_spark.functions.hashing import md5_int32
    from ffi_etl_spark.operators.inference import auc_exact, score_ensemble

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "value",
        (F.col("event_id") % 100).cast("double").alias("idmod"),
        (F.col("event_type") == "purchase").alias("label"),
        (md5_int32(F.col("event_id").cast("string")) % _CV_FOLDS).alias("fold"),
    )
    scored = score_ensemble(ev, _TREES, keep_cols=("label", "fold"))
    return auc_exact(scored, group_cols=("fold",))


# ---------------------------------------------------------------------------
# Feature drift: Population Stability Index between time halves
# ---------------------------------------------------------------------------

_PSI_BINS, _PSI_BITS = 10, 20


def _psi_oracle() -> str:
    s = float(1 << _PSI_BITS)
    return f"""
WITH spanb AS (
  SELECT (CAST(epoch_us(MIN(ts)) AS BIGINT)
          + CAST(epoch_us(MAX(ts)) AS BIGINT)) // 2 AS half_us
  FROM events
), tagged AS (
  SELECT CAST(LEAST({_PSI_BINS - 1},
              GREATEST(0, FLOOR(value / 10.0))) AS BIGINT) AS bin,
         CAST(CAST(epoch_us(e.ts) AS BIGINT) <= b.half_us AS INT) AS is_ref
  FROM events e CROSS JOIN spanb b
), cells AS (
  SELECT bin,
         CAST(SUM(is_ref) AS BIGINT) AS n_ref,
         CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
  FROM tagged GROUP BY bin
), tot AS (
  SELECT CAST(SUM(n_ref) AS BIGINT) AS tr, CAST(SUM(n_cur) AS BIGINT) AS tc
  FROM cells
), terms AS (
  SELECT bin, n_ref, n_cur,
         CAST(FLOOR({s!r} *
           ((CAST(n_ref AS DOUBLE) + 0.5) / (CAST(tr AS DOUBLE) + {_PSI_BINS} * 0.5)
            - (CAST(n_cur AS DOUBLE) + 0.5) / (CAST(tc AS DOUBLE) + {_PSI_BINS} * 0.5))
           * ln(((CAST(n_ref AS DOUBLE) + 0.5) / (CAST(tr AS DOUBLE) + {_PSI_BINS} * 0.5))
                / ((CAST(n_cur AS DOUBLE) + 0.5) / (CAST(tc AS DOUBLE) + {_PSI_BINS} * 0.5))))
           AS BIGINT) AS term_q
  FROM cells CROSS JOIN tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(term_q) AS BIGINT) AS psi_q,
       CAST(SUM(term_q) AS DOUBLE) / {s!r} AS psi,
       CAST(CAST(SUM(term_q) AS DOUBLE) / {s!r} >= 0.2 AS INT) AS drift_flag
FROM terms
"""


@query("feature_drift_psi", oracle=_psi_oracle())
def _feature_drift_psi(spark, sf_dir):
    """Population Stability Index of the value distribution between
    the first and second time halves — THE production drift metric a
    feature store monitors per column. Each bin's
    ``(p−q)·ln(p/q)`` term (Laplace-smoothed proportions so empty
    bins stay finite) is FIXED-POINT QUANTIZED before the sum (the
    transcendental rule — ln is per-term, never accumulated raw), so
    the statistic is an exact integer plus one power-of-two division;
    drift_flag pins the standard 0.2 threshold as an integer decision.
    One scan, one K-bin aggregate, 1-row time-span broadcast."""
    s = float(1 << _PSI_BITS)
    ev = table(spark, sf_dir, "events")
    # midpoint in exact epoch MICROSECONDS (integer floor-div) — naive
    # timestamp-interval halving rounds differently across engines
    span = ev.agg(
        (
            (
                F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))
            )
            / 2
        )
        .cast("long")
        .alias("half_us")
    )
    tagged = ev.crossJoin(F.broadcast(span)).select(
        F.least(
            F.lit(_PSI_BINS - 1),
            F.greatest(F.lit(0), F.floor(F.col("value") / 10.0)),
        )
        .cast("long")
        .alias("bin"),
        (F.unix_micros(F.col("ts")) <= F.col("half_us")).cast("int").alias("is_ref"),
    )
    cells = tagged.groupBy("bin").agg(
        F.sum("is_ref").cast("long").alias("n_ref"),
        F.sum(F.lit(1) - F.col("is_ref")).cast("long").alias("n_cur"),
    )
    from pyspark import StorageLevel

    cells = cells.persist(StorageLevel.MEMORY_AND_DISK)
    tot = cells.agg(
        F.sum("n_ref").cast("long").alias("tr"),
        F.sum("n_cur").cast("long").alias("tc"),
    )
    p = (F.col("n_ref").cast("double") + F.lit(0.5)) / (
        F.col("tr").cast("double") + F.lit(_PSI_BINS * 0.5)
    )
    q = (F.col("n_cur").cast("double") + F.lit(0.5)) / (
        F.col("tc").cast("double") + F.lit(_PSI_BINS * 0.5)
    )
    term_q = F.floor(F.lit(s) * (p - q) * F.log(p / q)).cast("long")
    terms = cells.crossJoin(F.broadcast(tot)).select(term_q.alias("term_q"))
    psi = F.sum("term_q").cast("double") / F.lit(s)
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("term_q").cast("long").alias("psi_q"),
        psi.alias("psi"),
        (psi >= F.lit(0.2)).cast("int").alias("drift_flag"),
    )


# ---------------------------------------------------------------------------
# In-database model TRAINING: optimal decision stump by Gini
# ---------------------------------------------------------------------------

_STUMP_ORACLE = """
WITH binned AS (
  SELECT CAST(LEAST(99, GREATEST(0, FLOOR(value))) AS BIGINT) AS bin,
         CAST(event_type = 'purchase' AS BIGINT) AS y
  FROM events
), cells AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM binned GROUP BY bin
), cum AS (
  SELECT bin,
         CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS nl,
         CAST(SUM(pos) OVER (ORDER BY bin) AS BIGINT) AS posl
  FROM cells
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(pos) AS BIGINT) AS pt FROM cells
), cand AS (
  SELECT bin, nl, posl, nt - nl AS nr, pt - posl AS posr,
         (CAST(nl AS DOUBLE)
          - (CAST(posl * posl AS DOUBLE) + CAST((nl - posl) * (nl - posl) AS DOUBLE))
            / CAST(nl AS DOUBLE))
         + (CAST(nt - nl AS DOUBLE)
            - (CAST((pt - posl) * (pt - posl) AS DOUBLE)
               + CAST(((nt - nl) - (pt - posl)) * ((nt - nl) - (pt - posl)) AS DOUBLE))
              / CAST(nt - nl AS DOUBLE)) AS gini_cost,
         nt, pt
  FROM cum CROSS JOIN tot
  WHERE nl > 0 AND nt - nl > 0
), best AS (
  SELECT * FROM cand ORDER BY gini_cost, bin LIMIT 1
)
SELECT bin AS threshold_bin, nl AS n_left, posl AS pos_left,
       nr AS n_right, posr AS pos_right, gini_cost,
       CAST(GREATEST(posl, nl - posl) + GREATEST(posr, nr - posr) AS DOUBLE)
         / CAST(nt AS DOUBLE) AS stump_acc
FROM best
"""


@query("train_decision_stump", oracle=_STUMP_ORACLE)
def _train_decision_stump(spark, sf_dir):
    """In-database model TRAINING beside the inference family: the
    optimal 1-split decision stump on value predicting `is a
    purchase`, by exhaustive Gini scan over the 100 integer bin
    thresholds. All split statistics are cumulative-window BIGINTs;
    each candidate's Gini cost is a fixed op sequence over exact
    integers (deterministic double, no accumulation), and the argmin
    ties to the smaller threshold — so even the TRAINED MODEL is
    bit-identical cross-engine. The trained stump is exactly a
    ``DEMO_TREES``-style dict — score it with ``score_ensemble``.
    Shape: one scan, one 100-row aggregate, K-row window + argmin.
    The training body lives in ``operators/inference.py::
    train_decision_stump`` (extracted for reuse, VERDICT r05 item 4);
    this query supplies the events binning + label."""
    from ffi_etl_spark.operators.inference import train_decision_stump

    binned = table(spark, sf_dir, "events").select(
        F.least(F.lit(99), F.greatest(F.lit(0), F.floor(F.col("value"))))
        .cast("long")
        .alias("bin"),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )
    return train_decision_stump(binned)


# ---------------------------------------------------------------------------
# Contrastive negative mining (hard + random negatives per anchor)
# ---------------------------------------------------------------------------

_CN_ANCHORS, _CN_HARD, _CN_RAND = (0, 1, 2), 5, 5


def _cn_oracle() -> str:
    anchors = ", ".join(str(a) for a in _CN_ANCHORS)
    return f"""
WITH ex AS (
  SELECT vec_id,
         unnest(embedding::DOUBLE[]) AS x,
         unnest(range(0, len(embedding))) AS dim
  FROM embeddings
), stats AS (
  SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY dim
), codes AS (
  SELECT vec_id, dim,
         CASE WHEN mx = mn THEN 0
              ELSE CAST(floor(((x - mn) * 255.0) / (mx - mn)) AS INT) END AS code
  FROM ex JOIN stats USING (dim)
), probes AS (
  SELECT vec_id AS anchor, dim, code AS pcode FROM codes
  WHERE vec_id IN ({anchors})
), dists AS (
  SELECT p.anchor, c.vec_id,
         CAST(SUM((c.code - p.pcode) * (c.code - p.pcode)) AS BIGINT) AS d2
  FROM codes c JOIN probes p USING (dim)
  WHERE c.vec_id <> p.anchor
  GROUP BY p.anchor, c.vec_id
), hard AS (
  SELECT anchor, vec_id, d2,
         ROW_NUMBER() OVER (PARTITION BY anchor ORDER BY d2, vec_id) AS rk
  FROM dists WHERE d2 > 0
), hardk AS (
  SELECT anchor, vec_id, d2, rk FROM hard WHERE rk <= {_CN_HARD}
), randpool AS (
  SELECT d.anchor, d.vec_id,
         ('0x' || substr(md5(CAST(d.anchor AS VARCHAR) || '_'
                             || CAST(d.vec_id AS VARCHAR)), 1, 8))::BIGINT AS draw,
         d.d2
  FROM dists d
  WHERE NOT EXISTS (
    SELECT 1 FROM hardk h WHERE h.anchor = d.anchor AND h.vec_id = d.vec_id
  )
), randk AS (
  SELECT anchor, vec_id, d2,
         ROW_NUMBER() OVER (PARTITION BY anchor ORDER BY draw, vec_id) AS rk
  FROM randpool
)
SELECT anchor, vec_id AS negative, 'hard' AS kind, d2, CAST(rk AS INT) AS rk
FROM hardk
UNION ALL
SELECT anchor, vec_id AS negative, 'random' AS kind, d2, CAST(rk AS INT) AS rk
FROM randk WHERE rk <= {_CN_RAND}
"""


@query("contrastive_negatives", oracle=_cn_oracle())
def _contrastive_negatives(spark, sf_dir):
    """Negative mining for contrastive training: per anchor, the
    ``_CN_HARD`` nearest non-identical vectors in int8 code space
    (hard negatives — the examples that actually move an embedding
    model) plus ``_CN_RAND`` md5-drawn random negatives EXCLUDING the
    hard set (the easy-negative background). Distances are exact
    integers, the random draw is the deterministic-sample idiom, both
    rankings tie on vec_id — fully bit-stable. Shape: one dim-keyed
    broadcast probe join (the knn_int8_codes kernel), per-anchor
    WindowGroupLimits, one anti-join for the exclusion."""
    from pyspark.sql import Window

    from ffi_etl_spark.functions.hashing import md5_int32
    from ffi_etl_spark.operators.quantize import quantize_codes_long

    from pyspark import StorageLevel

    codes = quantize_codes_long(table(spark, sf_dir, "embeddings"))
    probes = codes.filter(F.col("vec_id").isin(list(_CN_ANCHORS))).select(
        F.col("vec_id").alias("anchor"), "dim", F.col("code").alias("pcode")
    )
    dists = (
        codes.join(F.broadcast(probes), "dim")
        .filter(F.col("vec_id") != F.col("anchor"))
        .groupBy("anchor", "vec_id")
        .agg(
            F.sum(
                (F.col("code") - F.col("pcode")) * (F.col("code") - F.col("pcode"))
            )
            .cast("long")
            .alias("d2")
        )
        # feeds the hard ranking AND the random pool (anti-join) — pin
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    wq = Window.partitionBy("anchor").orderBy("d2", "vec_id")
    hardk = (
        dists.where(F.col("d2") > 0)
        .withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= _CN_HARD)
    )
    draw = md5_int32(
        F.concat(
            F.col("anchor").cast("string"), F.lit("_"), F.col("vec_id").cast("string")
        )
    )
    wr = Window.partitionBy("anchor").orderBy("draw", "vec_id")
    randk = (
        dists.join(hardk.select("anchor", "vec_id"), ["anchor", "vec_id"], "left_anti")
        .withColumn("draw", draw)
        .withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= _CN_RAND)
    )
    return hardk.select(
        "anchor",
        F.col("vec_id").alias("negative"),
        F.lit("hard").alias("kind"),
        "d2",
        F.col("rk").cast("int").alias("rk"),
    ).unionByName(
        randk.select(
            "anchor",
            F.col("vec_id").alias("negative"),
            F.lit("random").alias("kind"),
            "d2",
            F.col("rk").cast("int").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# PPMI association + Zipf power-law fit over the corpus vocabulary
# ---------------------------------------------------------------------------

_PPMI_BITS, _PPMI_TOPK = 20, 20


def _ppmi_oracle() -> str:
    s = float(1 << _PPMI_BITS)
    return rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
  FROM documents
), uni AS (
  SELECT unnest(ts) AS t FROM toks
), ucnt AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY t
), nu AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n FROM ucnt
), bi AS (
  SELECT ts[i] AS a, ts[i + 1] AS b
  FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM toks)
), bcnt AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cab FROM bi GROUP BY a, b
), nb AS (
  SELECT CAST(SUM(cab) AS BIGINT) AS m FROM bcnt
), scoredp AS (
  SELECT bcnt.a, bcnt.b, cab, ca.c AS ca, cb.c AS cb,
         GREATEST(CAST(0 AS BIGINT), CAST(FLOOR({s!r} * ln(
           (CAST(cab AS DOUBLE) * CAST(nu.n AS DOUBLE) * CAST(nu.n AS DOUBLE))
           / (CAST(nb.m AS DOUBLE) * CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))
         )) AS BIGINT)) AS ppmi_q
  FROM bcnt
  JOIN ucnt ca ON ca.t = bcnt.a
  JOIN ucnt cb ON cb.t = bcnt.b
  CROSS JOIN nu CROSS JOIN nb
)
SELECT a, b, cab, ca, cb, ppmi_q
FROM scoredp ORDER BY ppmi_q DESC, a, b LIMIT {_PPMI_TOPK}
"""


@query("ppmi_associations", oracle=_ppmi_oracle())
def _ppmi_associations(spark, sf_dir):
    """Top-k adjacent-bigram PPMI associations — the log-ratio
    companion to term_collocations' transcendental-free Dice (PPMI is
    the weighting word-vector count models start from). The PMI ln is
    FIXED-POINT QUANTIZED per pair (floor(2^20·ln), clamped at 0 for
    the POSITIVE PMI), so the ranking feeding the LIMIT is integer.
    Shape: one token explode for unigrams, one shifted-pair explode
    for bigrams, vocabulary-sized joins, TakeOrdered top-k."""
    toks = table(spark, sf_dir, "documents").select(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("ts")
    )
    from pyspark import StorageLevel

    toks = toks.persist(StorageLevel.MEMORY_AND_DISK)
    uni = toks.select(F.explode("ts").alias("t"))
    ucnt = uni.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    nu = ucnt.agg(F.sum("c").cast("long").alias("n"))
    bi = toks.select(
        F.explode(
            F.expr("transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] as a, ts[i] as b))")
        ).alias("p")
    ).select("p.a", "p.b")
    bcnt = bi.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("cab"))
    nb = bcnt.agg(F.sum("cab").cast("long").alias("m"))
    s = float(1 << _PPMI_BITS)
    arg = (
        F.col("cab").cast("double")
        * F.col("n").cast("double")
        * F.col("n").cast("double")
    ) / (
        F.col("m").cast("double")
        * F.col("ca").cast("double")
        * F.col("cb").cast("double")
    )
    ppmi_q = F.greatest(
        F.lit(0).cast("long"), F.floor(F.lit(s) * F.log(arg)).cast("long")
    )
    ua = ucnt.select(F.col("t").alias("a"), F.col("c").alias("ca"))
    ub = ucnt.select(F.col("t").alias("b"), F.col("c").alias("cb"))
    return (
        bcnt.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select("a", "b", "cab", "ca", "cb", ppmi_q.alias("ppmi_q"))
        .orderBy(F.desc("ppmi_q"), "a", "b")
        .limit(_PPMI_TOPK)
    )


_ZIPF_BITS = 20


def _zipf_oracle() -> str:
    s = float(1 << _ZIPF_BITS)
    return rf"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
  FROM documents
), ucnt AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY t
), ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS r FROM ucnt
), q AS (
  SELECT CAST(FLOOR({s!r} * ln(CAST(r AS DOUBLE))) AS BIGINT) AS xq,
         CAST(FLOOR({s!r} * ln(CAST(c AS DOUBLE))) AS BIGINT) AS yq
  FROM ranked
), sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
         CAST(SUM(xq * yq) AS BIGINT) AS sxy,
         CAST(SUM(xq * xq) AS BIGINT) AS sxx
  FROM q
)
SELECT n AS vocab,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) AS zipf_slope
FROM sums
"""


@query("zipf_exponent_fit", oracle=_zipf_oracle())
def _zipf_exponent_fit(spark, sf_dir):
    """Zipf power-law exponent of the corpus vocabulary: OLS slope of
    ln(freq) on ln(rank) — the corpus-health number (natural text
    ≈ −1; synthetic token soup flattens toward 0). Both logs are
    FIXED-POINT QUANTIZED at the leaf so all OLS moment sums are
    exact BIGINTs (the scale factor cancels in the slope ratio) and
    the fit is ONE division. Deterministic rank ties on term. One
    explode + vocab aggregate + K-row rank window + 1-row reduce."""
    from pyspark.sql import Window

    s = float(1 << _ZIPF_BITS)
    ucnt = (
        table(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ranked = ucnt.select(
        "c", F.row_number().over(Window.orderBy(F.desc("c"), "t")).alias("r")
    )
    q = ranked.select(
        F.floor(F.lit(s) * F.log(F.col("r").cast("double"))).cast("long").alias("xq"),
        F.floor(F.lit(s) * F.log(F.col("c").cast("double"))).cast("long").alias("yq"),
    )
    sums = q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
    )
    return sums.select(
        F.col("n").alias("vocab"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# Unigram-LM hard-EM refit (one Viterbi-EM round)
# ---------------------------------------------------------------------------


def _unigram_em_oracle() -> str:
    from ffi_etl_spark.operators.tokenizer import (
        UNI_MAX_PIECE,
        UNI_MAX_WORD,
        UNI_SCALE_BITS,
        UNI_VOCAB,
    )

    s, mp, wcap, vcap = float(1 << UNI_SCALE_BITS), UNI_MAX_PIECE, 5000, UNI_VOCAB
    rounds1, finals1 = _uni_dp_chain("s", "vocab", "s0")
    rounds2, finals2 = _uni_dp_chain("t", "vocab2", "s0")
    return rf"""
WITH raw AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS raw FROM documents
), lex AS MATERIALIZED (
  SELECT substr(raw, 1, {UNI_MAX_WORD}) AS w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM raw WHERE raw <> '' GROUP BY 1
  ORDER BY freq DESC, w LIMIT {wcap}
), spans AS (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT l.freq, substr(l.w, j.j, s.l) AS piece
    FROM lex l
    CROSS JOIN (SELECT unnest(generate_series(1, {UNI_MAX_WORD})) AS j) j
    CROSS JOIN (SELECT unnest(generate_series(1, {mp})) AS l) s
    WHERE j.j + s.l - 1 <= length(l.w)
  ) GROUP BY piece
), topv AS MATERIALIZED (
  SELECT piece, cnt FROM spans ORDER BY cnt DESC, piece LIMIT {vcap}
), chars AS (
  SELECT piece, cnt FROM spans WHERE length(piece) = 1
), vocab0 AS (
  SELECT piece, MAX(cnt) AS cnt
  FROM (SELECT * FROM topv UNION ALL SELECT * FROM chars) GROUP BY piece
), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vocab0),
vocab AS MATERIALIZED (
  SELECT piece,
         CAST(FLOOR({s!r} * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)))
              AS BIGINT) AS score_q
  FROM vocab0 CROSS JOIN tot
), s0 AS MATERIALIZED (
  SELECT w, CAST(length(w) AS INT) AS wlen, CAST(0 AS BIGINT) AS score,
         CAST(0 AS BIGINT) AS n, '' AS path
  FROM lex
), {rounds1}, res1 AS MATERIALIZED (
  {finals1}
), usage AS MATERIALIZED (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS used FROM (
    SELECT l.freq, unnest(string_split(r.path, ' ')) AS piece
    FROM res1 r JOIN lex l ON l.w = r.w
  ) GROUP BY piece
), tu AS (SELECT CAST(SUM(used) AS BIGINT) AS tu FROM usage),
vsz AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
vocab2 AS MATERIALIZED (
  SELECT vb.piece,
         CAST(FLOOR({s!r} * ln(
           CAST(COALESCE(u.used, 0) + 1 AS DOUBLE)
           / CAST(tu.tu + vsz.v AS DOUBLE))) AS BIGINT) AS score_q
  FROM vocab vb LEFT JOIN usage u ON u.piece = vb.piece
  CROSS JOIN tu CROSS JOIN vsz
), {rounds2}, res2 AS (
  {finals2}
)
SELECT w, CAST(wlen AS INT) AS wlen, CAST(n AS BIGINT) AS n_pieces,
       CAST(score AS BIGINT) AS score_q, path AS segmentation
FROM res2
"""


@query("unigram_em_refit", oracle=_unigram_em_oracle())
def _unigram_em_refit(spark, sf_dir):
    """operators/tokenizer.py::unigram_em_refit — one HARD-EM
    (Viterbi-EM) round on the unigram model: segment under the seed
    scores, count frequency-weighted piece USAGE from the best splits,
    re-score with Laplace smoothing (quantized ln at the leaf), and
    re-segment. Hard EM keeps every step integer-exact, which is what
    makes an EM iteration oracle-gateable at all — the oracle replays
    BOTH unrolled DP chains plus the usage/M-step in one CTE program.
    Unused pieces crash toward the floor score (self-pruning), the
    behavior the full SentencePiece trainer iterates to convergence."""
    from ffi_etl_spark.operators.tokenizer import unigram_em_refit

    out = unigram_em_refit(table(spark, sf_dir, "documents"))
    return out.withColumn("wlen", F.col("wlen").cast("int"))


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split (split by near-dup component)
# ---------------------------------------------------------------------------


def _lss_oracle() -> str:
    from ffi_etl_spark.queries_pkg.extensions import _MINHASH_ORACLE

    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_MINHASH_ORACLE})
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), verts AS (
  SELECT DISTINCT a AS v FROM edges
), reach(v, m) AS (
  SELECT v, v FROM verts
  UNION
  SELECT e.b, r.m FROM reach r JOIN edges e ON e.a = r.v
), comp AS (
  SELECT v AS doc_id, MIN(m) AS component FROM reach GROUP BY v
), allc AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
), split AS (
  SELECT doc_id, component,
         CASE ('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8))::BIGINT % 10
           WHEN 8 THEN 'val' WHEN 9 THEN 'test' ELSE 'train' END AS split
  FROM allc
)
SELECT doc_id, component, split FROM split
"""


@query("leakage_safe_split", oracle=_lss_oracle())
def _leakage_safe_split(spark, sf_dir):
    """The PREVENTION completing split_leakage_audit's detection:
    train/val/test assignment keyed on the near-dup COMPONENT id
    (md5 mod 10 → 8/1/1), so an entire cluster of near-duplicates
    lands in one split and eval contamination via templates is
    impossible by construction — splitting by doc_id (the
    train_val_test_split idiom) cannot guarantee that. Singleton docs
    are their own component via the left join. Pairs → components is
    the dedup_components machinery; the split is the deterministic-
    sample idiom on the CANONICAL id."""
    from ffi_etl_spark.functions.hashing import md5_int32
    from ffi_etl_spark.operators.dedup import dedup_minhash_lsh
    from ffi_etl_spark.operators.graph import connected_components

    docs = table(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(docs)
    comp = connected_components(pairs).withColumnsRenamed(
        {"vertex": "doc_id", "component": "component"}
    )
    allc = docs.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
    )
    bucket = md5_int32(F.col("component").cast("string")) % 10
    return allc.select(
        "doc_id",
        "component",
        F.when(bucket == 8, F.lit("val"))
        .when(bucket == 9, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Multimodal perceptual hash (aHash through the Arrow lane)
# ---------------------------------------------------------------------------

_AHASH_ORACLE = """
WITH base AS (
  SELECT doc_id, text, length(text) AS n FROM documents WHERE length(text) >= 1
), samp AS (
  SELECT doc_id, n, i, ascii(substr(text, (i * n) // 60 + 1, 1)) AS p
  FROM (SELECT doc_id, text, n, unnest(generate_series(0, 59)) AS i FROM base)
), tot AS (
  SELECT doc_id, CAST(SUM(p) AS BIGINT) AS s FROM samp GROUP BY doc_id
)
SELECT samp.doc_id, CAST(samp.n AS BIGINT) AS n_chars,
       CAST(SUM(CASE WHEN 60 * samp.p > t.s
                     THEN 1::BIGINT << samp.i ELSE 0 END) AS BIGINT) AS ahash
FROM samp JOIN tot t USING (doc_id)
GROUP BY samp.doc_id, samp.n
"""


@query("multimodal_phash_sigs", oracle=_AHASH_ORACLE)
def _multimodal_phash_sigs(spark, sf_dir):
    """operators/multimodal.py::ahash_signatures — perceptual
    average-hash signatures computed THROUGH the binary-payload Arrow
    lane (mapInPandas decode -> sampled codepoint grid -> integer
    threshold hash), differentially pinned by a pure-SQL replay: the
    gate proves the Python/Arrow lane bit-equal to the relational
    semantics, the same guarantee the other multimodal queries carry.
    Pair generation (phash_neardup_pairs — dedup_simhash's banded
    plan on this hash) is pytest-gated on planted near-identical
    payloads; the natural corpus has no Hamming≤3 pairs."""
    from ffi_etl_spark.operators.multimodal import (
        ahash_signatures,
        attach_binary_payload,
    )

    docs = table(spark, sf_dir, "documents")
    return ahash_signatures(attach_binary_payload(docs))


# ---------------------------------------------------------------------------
# Forward as-of join: next purchase after each view (time-to-convert)
# ---------------------------------------------------------------------------

_ASOF_FWD_ORACLE = """
WITH ev AS (
  SELECT event_id, user_id, event_type, ts,
         CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events WHERE event_type IN ('view', 'purchase')
), marked AS (
  SELECT event_id, user_id, event_type, us,
         MIN(CASE WHEN event_type = 'purchase' THEN us END) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
         ) AS next_purchase_us
  FROM ev
)
SELECT event_id, user_id, us AS view_us, next_purchase_us,
       next_purchase_us - us AS gap_us
FROM marked WHERE event_type = 'view'
"""


@query("asof_forward_next_purchase", oracle=_ASOF_FWD_ORACLE)
def _asof_forward_next_purchase(spark, sf_dir):
    """FORWARD as-of join completing asof_join_last_purchase's
    backward direction: for every view, the user's next purchase at or
    after it (time-to-convert). Same union-the-streams trick, mirrored
    — a conditional MIN over the FOLLOWING frame instead of LOCF over
    PRECEDING — so both directions are one user-keyed shuffle + one
    frame window, never a per-row subquery. NULL next_purchase marks
    never-converting views (kept: the churn signal). Timestamps ride
    as epoch-microsecond BIGINTs (the engine's sub-second rule)."""
    from pyspark.sql import Window

    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("us"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    nxt = F.min(
        F.when(F.col("event_type") == "purchase", F.col("us"))
    ).over(w)
    return (
        ev.withColumn("next_purchase_us", nxt)
        .where(F.col("event_type") == "view")
        .select(
            "event_id",
            "user_id",
            F.col("us").alias("view_us"),
            "next_purchase_us",
            (F.col("next_purchase_us") - F.col("us")).alias("gap_us"),
        )
    )


# ---------------------------------------------------------------------------
# GDPR right-to-be-forgotten: APPLY the purge, prove completeness
# ---------------------------------------------------------------------------

_GDPR_APPLY_ORACLE = """
WITH subjects AS (
  SELECT DISTINCT user_id AS sid FROM events WHERE user_id % 97 = 0
), t AS (
  SELECT 'customer' AS table_name,
         CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_before,
         CAST((SELECT COUNT(*) FROM customer
               WHERE c_custkey IN (SELECT sid FROM subjects)) AS BIGINT)
           AS n_purged,
         CAST((SELECT COUNT(*) FROM customer
               WHERE c_custkey NOT IN (SELECT sid FROM subjects)) AS BIGINT)
           AS n_after,
         CAST((SELECT COUNT(*) FROM (
               SELECT c_custkey FROM customer
               WHERE c_custkey NOT IN (SELECT sid FROM subjects)
         ) WHERE c_custkey IN (SELECT sid FROM subjects)) AS BIGINT)
           AS residual_subject_rows
  UNION ALL
  SELECT 'events',
         CAST((SELECT COUNT(*) FROM events) AS BIGINT),
         CAST((SELECT COUNT(*) FROM events
               WHERE user_id IN (SELECT sid FROM subjects)) AS BIGINT),
         CAST((SELECT COUNT(*) FROM events
               WHERE user_id NOT IN (SELECT sid FROM subjects)) AS BIGINT),
         CAST(0 AS BIGINT)
  UNION ALL
  SELECT 'orders',
         CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
         CAST((SELECT COUNT(*) FROM orders
               WHERE o_custkey IN (SELECT sid FROM subjects)) AS BIGINT),
         CAST((SELECT COUNT(*) FROM orders
               WHERE o_custkey NOT IN (SELECT sid FROM subjects)) AS BIGINT),
         CAST(0 AS BIGINT)
)
SELECT table_name, n_before, n_purged, n_after, residual_subject_rows,
       CAST(n_before - n_purged = n_after AS INT) AS conservation_ok
FROM t ORDER BY table_name
"""


@query("gdpr_forget_apply", oracle=_GDPR_APPLY_ORACLE)
def _gdpr_forget_apply(spark, sf_dir):
    """Execute the right-to-be-forgotten purge that gdpr_forget_audit
    sized: per table, the LEFT ANTI join against the broadcast subject
    set, with completeness PROVEN in the output — residual subject
    rows in the purged table (a semi-join back, must be 0) and the
    conservation identity before − purged = after as an integer flag.
    Same 100 TB shape as the audit: tiny broadcast set, per-table
    scans, no table shuffle; in a lakehouse deployment the anti-join
    result lands via overwrite/MERGE (sources/versioned.py keeps the
    pre-purge snapshot for the legal-hold window)."""
    ev = table(spark, sf_dir, "events")
    subjects = (
        ev.filter(F.col("user_id") % 97 == 0)
        .select(F.col("user_id").alias("sid"))
        .distinct()
        .localCheckpoint(eager=True)  # reused by 3x2 joins below
    )

    def apply(df, key, name):
        purged = df.join(
            F.broadcast(subjects), df[key] == F.col("sid"), "left_anti"
        )
        before = df.agg(F.count(F.lit(1)).cast("long").alias("n_before"))
        # n_purged counted INDEPENDENTLY (semi-join), so the
        # conservation identity below genuinely cross-checks the
        # anti/semi partitioning instead of restating arithmetic
        hit = df.join(
            F.broadcast(subjects), df[key] == F.col("sid"), "left_semi"
        ).agg(F.count(F.lit(1)).cast("long").alias("n_purged"))
        kept = purged.agg(F.count(F.lit(1)).cast("long").alias("n_after"))
        residual = (
            purged.join(F.broadcast(subjects), df[key] == F.col("sid"), "left_semi")
            .agg(F.count(F.lit(1)).cast("long").alias("residual_subject_rows"))
        )
        return (
            before.crossJoin(F.broadcast(hit))
            .crossJoin(F.broadcast(kept))
            .crossJoin(F.broadcast(residual))
            .select(
                F.lit(name).alias("table_name"),
                "n_before",
                "n_purged",
                "n_after",
                "residual_subject_rows",
                (F.col("n_before") - F.col("n_purged") == F.col("n_after"))
                .cast("int")
                .alias("conservation_ok"),
            )
        )

    return (
        apply(table(spark, sf_dir, "customer"), "c_custkey", "customer")
        .unionByName(apply(ev, "user_id", "events"))
        .unionByName(apply(table(spark, sf_dir, "orders"), "o_custkey", "orders"))
    )


# ---------------------------------------------------------------------------
# Calendar dimension generator (warehouse utility table)
# ---------------------------------------------------------------------------

_CAL_ORACLE = """
WITH span AS (
  SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events
), days AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d FROM span
)
SELECT d AS cal_date,
       CAST(year(d) AS INT) AS year,
       CAST(quarter(d) AS INT) AS quarter,
       CAST(month(d) AS INT) AS month,
       CAST(isoyear(d) AS INT) AS iso_year,
       CAST(weekofyear(d) AS INT) AS iso_week,
       CAST(isodow(d) AS INT) AS iso_dow,
       CAST(isodow(d) >= 6 AS INT) AS is_weekend,
       CAST(d = last_day(d) AS INT) AS is_month_end
FROM days
"""


@query("calendar_dim", oracle=_CAL_ORACLE)
def _calendar_dim(spark, sf_dir):
    """Calendar dimension spanning the event range — the warehouse
    utility every date-keyed star joins against: generated by one
    sequence explode over a 1-row min/max broadcast (no source table
    of days needed), with ISO attributes computed from integer date
    math both engines agree on (probed: Spark weekofyear/dayofweek map
    onto DuckDB weekofyear/isodow; ISO year via the Thursday rule).
    Broadcast-sized output by construction (one row per day)."""
    span = table(spark, sf_dir, "events").agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    days = span.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("cal_date")
    )
    d = F.col("cal_date")
    iso_dow = (F.pmod(F.dayofweek(d) + F.lit(5), F.lit(7)) + F.lit(1)).cast("int")
    # ISO year = year of this week's Thursday (the ISO-8601 rule),
    # computed with pure date arithmetic
    thursday = F.date_add(d, 4 - iso_dow)
    return days.select(
        "cal_date",
        F.year(d).cast("int").alias("year"),
        F.quarter(d).cast("int").alias("quarter"),
        F.month(d).cast("int").alias("month"),
        F.year(thursday).cast("int").alias("iso_year"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        iso_dow.alias("iso_dow"),
        (iso_dow >= 6).cast("int").alias("is_weekend"),
        (d == F.last_day(d)).cast("int").alias("is_month_end"),
    )


# ---------------------------------------------------------------------------
# IVM with retractions: maintain aggregates from a CDC insert/delete feed
# ---------------------------------------------------------------------------

_IVM_RETRACT_ORACLE = """
WITH base AS (
  SELECT * FROM orders WHERE o_orderkey % 10 <> 0
), inserts AS (
  SELECT * FROM orders WHERE o_orderkey % 10 = 0
), deletes AS (
  SELECT * FROM base WHERE o_orderkey % 7 = 0
), final AS (
  SELECT * FROM base WHERE o_orderkey % 7 <> 0
  UNION ALL SELECT * FROM inserts
)
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM final GROUP BY o_custkey
"""


@query("incremental_agg_retractions", oracle=_IVM_RETRACT_ORACLE)
def _incremental_agg_retractions(spark, sf_dir):
    """IVM under a CDC feed WITH DELETES — the capability
    incremental_agg_maintenance (insert-only partials) lacks: the
    change batch aggregates with a ±1 sign (inserts add, deletes
    retract), merges onto the stored aggregate through the SAME
    merge_grouped_partials sum rule (a retraction is just a negative
    partial), and groups whose count reaches zero DROP from the view
    (a full recompute never shows them — the post-merge filter is part
    of the contract). Sums use exact integer cents. Stated honestly:
    only invertible aggregates (count/sum/avg-as-sum-and-count)
    maintain under deletes — min/max need a rebuild when the extremum
    is retracted, which is why they are absent here. O(groups + |Δ|),
    base facts never rescanned."""
    from ffi_etl_spark.operators.ivm import merge_grouped_partials

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base = orders.where(F.col("o_orderkey") % 10 != 0)
    inserts = orders.where(F.col("o_orderkey") % 10 == 0)
    deletes = base.where(F.col("o_orderkey") % 7 == 0)

    stored = base.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    cdc = inserts.withColumn("_sign", F.lit(1)).unionByName(
        deletes.withColumn("_sign", F.lit(-1))
    )
    delta = cdc.groupBy("o_custkey").agg(
        F.sum("_sign").cast("long").alias("n_orders"),
        F.sum(F.col("_sign") * F.col("cents")).cast("long").alias("total_cents"),
    )
    merged = merge_grouped_partials(
        stored, delta, keys=["o_custkey"], spec={"n_orders": "sum", "total_cents": "sum"}
    )
    return merged.where(F.col("n_orders") > 0).select(
        "o_custkey", "n_orders", "total_cents"
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov (fully exact — no quantization)
# ---------------------------------------------------------------------------

_KS_ORACLE = """
WITH spanb AS (
  SELECT (CAST(epoch_us(MIN(ts)) AS BIGINT)
          + CAST(epoch_us(MAX(ts)) AS BIGINT)) // 2 AS half_us
  FROM events
), tagged AS (
  SELECT value, CAST(CAST(epoch_us(e.ts) AS BIGINT) <= b.half_us AS INT) AS s1
  FROM events e CROSS JOIN spanb b
), per_value AS (
  SELECT value, CAST(SUM(s1) AS BIGINT) AS c1, CAST(SUM(1 - s1) AS BIGINT) AS c2
  FROM tagged GROUP BY value
), cum AS (
  SELECT value,
         CAST(SUM(c1) OVER (ORDER BY value) AS BIGINT) AS f1,
         CAST(SUM(c2) OVER (ORDER BY value) AS BIGINT) AS f2
  FROM per_value
), tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM per_value
), d AS (
  SELECT MAX(ABS(f1 * n2 - f2 * n1)) AS d_q FROM cum CROSS JOIN tot
)
SELECT n1, n2, d_q,
       CAST(d_q AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS ks_d
FROM d CROSS JOIN tot
"""


@query("ks_two_sample", oracle=_KS_ORACLE)
def _ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov D between the value distributions
    of the first and second time halves — the FULLY EXACT member of
    the drift toolkit (beside quantized PSI/chi²): the CDF gap at
    every distinct value is the integer ``|F1·n2 − F2·n1|``, the
    statistic is an integer MAX, and D is ONE division at the very
    end. No quantization, no flake budget anywhere. Shape: one scan,
    one distinct-value aggregate, a K-row cumulative window over the
    post-aggregate value table, 1-row reduce."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    span = ev.agg(
        ((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2)
        .cast("long")
        .alias("half_us")
    )
    tagged = ev.crossJoin(F.broadcast(span)).select(
        "value",
        (F.unix_micros(F.col("ts")) <= F.col("half_us")).cast("int").alias("s1"),
    )
    per_value = tagged.groupBy("value").agg(
        F.sum("s1").cast("long").alias("c1"),
        F.sum(F.lit(1) - F.col("s1")).cast("long").alias("c2"),
    )
    from pyspark import StorageLevel

    per_value = per_value.persist(StorageLevel.MEMORY_AND_DISK)
    w = Window.orderBy("value")
    cum = per_value.select(
        F.sum("c1").over(w).cast("long").alias("f1"),
        F.sum("c2").over(w).cast("long").alias("f2"),
    )
    tot = per_value.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    d = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
        ).alias("d_q")
    )
    return d.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        "d_q",
        (F.col("d_q").cast("double") / (F.col("n1") * F.col("n2")).cast("double"))
        .alias("ks_d"),
    )


# ---------------------------------------------------------------------------
# Linear-interpolation resampling (the LOCF gap-fill complement)
# ---------------------------------------------------------------------------

_INTERP_ORACLE = """
WITH obs AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h,
         CAST(CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE)
              / COUNT(*) AS DOUBLE) AS v
  FROM events GROUP BY event_type, CAST(epoch_us(ts) AS BIGINT) // 3600000000
), span AS (
  SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM obs GROUP BY event_type
), grid AS (
  SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM span
), joined AS (
  SELECT g.event_type, g.h, o.v FROM grid g
  LEFT JOIN obs o ON o.event_type = g.event_type AND o.h = g.h
), walls AS (
  SELECT event_type, h, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM joined
)
SELECT event_type, h, CAST(v IS NOT NULL AS INT) AS is_observed,
       CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
              pv + (nv - pv) * (CAST(h - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
       END AS value_i
FROM walls
"""


@query("resample_interpolate", oracle=_INTERP_ORACLE)
def _resample_interpolate(spark, sf_dir):
    """Hourly resampling with LINEAR interpolation — the smooth
    complement to resample_gapfill's LOCF: per event type, the hourly
    mean series on a dense epoch-hour grid, gaps filled by
    ``prev + (next−prev)·(h−hp)/(hn−hp)`` between the bracketing
    observed hours (NULL outside the observed range — no
    extrapolation). Bucket means are DECIMAL-exact sums (the
    partition-order float-sum rule) divided once, and the interpolant
    is a fixed chain of basic ops over those deterministic doubles —
    bit-stable cross-engine. Shape: one bucket aggregate, a K-row
    per-type grid explode, two frame windows."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type",
        F.floor(F.unix_micros(F.col("ts")) / 3600000000).cast("long").alias("h"),
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(24,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )
    span = obs.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select(
        "event_type", F.explode(F.sequence("h0", "h1")).alias("h")
    )
    joined = grid.join(obs, ["event_type", "h"], "left")
    wb = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    hcol = F.when(F.col("v").isNotNull(), F.col("h"))
    walls = joined.select(
        "event_type",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(hcol, ignorenulls=True).over(wb).alias("ph"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(hcol, ignorenulls=True).over(wf).alias("nh"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("h") - F.col("ph")).cast("double")
        / (F.col("nh") - F.col("ph")).cast("double")
    )
    return walls.select(
        "event_type",
        "h",
        F.col("v").isNotNull().cast("int").alias("is_observed"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .alias("value_i"),
    )


# ---------------------------------------------------------------------------
# A/B assignment + sample-ratio-mismatch check; conversion-time quantiles
# ---------------------------------------------------------------------------

_SRM_ORACLE = """
WITH assigned AS (
  SELECT DISTINCT user_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm
  FROM events
), counts AS (
  SELECT CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_a,
         CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_b
  FROM assigned
)
SELECT n_a, n_b,
       CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
         / CAST(n_a + n_b AS DOUBLE) AS srm_stat,
       CAST(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
            / CAST(n_a + n_b AS DOUBLE) > 3.841 AS INT) AS srm_flag
FROM counts
"""


@query("ab_srm_check", oracle=_SRM_ORACLE)
def _ab_srm_check(spark, sf_dir):
    """Experiment-hygiene check every A/B readout runs FIRST: md5
    coin-flip assignment of users to arms, then the sample-ratio-
    mismatch statistic ``(n_A−n_B)²/(n_A+n_B)`` (the 1-df chi-square
    against a 50/50 split, algebraically simplified to ONE division
    of exact integers — no quantization needed) flagged at the 95%
    critical value 3.841. An SRM flag means the assignment or logging
    is broken and every downstream metric is suspect. One distinct
    aggregate, 1-row output."""
    assigned = (
        table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
                ).cast("long")
                % 2
            ).alias("arm")
        )
    )
    counts = assigned.agg(
        F.count_if(F.col("arm") == 0).cast("long").alias("n_a"),
        F.count_if(F.col("arm") == 1).cast("long").alias("n_b"),
    )
    stat = ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))).cast(
        "double"
    ) / (F.col("n_a") + F.col("n_b")).cast("double")
    return counts.select(
        "n_a",
        "n_b",
        stat.alias("srm_stat"),
        (stat > F.lit(3.841)).cast("int").alias("srm_flag"),
    )


_CTQ_ORACLE = """
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events WHERE event_type IN ('view', 'purchase')
), marked AS (
  SELECT event_id, event_type, us,
         MIN(CASE WHEN event_type = 'purchase' THEN us END) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
         ) AS next_purchase_us
  FROM ev
), gaps AS (
  SELECT next_purchase_us - us AS gap_us FROM marked
  WHERE event_type = 'view' AND next_purchase_us IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converting_views,
       quantile_cont(gap_us, 0.50) AS p50_gap_us,
       quantile_cont(gap_us, 0.90) AS p90_gap_us,
       quantile_cont(gap_us, 0.99) AS p99_gap_us
FROM gaps
"""


@query("conversion_time_quantiles", oracle=_CTQ_ORACLE)
def _conversion_time_quantiles(spark, sf_dir):
    """Latency profile of the view→purchase conversion: p50/p90/p99 of
    the forward-as-of gap over converting views — the number a growth
    team reads beside the funnel rate. Built on the
    asof_forward_next_purchase machinery; quantiles via the bit-equal
    F.percentile ≡ quantile_cont pair (TODO.md standing rule), gaps as
    exact epoch-µs integers."""
    from pyspark.sql import Window

    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("us"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    nxt = F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).over(w)
    gaps = (
        ev.withColumn("npu", nxt)
        .where((F.col("event_type") == "view") & F.col("npu").isNotNull())
        .select((F.col("npu") - F.col("us")).alias("gap_us"))
    )
    return gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_converting_views"),
        F.percentile(F.col("gap_us"), F.lit(0.50)).alias("p50_gap_us"),
        F.percentile(F.col("gap_us"), F.lit(0.90)).alias("p90_gap_us"),
        F.percentile(F.col("gap_us"), F.lit(0.99)).alias("p99_gap_us"),
    )


# ---------------------------------------------------------------------------
# Rolling distinct via HLL register merges (sketch partials reused)
# ---------------------------------------------------------------------------


def _rolling_hll_oracle() -> str:
    from ffi_etl_spark.operators.sketches import (
        HLL_P,
        HLL_TAIL_BITS,
        hll_scale_constant,
    )

    m, b1 = 1 << HLL_P, HLL_TAIL_BITS + 1
    return f"""
WITH h AS (
  SELECT CAST(ts AS DATE) AS d,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events
), rb AS (
  SELECT d, hv % {m} AS bucket,
         CASE WHEN hv // {m} = 0 THEN {b1}
              ELSE {b1} - length(bin(hv // {m})) END AS r
  FROM h
), daily AS (
  SELECT d, bucket, MAX(r) AS reg FROM rb GROUP BY d, bucket
), days AS (
  SELECT DISTINCT d FROM daily
), win AS (
  SELECT w.d, dy.bucket, MAX(dy.reg) AS reg
  FROM days w JOIN daily dy
    ON dy.d <= w.d AND dy.d > w.d - INTERVAL 7 DAY
  GROUP BY w.d, dy.bucket
), z AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS used,
         CAST(SUM(1::BIGINT << CAST({b1} - reg AS INT)) AS BIGINT) AS zp
  FROM win GROUP BY d
), ex AS (
  SELECT w.d, CAST(COUNT(DISTINCT h2.hv) AS BIGINT) AS exact_distinct
  FROM days w JOIN h h2
    ON CAST(h2.d AS DATE) <= w.d AND CAST(h2.d AS DATE) > w.d - INTERVAL 7 DAY
  GROUP BY w.d
)
SELECT z.d AS day,
       CAST(zp + ({m} - used) * (1::BIGINT << {b1}) AS BIGINT) AS z_scaled,
       {hll_scale_constant()!r}
         / CAST(zp + ({m} - used) * (1::BIGINT << {b1}) AS DOUBLE)
         AS hll_estimate,
       exact_distinct
FROM z JOIN ex ON ex.d = z.d
"""


@query("rolling_distinct_hll", oracle=_rolling_hll_oracle())
def _rolling_distinct_hll(spark, sf_dir):
    """Trailing-7-day distinct users per day via HLL REGISTER MERGES —
    the sketch-composition payoff beside rolling_distinct_users' exact
    interval-merge: each day's 1024-register table is built ONCE, and
    every overlapping window answers by MAX-merging seven tiny
    register tables (at 100 TB the raw data is touched once per day,
    not once per window — the partials-reuse property exact distinct
    cannot have). All integers until the single final division; the
    exact twin rides along to expose the estimate error honestly."""
    from ffi_etl_spark.operators.sketches import hll_estimate, hll_registers

    ev = table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("d"), "user_id"
    )
    daily = hll_registers(ev, "user_id", ("d",))
    from pyspark import StorageLevel

    daily = daily.persist(StorageLevel.MEMORY_AND_DISK)
    days = daily.select("d").distinct().withColumnRenamed("d", "day")
    win = (
        days.join(
            daily,
            (F.col("d") <= F.col("day")) & (F.col("d") > F.date_sub(F.col("day"), 7)),
        )
        .groupBy("day", "bucket")
        .agg(F.max("reg").cast("int").alias("reg"))
    )
    est = hll_estimate(win, ("day",)).select("day", "z_scaled", "hll_estimate")
    exact = (
        days.join(
            ev,
            (F.col("d") <= F.col("day")) & (F.col("d") > F.date_sub(F.col("day"), 7)),
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("exact_distinct"))
    )
    return est.join(exact, "day")


# ---------------------------------------------------------------------------
# DSIR budget selection: importance-ranked keep under a token budget
# ---------------------------------------------------------------------------

_DSIR_BUDGET = 10_000


def _dsir_budget_oracle() -> str:
    from ffi_etl_spark.queries_pkg.round5 import _DSIR_ORACLE

    return rf"""
WITH w AS ({_DSIR_ORACLE}
), tk AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ntok
  FROM documents
), ranked AS (
  SELECT w.doc_id, w.weight_q, tk.ntok,
         COALESCE(SUM(tk.ntok) OVER (
           ORDER BY w.weight_q DESC, w.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM w JOIN tk USING (doc_id)
)
SELECT doc_id, weight_q, ntok, CAST(off + ntok AS BIGINT) AS cum_tokens
FROM ranked WHERE off + ntok <= {_DSIR_BUDGET}
"""


@query("dsir_budget_selection", oracle=_dsir_budget_oracle())
def _dsir_budget_selection(spark, sf_dir):
    """The SELECTION completing dsir_importance's weighting: keep the
    highest-importance documents until the token budget fills —
    greedy by (weight_q DESC, doc_id), a document enters iff its
    whole token count still fits (exclusive-prefix + own ≤ budget).
    All integers. The global rank-order cumsum runs through
    ``global_cumsum_exclusive`` (range partition + per-partition
    window + broadcast offsets — the pack_sequences machinery), so no
    single-task window touches the corpus at scale.

    Driver-red r06+r07 post-mortem (round 8): the oracle's
    ``cum_tokens`` was ``off + ntok`` with ``off`` an UNCAST windowed
    SUM — HUGEINT, the registry's only int-on-Spark/float-through-
    pandas-on-DuckDB gated output; now CAST AS BIGINT (standing
    HUGEINT rule). See queries_pkg/round8.py for the full analysis and
    the three stage-bisection probes that ride in the r08 window."""
    from ffi_etl_spark.operators.textops import (
        dsir_importance,
        global_cumsum_exclusive,
    )

    docs = table(spark, sf_dir, "documents")
    w = dsir_importance(docs, F.col("lang") == "en").select("doc_id", "weight_q")
    tk = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("ntok"),
    )
    sel = w.join(tk, "doc_id").withColumn("negw", -F.col("weight_q"))
    off = global_cumsum_exclusive(sel, ["negw", "doc_id"], "ntok", "off")
    return (
        off.where(F.col("off") + F.col("ntok") <= _DSIR_BUDGET)
        .select(
            "doc_id",
            "weight_q",
            "ntok",
            (F.col("off") + F.col("ntok")).alias("cum_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling OLS trend + day-of-week seasonal index
# ---------------------------------------------------------------------------

_ROLL_OLS_DAYS = 14

_ROLL_OLS_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), win AS (
  SELECT event_type, x, y,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(y) OVER w AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY x
               RANGE BETWEEN {_ROLL_OLS_DAYS - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, x AS day_idx, y, n,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
         CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
       END AS slope_14d
FROM win
"""


@query("rolling_ols_trend", oracle=_ROLL_OLS_ORACLE)
def _rolling_ols_trend(spark, sf_dir):
    """Per-day TRAILING-14-day OLS slope of daily volume per event
    type — the rolling model fit a monitoring dashboard plots (is the
    series accelerating TODAY?), beside daily_trend_ols' whole-series
    fit. Every window aggregate is an exact integer moment sum over a
    RANGE frame keyed on the integer day index; the slope is one
    division per row; single-day windows yield NULL (degenerate
    denominator). One K-row-per-type window after the daily rollup —
    the time-keyed frame idiom of window_trailing_30d."""
    from pyspark.sql import Window

    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("x"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rangeBetween(-(_ROLL_OLS_DAYS - 1), Window.currentRow)
    )
    win = daily.select(
        "event_type",
        F.col("x").alias("day_idx"),
        "y",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("x").over(w).cast("long").alias("sx"),
        F.sum("y").over(w).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("long").alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / den.cast("double")
    return win.select(
        "event_type",
        "day_idx",
        "y",
        "n",
        F.when(den != 0, slope).alias("slope_14d"),
    )


_DOW_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), dow AS (
  SELECT event_type, CAST(isodow(d) AS INT) AS iso_dow,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(y) AS BIGINT) AS y_sum
  FROM daily GROUP BY event_type, isodow(d)
), tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd_all,
         CAST(SUM(y) AS BIGINT) AS y_all
  FROM daily GROUP BY event_type
)
SELECT dow.event_type, iso_dow, n_days, y_sum,
       (CAST(y_sum AS DOUBLE) / CAST(n_days AS DOUBLE))
         / (CAST(y_all AS DOUBLE) / CAST(nd_all AS DOUBLE)) AS dow_index
FROM dow JOIN tot ON tot.event_type = dow.event_type
"""


@query("seasonal_dow_index", oracle=_DOW_ORACLE)
def _seasonal_dow_index(spark, sf_dir):
    """Day-of-week seasonal indices per event type: mean daily volume
    on each ISO weekday divided by the overall mean daily volume —
    the multiplicative seasonal profile a forecaster multiplies into
    the trend (index > 1 = above-average weekday). Two divisions of
    exact integers composed in a fixed order — bit-stable. Two K-row
    aggregates off one daily rollup."""
    from pyspark import StorageLevel

    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    iso_dow = (
        F.pmod(F.dayofweek(F.col("d")) + F.lit(5), F.lit(7)) + F.lit(1)
    ).cast("int")
    dow = daily.groupBy("event_type", iso_dow.alias("iso_dow")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("y_sum"),
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nd_all"),
        F.sum("y").cast("long").alias("y_all"),
    )
    idx = (F.col("y_sum").cast("double") / F.col("n_days").cast("double")) / (
        F.col("y_all").cast("double") / F.col("nd_all").cast("double")
    )
    return dow.join(tot, "event_type").select(
        "event_type", "iso_dow", "n_days", "y_sum", idx.alias("dow_index")
    )
