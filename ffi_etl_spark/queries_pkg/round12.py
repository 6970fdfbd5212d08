"""Round-12 gated queries: product quantization (PQ) — the
compression tier past scalar quantization.

``operators/quantize.py::pq_train_encode`` / ``pq_adc_topk`` run PQ
entirely in exact integer arithmetic (fixed-point floored-mean
centroids, integer squared-L2 assignment and ADC), so the WHOLE
program — per-dimension SQ codebook, subspace split, two Lloyd rounds
per subspace, encoding, the per-probe look-up table, and the
asymmetric-distance ranking — replays bit-for-bit as one DuckDB CTE
chain. A training bug, a fixed-point bug, an argmin tie bug, or an
ADC-sum bug each fails the hash, not a recall curve.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table
from ffi_etl_spark.queries import query

_PQ_SLICE = 500
_PQ_DIM = 64
_PQ_M = 8        # subspaces of 8 dims each
_PQ_KSUB = 16    # 4-bit subcentroid ids
_PQ_ROUNDS = 2
_PQ_QMOD = 25    # 20 probe vectors
_PQ_K = 10


def _pq_adc_oracle(tail: str | None = None) -> str:
    """Replay the exact PQ program: SQ codes over the slice, m
    per-subspace Lloyd chains (floored fixed-point means, integer L2
    argmin with ties to the lower cid), the probe LUT against the
    final codebooks, and the ADC sum — every value a BIGINT. ``tail``
    (the re-rank gate) continues past the ADC ranking; None closes
    with the ADC top-k select."""
    d_sub = _PQ_DIM // _PQ_M
    steps = []
    prev = "a0"
    for r in range(1, _PQ_ROUNDS + 1):
        steps.append(f"""c{r} AS (
  SELECT j, cid, p, CAST(FLOOR(SUM(code) * 1024.0 / COUNT(*)) AS BIGINT) AS cent
  FROM sub JOIN {prev} USING (vec_id, j)
  GROUP BY j, cid, p
), a{r} AS (
  SELECT vec_id, j, cid FROM (
    SELECT vec_id, j, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j
                              ORDER BY d2 ASC, cid ASC) AS rk
    FROM (
      SELECT s.vec_id, s.j, c.cid,
             SUM((s.code * 1024 - c.cent) * (s.code * 1024 - c.cent)) AS d2
      FROM sub s JOIN c{r} c ON c.j = s.j AND c.p = s.p
      GROUP BY s.vec_id, s.j, c.cid
    )
  ) WHERE rk = 1
)""")
        prev = f"a{r}"
    chain = ",\n".join(steps)
    if tail is None:
        tail = f"""
SELECT query_id, neighbor_id, adc_d2, rank::INT AS rank
FROM ranked WHERE rank <= {_PQ_K}"""
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id < {_PQ_SLICE}
), dimstats AS (
  SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
  FROM e CROSS JOIN (SELECT unnest(generate_series(1, {_PQ_DIM})) AS i)
  GROUP BY i
), codes AS (
  SELECT e.vec_id, d.i,
         CASE WHEN d.mx = d.mn THEN 0
              ELSE GREATEST(0, LEAST(255,
                CAST(FLOOR((e.v[d.i] - d.mn) * 255.0 / (d.mx - d.mn)) AS BIGINT)))
         END AS code
  FROM e CROSS JOIN dimstats d
), sub AS (
  SELECT vec_id, CAST((i - 1) // {d_sub} AS INT) AS j,
         (i - 1) % {d_sub} AS p, code
  FROM codes
), a0 AS (
  SELECT DISTINCT vec_id, j, CAST(vec_id % {_PQ_KSUB} AS INT) AS cid FROM sub
),
{chain},
lut AS (
  SELECT s.vec_id AS qid, s.j, c.cid,
         SUM((s.code * 1024 - c.cent) * (s.code * 1024 - c.cent)) AS d2
  FROM sub s JOIN c{_PQ_ROUNDS} c ON c.j = s.j AND c.p = s.p
  WHERE s.vec_id % {_PQ_QMOD} = 0
  GROUP BY s.vec_id, s.j, c.cid
), scored AS (
  SELECT l.qid AS query_id, a.vec_id AS neighbor_id,
         CAST(SUM(l.d2) AS BIGINT) AS adc_d2
  FROM a{_PQ_ROUNDS} a JOIN lut l ON l.j = a.j AND l.cid = a.cid
  WHERE a.vec_id <> l.qid
  GROUP BY l.qid, a.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, adc_d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_d2 ASC, neighbor_id ASC) AS rank
  FROM scored
){tail}
"""


_PQ_RERANK = 4


def _pq_rerank_tail() -> str:
    """The re-rank continuation: ADC shortlist of rerank_factor·k,
    exact 64-term integer d2 over the full SQ codes, final rank."""
    return f""", short AS (
  SELECT query_id, neighbor_id FROM ranked WHERE rank <= {_PQ_RERANK * _PQ_K}
), rr AS (
  SELECT s.query_id, s.neighbor_id,
         CAST(SUM((cq.code - cn.code) * (cq.code - cn.code)) AS BIGINT)
           AS code_d2
  FROM short s
  JOIN codes cn ON cn.vec_id = s.neighbor_id
  JOIN codes cq ON cq.vec_id = s.query_id AND cq.i = cn.i
  GROUP BY s.query_id, s.neighbor_id
), rranked AS (
  SELECT query_id, neighbor_id, code_d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY code_d2 ASC, neighbor_id ASC) AS rank
  FROM rr
)
SELECT query_id, neighbor_id, code_d2, rank::INT AS rank
FROM rranked WHERE rank <= {_PQ_K}"""


@query("pq_adc_topk", oracle=_pq_adc_oracle())
def _pq_adc_topk(spark, sf_dir):
    """Product-quantized ADC top-k end to end
    (operators/quantize.py::pq_train_encode + pq_adc_topk): SQ-code
    the slice, train 16 subcentroids per 8-dim subspace with two
    exact-integer Lloyd rounds, encode every vector as 8 subcentroid
    ids (16× less candidate storage than SQ, 64× less than float),
    then rank by asymmetric distance — per candidate, 8 LUT lookups +
    an 8-term integer sum instead of a 64-term fold. The oracle
    replays the whole program; the gate's exactness claim is the
    fixed-point/argmin/ADC machinery, while the recall-for-compression
    trade is pytest-locked against exact code-space kNN
    (tests/test_round12.py)."""
    from ffi_etl_spark.operators.quantize import (
        pq_adc_topk,
        pq_train_encode,
        quantize_codes_long,
    )

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _PQ_SLICE)
    # one SQ pass feeds training, encoding, and the probe LUTs
    codes = quantize_codes_long(emb).localCheckpoint(eager=True)
    codebooks, encoded = pq_train_encode(
        codes, dim=_PQ_DIM, m=_PQ_M, k_sub=_PQ_KSUB, n_iter=_PQ_ROUNDS
    )
    probes = list(range(0, _PQ_SLICE, _PQ_QMOD))
    return pq_adc_topk(
        codebooks, encoded, codes, probes, k=_PQ_K, dim=_PQ_DIM, m=_PQ_M
    ).select(
        F.col("pid").alias("query_id"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("adc_d2"),
        F.col("rk").alias("rank"),
    )


@query("pq_adc_rerank", oracle=_pq_adc_oracle(_pq_rerank_tail()))
def _pq_adc_rerank(spark, sf_dir):
    """ADC shortlist + exact code-space re-rank
    (operators/quantize.py::pq_adc_rerank_topk) — the int8 IVF tier's
    recall-recovery pattern applied to PQ: the cheap asymmetric pass
    keeps rerank_factor·k candidates per probe, then ONLY those pay
    the exact 64-term integer d2 over the full SQ codes. Still exact
    BIGINT end to end, so the oracle replays shortlist AND re-rank to
    the hash; recall vs exact code-space kNN is pytest-locked (ADC
    alone 0.24 at gate scale, re-ranked ≥0.5 at factor 4)."""
    from ffi_etl_spark.operators.quantize import (
        pq_adc_rerank_topk,
        pq_train_encode,
        quantize_codes_long,
    )

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _PQ_SLICE)
    codes = quantize_codes_long(emb).localCheckpoint(eager=True)
    codebooks, encoded = pq_train_encode(
        codes, dim=_PQ_DIM, m=_PQ_M, k_sub=_PQ_KSUB, n_iter=_PQ_ROUNDS
    )
    probes = list(range(0, _PQ_SLICE, _PQ_QMOD))
    return pq_adc_rerank_topk(
        codebooks, encoded, codes, probes,
        k=_PQ_K, rerank_factor=_PQ_RERANK, dim=_PQ_DIM, m=_PQ_M,
    ).select(
        F.col("pid").alias("query_id"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("code_d2"),
        F.col("rk").alias("rank"),
    )
