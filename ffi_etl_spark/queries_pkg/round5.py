"""Round-5 gated queries.

dedup_span_scrub completes the span-level dedup story: round 4 shipped
the MEASUREMENT (``dup_span_profile`` — how much cross-doc duplicated
n-gram mass each doc carries); this is the SCRUB (Lee et al. 2021
exact-substring removal — drop every non-canonical occurrence of a
cross-doc duplicated n-token span and rebuild the corpus). No
counterpart in the reference (its dedup surface is row-identity only,
SURVEY.md §2.7); north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (registration idiom parity)

from ffi_etl_spark.catalog import table
from ffi_etl_spark.operators.textops import _SPAN_POS_BITS, scrub_dup_spans
from ffi_etl_spark.queries import query

_SPAN_N = 8

_SPAN_SCRUB_ORACLE = rf"""
WITH toked AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
), base AS (
  SELECT doc_id, toks, len(toks) AS n_tokens FROM toked
), occ AS (
  SELECT doc_id, n_tokens,
         unnest(generate_series(1, greatest(n_tokens - {_SPAN_N - 1}, 1))) AS s
  FROM base
), hashed AS (
  SELECT o.doc_id, o.n_tokens, o.s,
         ('0x' || substr(md5(array_to_string(b.toks[o.s:o.s + {_SPAN_N - 1}], ' ')), 1, 15))::BIGINT AS g
  FROM occ o JOIN base b ON b.doc_id = o.doc_id
), stats AS (
  SELECT g, COUNT(DISTINCT doc_id) AS ddf,
         MIN(doc_id * {1 << _SPAN_POS_BITS} + s) AS canon
  FROM hashed GROUP BY g
), scrub AS (
  SELECT h.doc_id, h.s, h.n_tokens
  FROM hashed h JOIN stats t ON t.g = h.g
  WHERE t.ddf >= 2 AND h.doc_id * {1 << _SPAN_POS_BITS} + h.s <> t.canon
), covered AS (
  SELECT DISTINCT doc_id,
         unnest(generate_series(s, least(s + {_SPAN_N - 1}, n_tokens))) AS ti
  FROM scrub
), toks_pos AS (
  SELECT doc_id, unnest(generate_series(1, n_tokens)) AS ti FROM base
), kept AS (
  SELECT tp.doc_id, tp.ti
  FROM toks_pos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM covered c WHERE c.doc_id = tp.doc_id AND c.ti = tp.ti
  )
), rebuilt AS (
  SELECT k.doc_id, string_agg(b.toks[k.ti], ' ' ORDER BY k.ti) AS scrubbed
  FROM kept k JOIN base b ON b.doc_id = k.doc_id
  GROUP BY k.doc_id
), removed AS (
  SELECT doc_id, COUNT(*) AS nrem FROM covered GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(b.n_tokens AS INT) AS n_tokens,
       CAST(COALESCE(r.nrem, 0) AS INT) AS n_removed,
       md5(COALESCE(rb.scrubbed, '')) AS scrubbed_md5
FROM base b
LEFT JOIN rebuilt rb ON rb.doc_id = b.doc_id
LEFT JOIN removed r ON r.doc_id = b.doc_id
"""


@query("dedup_span_scrub", oracle=_SPAN_SCRUB_ORACLE)
def _dedup_span_scrub(spark, sf_dir):
    """operators/textops.py::scrub_dup_spans over documents — the whole
    scrub (gram hashing, canonical-occurrence election, covered-window
    union, rebuild) is md5/position arithmetic, so the oracle replays
    it end to end and the gate is a full differential on
    (n_tokens, n_removed, md5-of-rebuilt-text) per document."""
    return scrub_dup_spans(table(spark, sf_dir, "documents"), n=_SPAN_N)
