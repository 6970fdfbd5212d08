"""Python UDTFs — the LATERAL table-function lane (Spark 4).

One demonstration UDTF with an exact native twin: ``ChunkUdtf``
reproduces ``operators/textops.py::chunk_documents`` row-for-row
(parity locked by ``test_chunk_udtf_matches_native``). The native
operator remains the production path — it is whole-stage-codegen'd
and shuffle-free, while a UDTF pays a Python worker round-trip per
partition. The lane earns its place for table functions whose
per-row fan-out logic genuinely needs Python (a real tokenizer, a
parser emitting variable records); anything expressible with
``explode``/``sequence``/``slice`` should stay native.

Usage::

    spark.udtf.register("chunk_doc", ChunkUdtf)
    spark.sql(\"\"\"
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM documents d, LATERAL chunk_doc(d.text, 64, 32) c
    \"\"\")
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# Java's \s is ASCII-only ([ \t\n\x0B\f\r]); Python's \s is Unicode by
# default (would also split NBSP etc.) — use the Java class verbatim.
_WS = re.compile(r"[ \t\n\x0B\f\r]+")
# Spark's trim strips 0x20 spaces only; Python .strip() strips all
# whitespace — restrict to match.
_TRIM = " "


@udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
class ChunkUdtf:
    """Sliding token-window chunker; semantics bit-match
    ``chunk_documents`` including its edge artifacts: empty text yields
    one empty chunk of n_tokens=1 (Spark's ``split`` of an empty string
    is ``[""]``), ``trim`` strips only 0x20 spaces, and the token
    splitter is Java's ASCII-only ``\\s`` — the twin must reproduce all
    of that, not fix it, or the differential would hide real
    divergence."""

    def eval(self, text: str, chunk_tokens: int, stride: int):
        tokens = _WS.split((text or "").strip(_TRIM))
        for idx, start in enumerate(range(1, max(len(tokens), 1) + 1, stride)):
            chunk = " ".join(tokens[start - 1 : start - 1 + chunk_tokens])
            yield idx, chunk, len(_WS.split(chunk))
