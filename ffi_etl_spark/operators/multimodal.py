"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
small typed metadata struct beside them. The Spark-side machinery —
schema, Arrow batching, ``mapInPandas`` signatures, partition sizing —
is real and tested; the actual codec step is stubbed (the image/audio
libraries are not in this container) behind ``decode_stub``: a
deterministic fake that derives "features" from the bytes, or
``NotImplementedError`` in strict mode.

Scale notes: binary payloads make rows wide — the loader repartitions
by size (``maxRecordsPerBatch`` keeps Arrow batches bounded), and
feature extraction is a narrow ``mapInPandas`` (no shuffle), so the
only shuffle in a typical decode→embed→bucket pipeline is the final
bucketing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, byte_len int, sha256 string, fake_width int, fake_height int"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata adapter: materialize a binary column from text (UTF-8).
    Real deployments read binary straight from parquet/lakehouse."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake 'decode': dimensions derived from content.
    Swap for a real codec (PIL/libav) where available."""
    digest = hashlib.sha256(payload).hexdigest()
    n = len(payload)
    return {
        "byte_len": n,
        "sha256": digest,
        "fake_width": (n % 640) + 1,
        "fake_height": (n % 480) + 1,
    }


def real_decode(payload: bytes) -> dict:  # pragma: no cover - container lacks codecs
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "use decode_stub or install PIL/torchaudio and replace this hook"
    )


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` (not a scalar pandas_udf) because real decoders
    return variable-shape outputs and may drop undecodable rows."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[payload_col].map(decode_stub)
            out = pd.DataFrame(list(feats))
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(_extract, schema=FEATURE_SCHEMA)
