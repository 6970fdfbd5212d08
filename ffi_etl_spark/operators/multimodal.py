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

FEATURE_COLS = "byte_len int, sha256 string, fake_width int, fake_height int"


def _out_schema(df: DataFrame, id_col: str, rest: str) -> str:
    """Output schema with the id column's NAME and TYPE taken from the
    input frame — a non-default ``id_col`` keeps its identity instead of
    being silently renamed to ``doc_id`` and retyped long."""
    dt = dict(df.dtypes)[id_col]
    return f"`{id_col}` {dt}, {rest}"


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
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    from ffi_etl_spark.operators.util import spread

    return spread(df, id_col).select(id_col, payload_col).mapInPandas(
        _extract, schema=_out_schema(df, id_col, FEATURE_COLS)
    )


RESIZE_COLS = (
    "byte_len int, fake_width int, fake_height int, "
    "out_width int, out_height int, resized_sha string"
)

FRAME_COLS = "frame_idx int, frame_sha string, frame_chars int"


def resize_stub(payload: bytes, width: int, height: int) -> dict:
    """Deterministic fake 'resize': output dims are the requested ones,
    content hash mixes the target size into the digest (stand-in for a
    real resampler's output bytes)."""
    digest = hashlib.sha256(payload + f"{width}x{height}".encode()).hexdigest()
    return {"out_width": width, "out_height": height, "resized_sha": digest}


def resize_images(
    df: DataFrame,
    width: int = 224,
    height: int = 224,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode -> resize pipeline stage over the binary column; narrow
    (no shuffle), Arrow-batched."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                meta = decode_stub(payload)
                out = resize_stub(payload, width, height)
                rows.append(
                    {
                        id_col: doc_id,
                        "byte_len": meta["byte_len"],
                        "fake_width": meta["fake_width"],
                        "fake_height": meta["fake_height"],
                        **out,
                    }
                )
            yield pd.DataFrame(rows)

    from ffi_etl_spark.operators.util import spread

    return spread(df, id_col).select(id_col, payload_col).mapInPandas(
        _resize, schema=_out_schema(df, id_col, RESIZE_COLS)
    )


def sample_frames(
    df: DataFrame,
    frame_chars: int = 256,
    every_n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: one input row
    fans out to a variable number of frame rows, every ``every_n``-th
    kept — the exact shape a real decoder produces, which is why this
    is ``mapInPandas`` (variable-cardinality output) and not a scalar
    UDF. The deterministic fake treats each ``frame_chars``-character
    text chunk as one 'frame' (empty docs yield one empty frame)."""
    import math

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                t = text or ""
                n = max(1, math.ceil(len(t) / frame_chars))
                for i in range(0, n, every_n):
                    chunk = t[i * frame_chars : (i + 1) * frame_chars]
                    rows.append(
                        {
                            id_col: doc_id,
                            "frame_idx": i,
                            "frame_sha": hashlib.sha256(chunk.encode()).hexdigest(),
                            "frame_chars": len(chunk),
                        }
                    )
            yield pd.DataFrame(rows)

    from ffi_etl_spark.operators.util import spread

    return spread(df, id_col).select(id_col, text_col).mapInPandas(
        _frames, schema=_out_schema(df, id_col, FRAME_COLS)
    )


def extract_features_arrow(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """``mapInArrow`` twin of ``extract_features``: identical features,
    but the Python boundary stays on raw Arrow RecordBatches — no
    pandas Series materialization, no object-dtype boxing of the binary
    payloads. For multi-MB media payloads that boxing is the dominant
    Python-side cost of the pandas lane, so this is the preferred form
    when the decode fn consumes raw bytes anyway (codecs do). Output
    parity with the pandas lane is locked by
    test_multimodal_arrow_matches_pandas."""
    import pyarrow as pa

    def _extract(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            payloads = batch.column(batch.schema.get_field_index(payload_col))
            feats = [decode_stub(p.as_py()) for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array([f["byte_len"] for f in feats], pa.int32()),
                    pa.array([f["sha256"] for f in feats], pa.string()),
                    pa.array([f["fake_width"] for f in feats], pa.int32()),
                    pa.array([f["fake_height"] for f in feats], pa.int32()),
                ],
                names=[id_col, "byte_len", "sha256", "fake_width", "fake_height"],
            )

    from ffi_etl_spark.operators.util import spread

    return spread(df, id_col).select(id_col, payload_col).mapInArrow(
        _extract, schema=_out_schema(df, id_col, FEATURE_COLS)
    )


AHASH_BITS = 60  # 4 bands x 15 bits; stays clear of the sign bit


def _ahash_int(text: str) -> int:
    """60-bit average hash over 60 evenly-sampled character codes:
    bit i set iff sample i is above the sample mean (strictly — ties
    clear, via the exact integer cross-multiplication 60·p > Σp).
    Pure integer arithmetic over codepoints, so a SQL oracle replays
    it exactly (ascii(substr(...)) == ord)."""
    n = len(text)
    ps = [ord(text[(i * n) // AHASH_BITS]) for i in range(AHASH_BITS)]
    s = sum(ps)
    h = 0
    for i, p in enumerate(ps):
        if AHASH_BITS * p > s:
            h |= 1 << i
    return h


def ahash_signatures(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Perceptual average-hash signatures computed THROUGH the
    multimodal Arrow lane: payload bytes -> decoded text -> sampled
    codepoint grid -> 60-bit threshold hash (the aHash shape a real
    image pipeline applies to an 8x8 luma grid; here the deterministic
    stand-in samples the decoded byte stream, so the full lane —
    binary column in, Arrow batches, Python decode, integer hash out —
    is exercised AND SQL-replayable). Empty payloads are dropped (no
    samples to hash). Narrow (no shuffle)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                text = bytes(payload).decode("utf-8")
                if not text:
                    continue
                rows.append(
                    {id_col: doc_id, "n_chars": len(text), "ahash": _ahash_int(text)}
                )
            yield pd.DataFrame(rows, columns=[id_col, "n_chars", "ahash"])

    from ffi_etl_spark.operators.util import spread

    return spread(df, id_col).select(id_col, payload_col).mapInPandas(
        _hash, schema=_out_schema(df, id_col, "n_chars long, ahash long")
    )


def phash_neardup_pairs(
    sigs: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Hamming-banded near-dup pairs over aHash signatures: 4 bands of
    15 bits (pigeonhole: any pair within Hamming ≤ 3 shares at least
    one exact band), candidates deduped before the exact
    ``bit_count(xor)`` verify — the dedup_simhash plan shape applied
    to the multimodal perceptual hash."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("ahash"), 15 * b)
                .bitwiseAND(F.lit(0x7FFF))
                .alias("key"),
            )
            for b in range(4)
        ]
    )
    banded = sigs.select(
        F.col(id_col).alias("id"), F.col("ahash"), F.explode(bands).alias("b")
    ).select("id", "ahash", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    a, bb = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
