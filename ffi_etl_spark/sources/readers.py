"""Readers (SURVEY.md §2.1 S1-S5).

The reference ingests published CSVs with driver pandas
(extract_alchemer_data.py:8-9, utils.py:43-46, merge_census.py:8) and
lifts them via ``spark.createDataFrame`` (S4). Here ingest is
distributed ``spark.read`` with explicit schemas; the pandas lift
survives only as the adapter for genuinely driver-local frames (tiny
config sheets), Arrow-enabled.

Scale: CSV scans parallelize per file-split; schemas are explicit so no
inference pass reads the data twice; config sheets are the only
driver-side reads and are bounded by definition.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Header CSV read (S1-S3). With ``schema=None`` all columns land as
    string — the reference's effective behavior after its ``astype(str)``
    merge-key casts (extract_alchemer_data.py:20-21)."""
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", False)  # all-string, no extra pass
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_csv_url(
    spark: SparkSession,
    url: str,
    schema: StructType | str | None = None,
    timeout: float = 30.0,
    **options,
) -> DataFrame:
    """S1/S2: published-CSV ingest over HTTP (the reference reads its
    survey extracts and config sheets straight from published
    Google-Sheets CSV URLs: extract_alchemer_data.py:8-9,
    utils.py:43-46). The fetch is driver-side by design — these
    endpoints are single small documents, not data lakes — but the
    bytes land in CLUSTER-VISIBLE storage (``spark.sql.warehouse.dir``,
    written through the Hadoop FileSystem API so local / HDFS / S3A
    warehouses all work) before the distributed ``read_csv``: a
    driver-local temp file would be invisible to executors on any
    multi-node cluster. The landed file is the ingest's bronze
    artifact, addressed by content digest (re-fetching identical bytes
    overwrites idempotently); it must outlive this call because the
    returned DataFrame reads it lazily. Accepts any urllib-supported
    scheme (http/https/file)."""
    import hashlib
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout) as resp:
        data = resp.read()

    import uuid

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    digest = hashlib.sha1(data).hexdigest()
    dest = f"{warehouse.rstrip('/')}/_url_ingest/{digest}.csv"
    # Hadoop FS write (Py4J): the one API that targets whatever
    # filesystem the warehouse actually lives on.
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(dest)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    # Content-addressed landing must never truncate in place: a second
    # session ingesting the same URL while another session's lazy
    # DataFrame scans the landed file would expose a partial write.
    # The name IS the content digest, so an existing destination
    # already holds these exact bytes — skip. Otherwise write to a
    # session-unique temp name and rename() in (atomic on HDFS and
    # local FS; object stores make it a copy, still never a truncate).
    if not fs.exists(jpath):
        jtmp = jvm.org.apache.hadoop.fs.Path(f"{dest}._tmp_{uuid.uuid4().hex}")
        out = fs.create(jtmp, True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        if not fs.rename(jtmp, jpath):
            # lost a race to a concurrent identical ingest: the winner's
            # bytes are identical (same digest); drop the temp file.
            fs.delete(jtmp, False)
    return read_csv(spark, dest, schema=schema, **options)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan (S5 analog) — pushdown/pruning capable."""
    return spark.read.parquet(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """JSON-lines read. An explicit schema skips Spark's inference pass
    (which scans the whole input once before the real read — at 100 TB
    that doubles the scan); with ``schema=None`` inference is allowed
    for ad-hoc exploration only."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def lift_pandas(spark: SparkSession, pdf: pd.DataFrame, schema: StructType | str | None = None) -> DataFrame:
    """S4: driver pandas frame -> distributed DataFrame (Arrow path).
    Legitimate only for small config/census sheets."""
    if schema is not None:
        return spark.createDataFrame(pdf, schema=schema)
    return spark.createDataFrame(pdf)


def config_map(df: DataFrame, key_col: str, value_col: str) -> dict[str, str]:
    """S2: a two-column config sheet -> driver dict (utils.py:51-53).
    The collect is bounded: config sheets are tens of rows."""
    return {r[key_col]: r[value_col] for r in df.select(key_col, value_col).collect()}


def config_list(df: DataFrame, col: str) -> list[str]:
    """S2: a one-column config sheet -> driver list (utils.py:59,97)."""
    return [r[col] for r in df.select(col).collect() if r[col] is not None]


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC columnar scan — same pushdown/pruning class as parquet for
    estates standardized on ORC (Hive lineage). Kept schema-explicit by
    the format itself; no inference pass."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw-file ingest for multimodal payloads (``binaryFile`` source):
    one row per file with (path, modificationTime, length, content
    binary). The entry point that turns an image/audio dump into the
    opaque-binary + metadata shape operators/multimodal.py consumes —
    files become splits (never driver-collected), so a 100 TB media
    corpus ingests with the same parallelism as any table scan.
    ``glob`` filters by name pattern (e.g. ``*.jpg``) BEFORE any read."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_csv_lenient(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
    **options,
) -> DataFrame:
    """Schema'd CSV read that QUARANTINES malformed rows instead of
    failing or silently dropping them: PERMISSIVE mode parks each
    unparseable line, whole, in ``corrupt_col`` (appended to the
    schema here) with every typed column null. Callers split on
    ``col(corrupt_col).isNotNull()`` and route the quarantine to a
    dead-letter sink.

    This makes the reference's accidental policy explicit and safe:
    its writers swallowed exceptions (utils.py:140-142) and its
    cleaners ignored missing columns (transform_alchemer_data.py:31-33)
    — fail-fast core, lenient EDGE, with the lenience now visible as
    data instead of lost as prints. At 100 TB a handful of mangled
    lines must never kill a 1000-executor job, and they must still be
    accounted for."""
    from pyspark.sql.types import StringType

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    full = schema.add(corrupt_col, StringType(), True)
    reader = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(full)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def avro_available(spark: SparkSession) -> bool:
    """True when the ``spark-avro`` module is on the session's JVM
    classpath. Avro ships as an EXTERNAL Spark module (the jar is not
    in this container — SCALING.md documents the skip), so the reader
    below probes capability instead of assuming it. The probe is
    Spark's OWN resolution path (``DataSource.lookupDataSource``), not
    a bare ``Class.forName``: the pip pyspark distribution ships some
    ``sql.avro`` classes (from_avro/to_avro support) while the actual
    file source is still absent, so a class lookup false-positives —
    only the data-source registry answer matches what ``spark.read``
    will do. No read is attempted."""
    try:
        jvm = spark._jvm  # noqa: SLF001 — capability probe needs the JVM
        jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()  # noqa: SLF001
        )
        return True
    except Exception:  # noqa: BLE001 — any JVM lookup failure == absent
        return False


def read_avro(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Avro scan, gated on ``avro_available``. On a cluster with the
    external module (``--packages org.apache.spark:spark-avro_2.13``)
    this is the same explicit-schema reader pattern as every other
    format here; without it, fail at the API boundary with the remedy
    in the message rather than deep in a job submit. Avro is row-major
    — fine as an INGEST format (Kafka/CDC lineage), but convert to
    parquet/ORC at the bronze layer for scan-heavy analytics (no
    column pruning or min/max skipping on Avro)."""
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro is not on this cluster's classpath; add the external "
            "module (e.g. spark.jars.packages=org.apache.spark:spark-avro_2.13:"
            "<spark version>) and retry. See SCALING.md 'Format coverage'."
        )
    reader = spark.read.format("avro")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented raw-text scan (``text`` source): one row per line,
    single ``value`` string column. The ingest shape for line-delimited
    corpora (one document per line, the common crawl-dump export
    layout) — splits follow HDFS block boundaries, so a 100 TB text
    dump parallelizes like any table scan."""
    return spark.read.text(path)


def read_text_docs(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Whole-file raw-text ingest: one row per FILE with
    (doc_id = file path, text = full contents) — the `documents`-table
    shape the dedup/quality/tokenizer operators consume, straight from
    a directory of .txt/.md files.

    Uses ``wholetext=True``, so each file must fit an executor's task
    memory (fine for documents; use ``read_binary_files`` +
    a decode step for large media payloads). Files never pass through
    the driver, and ``glob`` filters names BEFORE any read.

    Both options ride the ``.text()`` call itself: pyspark's reader
    wrapper re-sets its keyword defaults over any earlier
    ``option()`` calls, so ``spark.read.option("wholetext", True)
    .text(p)`` silently reads per-line."""
    return spark.read.text(path, wholetext=True, pathGlobFilter=glob).select(
        F.input_file_name().alias("doc_id"), F.col("value").alias("text")
    )
