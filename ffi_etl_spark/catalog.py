"""Parquet-backed table catalog.

The reference addresses persistent medallion layers by 3-part Delta
names via ``spark.table`` (transform_alchemer_data.py:8,
rollup_alchemer_data.py:9, merge_census.py:16).  This engine maps the
same surface onto parquet directories + temp views: ``load_tables``
registers every table under a scale-factor dir, ``table`` resolves one.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

# Tables the driver testdata ships (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize(name: str, df: DataFrame) -> DataFrame:
    """Testdata-specific type repair: events.ts is parquet TIMESTAMP(NANOS).

    Spark 4.1 reads it as TIMESTAMP_NTZ with the nanos truncated to
    Spark's microsecond precision (the legacy ``nanosAsLong`` conf no
    longer applies — verified, and the old long-read repair branch is
    deleted as dead). Cast to the session-zoned TIMESTAMP here so every
    downstream op (``unix_micros``, interval arithmetic, window ranges)
    sees one canonical type; with the engine's UTC session timezone the
    wall-clock values are unchanged and match DuckDB's naive-timestamp
    reading of the same file (bit-equal micros, verified both engines)."""
    if name == "events" and isinstance(df.schema["ts"].dataType, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table (columnar parquet scan — pushdown/pruning capable)."""
    from ffi_etl_spark.session import configure

    configure(spark)
    return _normalize(name, spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES, register: bool = True
) -> dict[str, DataFrame]:
    """Load tables under ``sf_dir``; optionally register temp views.

    Registration gives the SQL entry point (SURVEY.md §3 EP3) the same
    names the DuckDB oracle uses.
    """
    from ffi_etl_spark.session import configure

    configure(spark)
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = _normalize(name, spark.read.parquet(path))
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
