"""Distributed URL-CSV connector via the Python Data Source API (Spark 4).

The reference ingests published CSVs by downloading them on the driver
with pandas (extract_alchemer_data.py:8-9, utils.py:43-46). The thin
shim ``readers.read_csv_url`` keeps that single-document shape; THIS
source is the scale form: each URL becomes an input partition, so a
manifest of thousands of published extracts (one per site/month/etc.)
downloads and parses across the cluster, not on the driver.

Usage::

    spark.dataSource.register(UrlCsvDataSource)
    df = (spark.read.format("urlcsv")
          .schema("`Response ID` string, `Gender` string")
          .option("urls", "https://a/x.csv,https://b/y.csv")
          .load())

Design notes (the parts that matter at scale):

  * one partition per URL — fetch parallelism == cluster parallelism,
    and a failed fetch retries ONE url via normal task retry, not the
    whole manifest;
  * the reader yields Arrow ``RecordBatch``es (the zero-copy lane of
    the Python Data Source API), parsed with ``pyarrow.csv`` — no
    per-row Python objects anywhere;
  * the user schema prunes columns at parse time (``include_columns``),
    so unrequested columns never materialize — the connector-level
    analog of parquet column pruning;
  * all columns are read as strings (the reference's effective
    ``astype(str)`` behavior); typed casts belong to the query layer.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType

DEFAULT_COLUMNS = ("Response ID",)


class UrlPartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


class UrlCsvReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        # all-strings is the connector's contract (module docstring);
        # fail here with a clear message instead of letting executors
        # emit Arrow batches whose types contradict the declared schema
        bad = [f.name for f in schema.fields if not isinstance(f.dataType, StringType)]
        if bad:
            raise ValueError(
                "urlcsv reads every column as string (typed casts belong to "
                f"the query layer); non-string fields declared: {bad}"
            )
        self.schema = schema
        urls = options.get("urls", "")
        self.urls = [u.strip() for u in urls.split(",") if u.strip()]
        self.timeout = float(options.get("timeout", "30"))

    def partitions(self) -> Sequence[InputPartition]:
        return [UrlPartition(u) for u in self.urls]

    def read(self, partition: UrlPartition) -> Iterator:
        import io
        import urllib.request

        import pyarrow as pa
        import pyarrow.csv as pacsv

        with urllib.request.urlopen(partition.url, timeout=self.timeout) as resp:
            raw = resp.read()
        names = [f.name for f in self.schema.fields]
        table = pacsv.read_csv(
            io.BytesIO(raw),
            convert_options=pacsv.ConvertOptions(
                include_columns=names,
                include_missing_columns=True,  # absent column -> all-null
                column_types={n: pa.string() for n in names},
            ),
        )
        # align column order to the declared schema
        table = table.select(names)
        yield from table.to_batches()


class UrlCsvDataSource(DataSource):
    """``format("urlcsv")`` — distributed fetch+parse of published CSVs."""

    @classmethod
    def name(cls) -> str:
        return "urlcsv"

    def schema(self) -> StructType:
        # without a user schema, expose the reference's key column only;
        # real use passes .schema(...) (no inference fetch is performed —
        # at scale a schema-inference pass would double every download)
        return StructType([StructField(c, StringType()) for c in DEFAULT_COLUMNS])

    def reader(self, schema: StructType) -> UrlCsvReader:
        return UrlCsvReader(schema, self.options)
