"""Query registry: named (spark, sf_dir) -> DataFrame callables + DuckDB oracles.

Every operator from SURVEY.md §2 (and every extension operator) is
exposed here twice: as an idiomatic-Spark callable and as the ANSI SQL
a DuckDB oracle runs on the same parquet tables. Column names are
aliased identically on both sides (the driver hash-compares values
after sorting columns by name).

Registration idiom::

    @query("name", oracle=\"\"\"SELECT ...\"\"\")
    def _(spark, sf_dir): ...

Queries whose semantics are not SQL-expressible register with
``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} — a silent overwrite "
                "would shadow one implementation's gate with another's"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Importing the query modules populates the registry.
from ffi_etl_spark.queries_pkg import (  # noqa: E402,F401
    reference_surface,
    extensions,
    olap_spines,
    olap_spines2,
    breadth,
    profiling,
    behavioral,
    datamix,
    audit,
)
