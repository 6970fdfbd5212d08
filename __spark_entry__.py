"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (demographic roll-up) at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ffi_etl_spark import queries as Q
from ffi_etl_spark.session import configure


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure(spark)
    return Q.QUERIES["rollup_demographic"](spark, "/root/testdata/sf0.001")


def _configured(fn: Callable[[SparkSession, str], DataFrame]):
    """Apply the engine's session confs (UTC, nanosAsLong, LEGACY
    parser, non-ANSI casts — all runtime-settable) before building the
    plan, so queries behave identically under a driver-created session
    that didn't go through session.get_session."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _configured(fn) for name, fn in Q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key (same aliased column names)."""
    return dict(Q.ORACLES)
