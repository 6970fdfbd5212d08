"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition on a uniform key before a CPU-heavy narrow stage.

    Small corpora arrive as one or few parquet files, and Spark maps
    one scan partition per file — so per-row-expensive work (vector
    math, Python workers, per-shingle hashing) runs on one core unless
    redistributed. One cheap shuffle buys full parallelism; at real
    scale the input has enough splits and AQE coalescing makes the
    repartition a no-op cost-wise."""
    return df.repartition(F.col(key_col))
