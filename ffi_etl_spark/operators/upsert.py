"""Incremental upsert (MERGE) — the lakehouse path beyond the
reference's full-overwrite cadence.

The reference refreshes every table by rewriting it on a schedule
(README.py:11, utils.py:139). At 100 TB that cadence is untenable; the
incremental primitive is MERGE: update matched keys, insert new ones.
Without a transaction log this is expressed as anti-join + union — one
shuffle on the merge key (both inputs hash-partition on it), and with
both tables bucketed on the key (tests/test_bucketing.py) even that
shuffle disappears.

``updates`` wins on conflicts (last-writer). Duplicate keys inside
``updates`` are resolved before merging via deterministic
latest-per-key when a version column is given.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str | None = None,
) -> DataFrame:
    """MERGE INTO target USING updates ON keys:
    WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT."""
    if version_col is not None:
        from ffi_etl_spark.operators.windows import latest_per_key

        updates = latest_per_key(updates, keys, ts_col=version_col, id_col=version_col)
    survivors = target.join(updates.select(keys), keys, "left_anti")
    return survivors.unionByName(updates)
