"""Versioned table storage — Delta-style time travel on plain parquet.

The reference overwrites every table in place each run (utils.py:139),
destroying history. This writer keeps each overwrite as an immutable
snapshot directory (``path/v=N``) with an atomically-swapped ``_LATEST``
pointer, giving:

  * time travel: ``read_version(spark, path, n)``;
  * safe concurrent readers: a reader of v=3 is unaffected by the
    writer publishing v=4 (snapshots are immutable);
  * cheap rollback: re-point ``_LATEST``;
  * bounded history: ``vacuum_versions`` keeps the newest K snapshots.

This is the single-writer subset of a table format (no compare-and-swap
across writers, no partition-level manifests) — at multi-writer scale
use a real lakehouse format; the engine's operators are storage-agnostic
either way.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_LATEST = "_LATEST"


def _versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )


def latest_version(path: str) -> int | None:
    """The published version (from the pointer; falls back to max dir)."""
    ptr = os.path.join(path, _LATEST)
    if os.path.isfile(ptr):
        with open(ptr) as f:
            return int(f.read().strip())
    vs = _versions(path)
    return vs[-1] if vs else None


def write_version(df: DataFrame, path: str) -> int:
    """Publish the DataFrame as the next snapshot. The snapshot is fully
    written before the pointer moves, so readers never observe a partial
    version."""
    os.makedirs(path, exist_ok=True)
    current = latest_version(path)
    nxt = 0 if current is None else current + 1
    df.write.mode("overwrite").parquet(os.path.join(path, f"v={nxt}"))
    tmp = os.path.join(path, _LATEST + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(nxt))
    os.replace(tmp, os.path.join(path, _LATEST))  # atomic pointer swap
    return nxt


def read_version(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Read a snapshot (default: the published latest)."""
    v = latest_version(path) if version is None else version
    if v is None or not os.path.isdir(os.path.join(path, f"v={v}")):
        raise FileNotFoundError(f"no version {version!r} under {path}")
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def rollback(path: str, version: int) -> None:
    """Re-point _LATEST at an existing older snapshot."""
    if not os.path.isdir(os.path.join(path, f"v={version}")):
        raise FileNotFoundError(f"no version {version} under {path}")
    tmp = os.path.join(path, _LATEST + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(path, _LATEST))


def vacuum_versions(path: str, keep: int = 3) -> list[int]:
    """Delete all but the newest ``keep`` snapshots (never the published
    one). Returns the versions removed."""
    published = latest_version(path)
    vs = _versions(path)
    removable = [v for v in vs[:-keep] if v != published] if keep > 0 else []
    for v in removable:
        shutil.rmtree(os.path.join(path, f"v={v}"))
    return removable


def snapshot_diff(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data-capture between two snapshots, computed relationally.

    Without ``key_cols``: row-level diff via two anti joins —
    ``_change`` is 'insert' (row only in ``to``) or 'delete' (row only
    in ``from``); an updated row appears as delete+insert.

    With ``key_cols``: keyed CDC — a full-outer join on the keys
    classifies each key as 'insert', 'delete', or 'update' (same key,
    any non-key column changed), the shape downstream MERGE consumers
    expect. Each variant is one shuffle pair on the same key columns.
    """
    old = read_version(spark, path, from_version)
    new = read_version(spark, path, to_version)
    from pyspark.sql import functions as F

    if not key_cols:
        inserts = new.exceptAll(old).withColumn("_change", F.lit("insert"))
        deletes = old.exceptAll(new).withColumn("_change", F.lit("delete"))
        return inserts.unionByName(deletes)

    val_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in key_cols],
        F.struct(*val_cols).alias("_o_vals"),
    )
    n = new.select(*key_cols, F.struct(*val_cols).alias("_n_vals"))
    cond = [n[k].eqNullSafe(o[f"_o_{k}"]) for k in key_cols]
    joined = n.join(o, cond, "full_outer")
    change = (
        F.when(o[f"_o_{key_cols[0]}"].isNull(), F.lit("insert"))
        .when(n[key_cols[0]].isNull(), F.lit("delete"))
        .when(~F.col("_n_vals").eqNullSafe(F.col("_o_vals")), F.lit("update"))
    )
    keys_out = [
        F.coalesce(n[k], o[f"_o_{k}"]).alias(k) for k in key_cols
    ]
    return (
        joined.withColumn("_change", change)
        .filter(F.col("_change").isNotNull())
        .select(*keys_out, "_n_vals", "_o_vals", "_change")
    )
