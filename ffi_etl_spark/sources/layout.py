"""Z-order clustered parquet layout — multi-column data skipping.

The reference's storage layer is plain overwrite-per-run Delta tables
(utils.py:124-142) with no clustering; at 100 TB the dominant read cost
is scanning files that cannot be pruned. Sorting by ONE column gives
min/max file skipping on that column only; interleaving the bits of
SEVERAL columns (a Z-order / Morton curve) gives each output file a
tight bounding box in ALL of them, so predicates on any clustered
column prune files.

Everything here is lazy DataFrame logic: the per-column min/max used
for normalization is a 1-row aggregate cross-joined in (broadcast), the
z-value is pure bit arithmetic inside codegen, and the physical
clustering is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``
— the same shape OSS Delta's OPTIMIZE ZORDER BY lowers to (range
partition ids + interleave). No collect, no UDF.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Normalize a numeric column to an integer grid [0, 2^bits):
    (col-min)/(max-min) scaled, constant-range-safe (0 when max==min)."""
    top = F.lit((1 << bits) - 1)
    span = (cmax - cmin).cast("double")
    return F.when(
        span > 0,
        F.floor((col - cmin).cast("double") / span * top.cast("double")).cast("long"),
    ).otherwise(F.lit(0).cast("long"))


def zvalue(scaled_cols: list[Column], bits: int) -> Column:
    """Morton interleave: bit b of column i lands at position
    b*len(cols)+i. For 2 columns at 12 bits that's a 24-bit z-value —
    shift/and/or only, all inside whole-stage codegen."""
    terms = []
    n = len(scaled_cols)
    for b in range(bits):
        for i, c in enumerate(scaled_cols):
            terms.append(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 12,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``.

    One extra pass computes global per-column min/max (tiny 1-row agg,
    broadcast); the z-shuffle is ``repartitionByRange`` so files hold
    contiguous z-ranges — each file's min/max footer then bounds a small
    hyper-rectangle in every clustered column and the scan planner can
    skip files on any of their predicates."""
    mm = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
    )
    with_z = df.crossJoin(F.broadcast(mm))
    scaled = [
        _scaled(F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits) for c in cols
    ]
    (
        with_z.withColumn("_z", zvalue(scaled, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )
