"""Vector expressions over array<float|double> embedding columns.

All math is elementwise-cast to double and folded IN ARRAY ORDER
(``F.aggregate`` is a sequential fold), so results are bit-identical
across partitionings and to a DuckDB oracle that sums in list order.
Stays fully JVM-side (higher-order functions) — a Pandas UDF would be
faster per-batch for very high dims but adds an Arrow boundary; at
dim≈64-1024 the codegen'd fold wins by staying in the stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm2(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def cosine_prenorm(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with the two vector norms already materialized as columns.

    Bit-identical to ``cosine`` (same ``dot/(sqrt(dot)·sqrt(dot))``
    expression, just factored), but the per-pair work drops from three
    64-element folds to ONE: norms are computed once per VECTOR (narrow,
    pre-join) instead of once per PAIR. On an n·K candidate join that is
    a 3× cut of the dominant cost, and it shrinks the expression tree
    Catalyst must analyze per query."""
    return dot(a, b) / (norm_a * norm_b)


def sign_bucket(a: Column, bits: int = 8) -> Column:
    """Axis-aligned random-hyperplane LSH bucket: bit i = sign of dim i.

    A deliberately deterministic (and oracle-expressible) member of the
    hyperplane-LSH family: for unit-ish embeddings whose coordinates are
    roughly isotropic, two vectors with high cosine agree on most
    coordinate signs. The scale path for near-dup search: bucket-join
    instead of an O(n²) cross join."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.when(
            F.element_at(a, i + 1) >= 0, F.lit(2 ** i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out
