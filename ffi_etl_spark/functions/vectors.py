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


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product, summed in array order from a 0.0 seed.

    With ``dim`` (the ANN operators' explicit dimensionality contract),
    the fold is UNROLLED into a static expression tree —
    ``((0.0 + a₁b₁) + a₂b₂) + …`` — the exact addition sequence of the
    ``F.aggregate`` fold, so every result is bit-identical, but built
    from plain expressions that WHOLE-STAGE CODEGEN compiles instead of
    the higher-order-function form, which is CodegenFallback and runs
    interpreted per row (optimization round 12, guide §1.2 "per-task
    work": this sits inside the n·k candidate-scoring joins of every
    ANN tier). Rows whose arrays are not exactly ``dim`` long fall back
    to the fold lazily (same value by construction — the fold IS the
    otherwise branch), so ragged inputs keep the generic semantics."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    fold = F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
    if dim is None:
        return fold
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return F.when((F.size(a) == dim) & (F.size(b) == dim), acc).otherwise(fold)


def norm2(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm2(a, dim) * norm2(b, dim))


def cosine_prenorm(
    a: Column, b: Column, norm_a: Column, norm_b: Column, dim: int | None = None
) -> Column:
    """Cosine with the two vector norms already materialized as columns.

    Bit-identical to ``cosine`` (same ``dot/(sqrt(dot)·sqrt(dot))``
    expression, just factored), but the per-pair work drops from three
    64-element folds to ONE: norms are computed once per VECTOR (narrow,
    pre-join) instead of once per PAIR. On an n·K candidate join that is
    a 3× cut of the dominant cost, and it shrinks the expression tree
    Catalyst must analyze per query. ``dim`` unrolls the remaining dot
    into codegen (see ``dot``)."""
    return dot(a, b, dim) / (norm_a * norm_b)


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
