"""ML feature-engineering operators (feature-store export shapes).

Weight-of-evidence / information-value is the classic supervised
encoding for categorical (or binned-numeric) features in scorecard
models: per category ``WOE_c = ln(((g_c+0.5)/G) / ((b_c+0.5)/B))``
with the IV contribution ``(g_c/G − b_c/B)·WOE_c`` summing to the
feature's predictive-power score.

Cross-engine exactness follows the round-5 transcendental rule
(TODO.md): ``ln`` is not bit-identical between engines, so every
ln-derived quantity is FIXED-POINT QUANTIZED (``FLOOR(2^bits · x)``)
into an exact BIGINT at the leaf — per-category values are single
deterministic computations (no accumulation), and any downstream sum
(total IV) is then pure integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def woe_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    scale_bits: int = 20,
) -> DataFrame:
    """Per-category weight-of-evidence + IV contribution.

    ``label_col`` is a boolean Column name (True = positive class /
    "good"). Output one row per category: ``n_good``/``n_bad`` exact
    counts, ``woe_q`` = floor(2^bits·WOE) and ``iv_q`` =
    floor(2^bits·IV-term) as exact BIGINTs (divide by 2^bits for the
    float form; the power-of-two division is exact). Rows with a NULL
    category group under NULL (both engines agree); rows with a NULL
    label count as negative — make labels explicit upstream if that
    matters.

    Shape: ONE aggregation over one scan (K category rows), a 1-row
    totals broadcast, then per-row scalar math — the smallest possible
    plan for a supervised encoding at any scale; the encoded table is
    a K-row broadcast joined back onto training data by the caller.

    Precondition: both classes must be non-empty overall (WOE divides
    by the class totals; an all-one-class dataset has no evidence to
    weigh). G=0 or B=0 would otherwise surface as a NULL/overflowed
    quantized column, so the totals are guarded with a named failure:
    the ``woe_q`` expression nulls out and ``check_constraints``-style
    callers should treat NULL woe_q as the signal. (No driver action
    is spent on a precondition check — the NULL is the loud marker.)"""
    grp = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.count_if(F.col(label_col)).alias("n_good"),
        F.count_if(~F.coalesce(F.col(label_col), F.lit(False))).alias("n_bad"),
    )
    tot = grp.agg(F.sum("n_good").alias("G"), F.sum("n_bad").alias("B"))
    scale = F.lit(float(1 << scale_bits))
    woe = F.log(
        ((F.col("n_good") + F.lit(0.5)) / F.col("G"))
        / ((F.col("n_bad") + F.lit(0.5)) / F.col("B"))
    )
    woe_q = F.floor(scale * woe).cast("long")
    # the IV term re-derives WOE from the QUANTIZED value so the
    # product is a deterministic function of exact inputs (never of a
    # raw ln both engines disagree on in the last ulp)
    iv_term = (
        F.col("n_good").cast("double") / F.col("G")
        - F.col("n_bad").cast("double") / F.col("B")
    ) * (woe_q.cast("double") / scale)
    return (
        grp.crossJoin(F.broadcast(tot))
        .select(
            "category",
            "n_good",
            "n_bad",
            woe_q.alias("woe_q"),
            F.floor(scale * iv_term).cast("long").alias("iv_q"),
        )
    )
