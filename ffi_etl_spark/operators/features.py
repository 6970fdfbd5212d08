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


NB_BUCKETS = 4096
NB_SCALE_BITS = 20


def nb_train_score(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = NB_BUCKETS,
    scale_bits: int = NB_SCALE_BITS,
) -> DataFrame:
    """Multinomial naive Bayes, trained AND scored in one relational
    plan — supervised text classification over hashed token counts
    (the hashing-trick vocabulary: md5 mod ``n_buckets``, so the model
    is a fixed C×B table no matter the corpus vocabulary).

    Math: per class c and bucket b, the Laplace-smoothed
    log-likelihood ``ln((n_cb+1)/(total_c+B))`` and the class prior
    ``ln(n_docs_c/N)``; a document's class score is
    ``prior_c + Σ_b cnt_db · ll_cb`` with unseen buckets contributing
    the per-class floor ``ln(1/(total_c+B))``. Every ln is FIXED-POINT
    QUANTIZED (``FLOOR(2^bits·x)`` → BIGINT) at the leaf per the
    round-5 transcendental rule, so scores are pure integer sums and
    the argmax is bit-stable; ties break to the lexicographically
    larger class on both engines (max over (score, class)).

    Scale shape: one explode + (doc, bucket) aggregate builds the only
    corpus-sized table; the class-bucket model DERIVES from it (no
    second scan), is C×B rows, and broadcasts. Scoring is the standard
    C-fold fanout of doc-bucket rows (a broadcast nested loop against
    the C-row class table), one (doc, class) aggregate, one doc-keyed
    argmax — three shuffles total, none corpus×corpus.

    Output: (id, actual, predicted, score_q, correct).
    """
    scale = float(1 << scale_bits)
    from ffi_etl_spark.functions.hashing import md5_int32

    base = docs.filter(F.col(text_col).isNotNull())
    toks = base.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("actual"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    from pyspark import StorageLevel

    doc_buckets = toks.groupBy(
        "id", "actual", (md5_int32(F.col("tok")) % n_buckets).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # doc_buckets feeds the model AND the scoring fanout under
    # DIFFERENT keys — no exchange reuse (round-5 lesson d), so pin the
    # corpus-scale subtree or the explode+aggregate runs twice. Callers
    # composing further should spark.catalog.clearCache() when done
    # (public lifecycle note, per the kmeans/dedup_semantic precedent).
    doc_buckets = doc_buckets.persist(StorageLevel.MEMORY_AND_DISK)

    # model derives from doc_buckets (one corpus pass total) and stays
    # derived: cb -> totals is a K-row re-aggregate
    cb = doc_buckets.groupBy(F.col("actual").alias("cls"), "bucket").agg(
        F.sum("cnt").cast("long").alias("n_cb")
    )
    tot = cb.groupBy("cls").agg(F.sum("n_cb").cast("long").alias("total_c"))
    model = (
        cb.join(tot, "cls")
        .select(
            "cls",
            "bucket",
            F.floor(
                F.lit(scale)
                * F.log(
                    (F.col("n_cb") + F.lit(1)).cast("double")
                    / (F.col("total_c") + F.lit(n_buckets)).cast("double")
                )
            )
            .cast("long")
            .alias("q"),
        )
    )
    pri = base.groupBy(F.col(label_col).alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("nd")
    )
    nall = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    consts = (
        tot.join(pri, "cls")
        .crossJoin(F.broadcast(nall))
        .select(
            "cls",
            F.floor(
                F.lit(scale)
                * F.log(
                    F.lit(1.0) / (F.col("total_c") + F.lit(n_buckets)).cast("double")
                )
            )
            .cast("long")
            .alias("q0"),
            F.floor(
                F.lit(scale)
                * F.log(F.col("nd").cast("double") / F.col("n").cast("double"))
            )
            .cast("long")
            .alias("prior_q"),
        )
    )
    scored = (
        doc_buckets.crossJoin(F.broadcast(consts))
        .join(F.broadcast(model), ["cls", "bucket"], "left")
        .groupBy("id", "actual", "cls", "prior_q")
        .agg(
            (
                F.col("prior_q")
                + F.sum(F.col("cnt") * F.coalesce(F.col("q"), F.col("q0")))
            )
            .cast("long")
            .alias("score_q")
        )
    )
    best = scored.groupBy("id", "actual").agg(
        F.max(F.struct("score_q", "cls")).alias("_b")
    )
    return best.select(
        F.col("id"),
        F.col("actual"),
        F.col("_b.cls").alias("predicted"),
        F.col("_b.score_q").alias("score_q"),
        (F.col("_b.cls") == F.col("actual")).cast("int").alias("correct"),
    )
