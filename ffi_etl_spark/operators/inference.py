"""ML inference as pure relational expressions (no Python in the loop).

A trained tree ensemble (GBDT/random-forest style) compiles to nested
CASE expressions plus a fixed-order sum — whole-stage-codegen'd JVM
arithmetic that scores 100 TB in the scan stage with zero shuffles, no
model server, no Python workers (the operator-fusion / in-database
inference idea — e.g. "Machine Learning Inference Pipeline Execution
Using Pure SQL", ICDE 2025 — applied Spark-first).

One tree specification drives BOTH engines: ``compile_tree`` emits a
pyspark Column and ``tree_to_sql`` emits the identical ANSI CASE
expression, so scoring is differentially testable bit-for-bit (leaf
values sum in fixed ensemble order; comparisons and branch selection
are exact).

Tree spec (plain dicts, the JSON a training job exports):

    {"feature": "value", "threshold": 10.0,
     "left": {"value": 0.25},            # leaf
     "right": {"feature": ...,} }        # or another split

Semantics: ``feature <= threshold`` goes left; a NULL feature fails
the comparison and goes RIGHT on both engines (Spark ``when`` and SQL
``CASE`` both fall through on NULL) — make missing-value routing
explicit in the trained model if it matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compile_tree(tree: dict) -> Column:
    """Tree dict -> one nested when/otherwise Column."""
    if "value" in tree:
        return F.lit(float(tree["value"]))
    return F.when(
        F.col(tree["feature"]) <= F.lit(float(tree["threshold"])),
        compile_tree(tree["left"]),
    ).otherwise(compile_tree(tree["right"]))


def tree_to_sql(tree: dict) -> str:
    """The same tree as an ANSI CASE expression (oracle side)."""
    if "value" in tree:
        return repr(float(tree["value"]))
    return (
        f"CASE WHEN {tree['feature']} <= {float(tree['threshold'])!r} "
        f"THEN {tree_to_sql(tree['left'])} "
        f"ELSE {tree_to_sql(tree['right'])} END"
    )


def score_ensemble(
    df: DataFrame,
    trees: list[dict],
    id_col: str = "event_id",
    threshold: float = 0.0,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score every row with the ensemble: ``margin`` = sum of the
    trees' leaf outputs in ENSEMBLE ORDER (fixed-order float addition
    — bit-identical on any engine), ``predicted`` = margin > threshold
    as int. The whole scorer is one narrow projection: at 100 TB it
    fuses into the scan, shuffles nothing, and broadcasts nothing —
    the model IS the plan. ``keep_cols`` pass through unchanged (e.g.
    a label column for evaluation — cheaper than re-joining the source
    onto its own scores)."""
    if not trees:
        raise ValueError("score_ensemble: need at least one tree")
    margin = None
    for t in trees:
        c = compile_tree(t)
        margin = c if margin is None else margin + c
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        margin.alias("margin"),
        (margin > F.lit(threshold)).cast("int").alias("predicted"),
    )


def ensemble_to_sql(trees: list[dict], threshold: float = 0.0) -> tuple[str, str]:
    """(margin_expr, predicted_expr) for the oracle — generated from
    the SAME specs, summed in the same order."""
    margin = " + ".join(f"({tree_to_sql(t)})" for t in trees)
    return margin, f"CAST(({margin}) > {float(threshold)!r} AS INT)"


def auc_exact(
    scored: DataFrame,
    score_col: str = "margin",
    label_col: str = "label",
) -> DataFrame:
    """EXACT ROC-AUC via the Mann-Whitney rank-sum — the model-eval
    counterpart to ``score_ensemble``, computed with pure integer
    arithmetic so it is bit-identical on any engine:

    * ranks are tie-AVERAGED per distinct score; the half-integer
      average rank is carried DOUBLED (avg of ranks c+1..c+n doubles
      to the integer ``2c + n + 1``), so every intermediate is a
      BIGINT;
    * ``U2 = Σ_positives 2·rank = Σ_s n_pos(s)·(2c(s) + n(s) + 1)``,
      and ``AUC = (U2 − n_pos·(n_pos+1)) / (2·n_pos·n_neg)`` — one
      correctly-rounded division at the very end.

    Scale shape: one score-keyed aggregate collapses the data to the
    DISTINCT-score table (for a tree ensemble that is ≤ the product of
    leaf counts — tiny), a K-row post-aggregate window builds the
    cumulative counts, and one 1-row reduce finishes. The corpus
    shuffles once, grouped by score.

    Output (1 row): n_pos, n_neg, u2, auc. NULL labels are rejected
    rows — filter them upstream; NULL auc signals a single-class
    input (n_pos or n_neg = 0), the undefined case."""
    from pyspark.sql import Window

    per_score = scored.groupBy(F.col(score_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.count_if(F.col(label_col)).alias("_np"),
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_score.withColumn(
        "_c", F.coalesce(F.sum("_n").over(w), F.lit(0))
    )
    agg = ranked.agg(
        F.sum("_np").cast("long").alias("n_pos"),
        (F.sum("_n") - F.sum("_np")).cast("long").alias("n_neg"),
        F.sum(F.col("_np") * (F.lit(2) * F.col("_c") + F.col("_n") + F.lit(1)))
        .cast("long")
        .alias("u2"),
    )
    auc = (
        (F.col("u2") - F.col("n_pos") * (F.col("n_pos") + F.lit(1))).cast("double")
        / (F.lit(2.0) * (F.col("n_pos") * F.col("n_neg")).cast("double"))
    )
    return agg.select("n_pos", "n_neg", "u2", auc.alias("auc"))
