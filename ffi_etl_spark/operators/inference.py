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


# the demonstration ensemble the gated queries / examples score with —
# a stand-in for the JSON a real training job exports (leaf outputs
# dyadic so margins sum exactly)
DEMO_TREES = [
    {
        "feature": "value", "threshold": 50.0,
        "left": {
            "feature": "value", "threshold": 10.0,
            "left": {"value": -0.5},
            "right": {"value": 0.25},
        },
        "right": {"value": 0.75},
    },
    {
        "feature": "idmod", "threshold": 49.0,
        "left": {"value": 0.125},
        "right": {
            "feature": "value", "threshold": 80.0,
            "left": {"value": -0.25},
            "right": {"value": 0.5},
        },
    },
    {
        "feature": "value", "threshold": 25.0,
        "left": {"value": 0.0625},
        "right": {"value": -0.125},
    },
]


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


def train_decision_stump(
    df: DataFrame, bin_col: str = "bin", label_col: str = "y"
) -> DataFrame:
    """In-database model TRAINING: the optimal 1-split decision stump
    over a pre-binned feature, by exhaustive Gini scan over the bin
    thresholds (the ``train_decision_stump`` gated query extracted as
    a reusable operator so examples/tests can wire training straight
    into ``score_ensemble`` — VERDICT r05 item 4).

    Input: a frame with an integer ``bin_col`` (the binned feature —
    binning is the caller's feature engineering) and a 0/1
    ``label_col``. Split semantics: ``bin <= t`` goes left.

    All split statistics are cumulative-window BIGINTs; each
    candidate's Gini cost is a fixed op sequence over exact integers
    (deterministic double, no accumulation), and the argmin ties to
    the smaller threshold — the TRAINED MODEL is bit-identical
    cross-engine. Shape: one scan, one K-bin aggregate, K-row window +
    1-row argmin (the corpus shuffles once, keyed by bin). The grand
    totals ride the SAME single-partition window pass as the
    cumulatives (unbounded-following frame), so ``cells`` is consumed
    exactly once — no persist to leak across repeated trainings
    (ADVICE r06: CV folds accumulated cached partitions for the
    session's lifetime) and no crossJoin."""
    from pyspark.sql import Window

    binned = df.select(
        F.col(bin_col).cast("long").alias("bin"),
        F.col(label_col).cast("long").alias("y"),
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = Window.orderBy("bin")
    w_all = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = cells.select(
        "bin",
        F.sum("n").over(w).cast("long").alias("nl"),
        F.sum("pos").over(w).cast("long").alias("posl"),
        F.sum("n").over(w_all).cast("long").alias("nt"),
        F.sum("pos").over(w_all).cast("long").alias("pt"),
    )
    negl = F.col("nl") - F.col("posl")
    nr = F.col("nt") - F.col("nl")
    posr = F.col("pt") - F.col("posl")
    negr = nr - posr
    gini = (
        F.col("nl").cast("double")
        - (
            (F.col("posl") * F.col("posl")).cast("double")
            + (negl * negl).cast("double")
        )
        / F.col("nl").cast("double")
    ) + (
        nr.cast("double")
        - ((posr * posr).cast("double") + (negr * negr).cast("double"))
        / nr.cast("double")
    )
    cand = (
        cum.where((F.col("nl") > 0) & (nr > 0))
        .select(
            "bin",
            "nl",
            "posl",
            nr.alias("nr"),
            posr.alias("posr"),
            gini.alias("gini_cost"),
            "nt",
        )
    )
    best = cand.agg(
        F.min(
            F.struct("gini_cost", "bin", "nl", "posl", "nr", "posr", "nt")
        ).alias("_b")
    )
    acc = (
        F.greatest(F.col("_b.posl"), F.col("_b.nl") - F.col("_b.posl"))
        + F.greatest(F.col("_b.posr"), F.col("_b.nr") - F.col("_b.posr"))
    ).cast("double") / F.col("_b.nt").cast("double")
    return best.select(
        F.col("_b.bin").alias("threshold_bin"),
        F.col("_b.nl").alias("n_left"),
        F.col("_b.posl").alias("pos_left"),
        F.col("_b.nr").alias("n_right"),
        F.col("_b.posr").alias("pos_right"),
        F.col("_b.gini_cost").alias("gini_cost"),
        acc.alias("stump_acc"),
    )


def stump_to_tree(stump_row, feature: str = "bin") -> dict:
    """Convert a ``train_decision_stump`` result row into a
    ``score_ensemble`` tree spec — the train→score bridge. The stump
    split is ``bin <= threshold_bin``, so the tree scores the SAME
    binned feature column; leaves emit each side's empirical positive
    RATE, so the margin is a probability estimate (use
    ``threshold=0.5`` in score_ensemble for the majority-vote
    prediction). One correctly-rounded division per leaf — the model
    stays bit-deterministic."""
    return {
        "feature": feature,
        "threshold": float(stump_row["threshold_bin"]),
        "left": {"value": stump_row["pos_left"] / stump_row["n_left"]},
        "right": {"value": stump_row["pos_right"] / stump_row["n_right"]},
    }


def classification_report(
    scored: DataFrame,
    label_col: str = "label",
    predicted_col: str = "predicted",
) -> DataFrame:
    """Per-class precision / recall / F1 from a scored frame — the
    confusion-matrix evaluation that pairs with ``score_ensemble`` /
    ``auc_exact``. Everything up to the final divisions is integer
    counting (tp / fp / fn / support are BIGINTs), and each metric is
    ONE correctly-rounded double division (F1 is computed from the raw
    integer counts as ``2·tp / (2·tp + fp + fn)`` — algebraically equal
    to the harmonic mean but with a single division, so it is
    bit-identical on any engine; the naive ``2PR/(P+R)`` form chains
    three divisions and drifts).

    Scale shape: one groupBy on the (label, predicted) pair collapses
    the corpus to ≤ C² rows (C = #classes), then a C-row reshape.
    Classes with zero predicted (or zero actual) rows yield NULL
    precision (recall) — undefined, not 0, so a downstream mean does
    not silently deflate.

    Output: one row per class present in either column —
    (class, tp, fp, fn, support, precision, recall, f1).
    """
    pairs = scored.groupBy(
        F.col(label_col).cast("long").alias("_y"),
        F.col(predicted_col).cast("long").alias("_p"),
    ).agg(F.count(F.lit(1)).alias("_n"))
    # per-class tallies: tp from the diagonal, fp down the predicted
    # column, fn across the actual row — one more tiny aggregate each
    by_true = pairs.groupBy(F.col("_y").alias("class")).agg(
        F.sum("_n").cast("long").alias("support"),
        F.sum(F.when(F.col("_p") == F.col("_y"), F.col("_n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("tp"),
    )
    by_pred = pairs.groupBy(F.col("_p").alias("class")).agg(
        F.sum("_n").cast("long").alias("n_pred")
    )
    rep = by_true.join(by_pred, "class", "full_outer").select(
        F.col("class").cast("long").alias("class"),
        F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
        (F.coalesce(F.col("n_pred"), F.lit(0)) - F.coalesce(F.col("tp"), F.lit(0)))
        .cast("long")
        .alias("fp"),
        (F.coalesce(F.col("support"), F.lit(0)) - F.coalesce(F.col("tp"), F.lit(0)))
        .cast("long")
        .alias("fn"),
        F.coalesce(F.col("support"), F.lit(0)).cast("long").alias("support"),
    )
    return rep.select(
        "class",
        "tp",
        "fp",
        "fn",
        "support",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
        ).alias("precision"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"),
        ).alias("recall"),
        F.when(
            F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            (F.lit(2) * F.col("tp")).cast("double")
            / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
        ).alias("f1"),
    )


def calibration_bins(
    scored: DataFrame,
    score_col: str = "margin",
    label_col: str = "label",
    lo: float = -1.0,
    hi: float = 2.0,
    n_bins: int = 12,
) -> DataFrame:
    """Reliability-diagram bins: fixed-width score bins over [lo, hi),
    per-bin count, positive count, mean predicted score, and observed
    positive rate — the calibration evaluation for any scorer whose
    scores land in a known range (tree-ensemble margins are bounded by
    the sum of extreme leaves).

    Determinism: the bin index is ``floor((s - lo) / width)`` clamped
    to [0, n_bins-1] — with dyadic lo/width (callers should pick a
    power-of-two-friendly range) the index arithmetic is exact.
    ``mean_score`` = SUM(score)/n: for tree-ensemble margins every
    score is a small dyadic rational, so the partition-order float SUM
    is EXACT (multiples of 2^-k with tiny magnitude — no rounding at
    any add) and the mean is one final division. For arbitrary float
    scores, pre-quantize the score or emit fixed-precision strings
    (oracle-parity rule, TODO.md).

    Scale shape: one narrow projection + one n_bins-row aggregate —
    scan-stage work, a K-row shuffle.
    """
    if n_bins <= 0:
        raise ValueError("calibration_bins: n_bins must be positive")
    width = (hi - lo) / n_bins
    idx = F.floor((F.col(score_col) - F.lit(lo)) / F.lit(width))
    idx = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), idx)).cast("long")
    binned = scored.select(
        idx.alias("bin"),
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("long").alias("_y"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_y").cast("long").alias("n_pos"),
            F.sum("_s").alias("_sum_s"),
        )
        .select(
            "bin",
            (F.lit(lo) + F.col("bin").cast("double") * F.lit(width)).alias("bin_lo"),
            "n",
            "n_pos",
            (F.col("_sum_s") / F.col("n").cast("double")).alias("mean_score"),
            (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
                "frac_pos"
            ),
        )
    )


def auc_exact(
    scored: DataFrame,
    score_col: str = "margin",
    label_col: str = "label",
    group_cols: tuple[str, ...] = (),
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

    Output (1 row; with ``group_cols``, one row per group — the
    k-fold/per-segment evaluation shape, same integer pipeline with
    every stage keyed by the group): n_pos, n_neg, u2, auc. NULL
    labels are rejected rows — filter them upstream; NULL auc signals
    a single-class input (n_pos or n_neg = 0), the undefined case."""
    from pyspark.sql import Window

    gcols = list(group_cols)
    per_score = scored.groupBy(*gcols, F.col(score_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("_n"),
        # cast so 0/1 integer labels work as well as booleans
        F.count_if(F.col(label_col).cast("boolean")).alias("_np"),
    )
    w = (
        Window.partitionBy(*gcols)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_score.withColumn(
        "_c", F.coalesce(F.sum("_n").over(w), F.lit(0))
    )
    agg = ranked.groupBy(*gcols).agg(
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
    return agg.select(*gcols, "n_pos", "n_neg", "u2", auc.alias("auc"))


def isotonic_calibrate(
    bins: DataFrame,
    n_col: str = "n",
    pos_col: str = "n_pos",
    order_col: str = "bin",
) -> DataFrame:
    """Exact isotonic (monotone non-decreasing) calibration of a
    binned reliability table — the PAVA fit computed in its CLOSED
    minimax form instead of the sequential pooling loop:

        iso[t] = max_{i ≤ t} min_{j ≥ t} (ΣP[i..j]) / (ΣN[i..j])

    which is embarrassingly parallel: cumulative sums over the K bins,
    all K(K+1)/2 interval averages, one min-then-max cascade. Interval
    sums are exact integers (cumsum differences); each average is ONE
    correctly-rounded division of exact integers, and min/max SELECT
    among those doubles — no float accumulation anywhere, so the fit
    is bit-identical on any engine.

    Quadratic in the BIN COUNT only (K ≤ dozens) — the corpus was
    already collapsed by ``calibration_bins``; every window here is
    the K-row post-aggregate idiom, not a corpus window.

    Output: the input bins + ``iso_rate`` (the calibrated probability
    for the bin). Bins with n=0 cannot occur (groupBy only emits
    occupied bins).
    """
    from pyspark.sql import Window

    w = Window.orderBy(order_col)
    cums = bins.select(
        F.col(order_col),
        F.row_number().over(w).alias("_t"),
        F.sum(F.col(pos_col)).over(w).cast("long").alias("_cp"),
        F.sum(F.col(n_col)).over(w).cast("long").alias("_cn"),
    )
    sentinel = cums.sparkSession.range(1).select(
        F.lit(None).cast(cums.schema[order_col].dataType).alias(order_col),
        F.lit(0).cast("int").alias("_t"),
        F.lit(0).cast("long").alias("_cp"),
        F.lit(0).cast("long").alias("_cn"),
    )
    bounds = cums.unionByName(sentinel)
    ivals = (
        cums.alias("j")
        .join(bounds.alias("i0"), F.col("i0._t") < F.col("j._t"))
        .select(
            (F.col("i0._t") + 1).alias("i"),
            F.col("j._t").alias("j"),
            (
                (F.col("j._cp") - F.col("i0._cp")).cast("double")
                / (F.col("j._cn") - F.col("i0._cn")).cast("double")
            ).alias("avg"),
        )
    )
    ts = cums.select(F.col("_t").alias("t"), F.col(order_col))
    inner = (
        ivals.join(ts, (F.col("i") <= F.col("t")) & (F.col("j") >= F.col("t")))
        .groupBy("t", order_col, "i")
        .agg(F.min("avg").alias("_m"))
        .groupBy("t", order_col)
        .agg(F.max("_m").alias("iso_rate"))
    )
    return bins.join(inner.select(order_col, "iso_rate"), order_col)
