"""End-to-end in-database ML: train → score → evaluate → monitor.

The full model lifecycle as pure relational plans (no sklearn, no
model server, no Python in the data path) — the composability proof
for the engine's training/eval family (VERDICT r05 item 4):

  1. train    — optimal Gini decision stump over the binned feature,
                on the TRAIN split only
                (inference.train_decision_stump)
  2. bridge   — the 1-row trained model becomes a score_ensemble tree
                spec (inference.stump_to_tree); the collect is
                model-sized (one row), not data-sized
  3. score    — the compiled CASE expression scores the held-out
                split in the scan stage (inference.score_ensemble)
  4. evaluate — per-class precision/recall/F1, exact Mann-Whitney
                ROC-AUC, reliability bins + closed-form isotonic fit
  5. monitor  — population-stability index between the train and eval
                feature distributions (the production drift check —
                here it measures split balance; in production, point
                it at yesterday vs today)

The split is leakage-safe by construction: event_id parity, so no
event can appear on both sides and the assignment is deterministic.

Run:

    python examples/train_score_evaluate.py \
        [--input /root/testdata/sf0.01/events.parquet]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ffi_etl_spark.operators.inference import (
    auc_exact,
    calibration_bins,
    classification_report,
    isotonic_calibrate,
    score_ensemble,
    stump_to_tree,
    train_decision_stump,
)
from ffi_etl_spark.session import get_session


def featurize(events: DataFrame) -> DataFrame:
    """Events → (event_id, bin, label): the integer-binned value
    feature the stump trains on, and `is a purchase` as the label."""
    return events.select(
        "event_id",
        F.least(F.lit(99), F.greatest(F.lit(0), F.floor(F.col("value"))))
        .cast("double")
        .alias("bin"),
        (F.col("event_type") == "purchase").cast("long").alias("label"),
    )


def train_score_evaluate(
    spark: SparkSession, events: DataFrame
) -> dict[str, DataFrame]:
    """Run the full lifecycle; returns every artifact as a DataFrame
    (plus the trained tree spec under 'tree') so tests can assert on
    each stage."""
    feats = featurize(events)
    train = feats.filter(F.col("event_id") % 2 == 0)
    holdout = feats.filter(F.col("event_id") % 2 == 1)

    stump = train_decision_stump(train, bin_col="bin", label_col="label")
    tree = stump_to_tree(stump.collect()[0])  # 1-row model extraction

    scored = score_ensemble(
        holdout, [tree], id_col="event_id", threshold=0.5, keep_cols=("label",)
    )
    bins = calibration_bins(scored, lo=0.0, hi=1.0, n_bins=8)
    # drift monitor: train vs holdout feature distribution. PSI uses
    # the conventional ~10 coarse buckets, not the stump's 100 fine
    # bins — PSI's sampling-noise floor is ~k·(1/n_ref + 1/n_cur), so
    # fine bins at small n read as spurious drift
    mon_bin = F.floor(F.col("bin") / 10).alias("bin")
    ref = train.groupBy(mon_bin).agg(F.count(F.lit(1)).cast("long").alias("n_ref"))
    cur = holdout.groupBy(mon_bin).agg(F.count(F.lit(1)).cast("long").alias("n_cur"))
    cells = ref.join(cur, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tot = cells.agg(
        F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc"),
        F.count(F.lit(1)).alias("k"),
    )
    p = (F.col("n_ref") + F.lit(0.5)) / (F.col("tr") + F.col("k") * 0.5)
    q = (F.col("n_cur") + F.lit(0.5)) / (F.col("tc") + F.col("k") * 0.5)
    psi = cells.crossJoin(F.broadcast(tot)).agg(
        F.sum((p - q) * F.log(p / q)).alias("psi")
    ).select("psi", (F.col("psi") >= 0.2).cast("int").alias("drift_flag"))

    return {
        "stump": stump,
        "tree": tree,
        "scored": scored,
        "report": classification_report(scored),
        "auc": auc_exact(scored),
        "calibration": isotonic_calibrate(bins),
        "drift": psi,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01/events.parquet")
    args = ap.parse_args()

    spark = get_session("train-score-evaluate")
    arts = train_score_evaluate(spark, spark.read.parquet(args.input))

    print("== trained stump (Gini-optimal split) ==")
    arts["stump"].show(truncate=False)
    print("== tree spec handed to score_ensemble ==")
    print(arts["tree"])
    print("== classification report (held-out split) ==")
    arts["report"].orderBy("class").show(truncate=False)
    print("== ROC-AUC (exact, Mann-Whitney) ==")
    arts["auc"].show(truncate=False)
    print("== calibration bins + isotonic fit ==")
    arts["calibration"].orderBy("bin").show(truncate=False)
    print("== train/holdout drift (PSI) ==")
    arts["drift"].show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
