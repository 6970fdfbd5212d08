"""Score a model relationally and run the full evaluation suite.

The in-database ML evaluation composition — every stage a pure
relational plan (no model server, no sklearn, no Python in the loop):

  1. score       — compile the tree-ensemble spec to CASE expressions
                   and score every event in the scan stage
                   (inference.score_ensemble)
  2. report      — per-class precision/recall/F1 from the confusion
                   counts (inference.classification_report)
  3. AUC         — exact Mann-Whitney ROC-AUC over the margin
                   (inference.auc_exact)
  4. calibration — reliability bins, then the closed-form isotonic
                   (PAVA) monotone fit over them
                   (inference.calibration_bins / isotonic_calibrate)

Run:

    python examples/evaluate_model.py \
        [--input /root/testdata/sf0.01/events.parquet]

Prints each artifact. The tree spec is the round-5 demo ensemble
(inference.DEMO_TREES); in production, load the JSON your
training job exported and pass it straight in — the spec IS the
model.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ffi_etl_spark.operators.inference import (
    DEMO_TREES,
    auc_exact,
    calibration_bins,
    classification_report,
    isotonic_calibrate,
    score_ensemble,
)
from ffi_etl_spark.session import get_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01/events.parquet")
    args = ap.parse_args()

    spark = get_session("evaluate-model")
    ev = spark.read.parquet(args.input).select(
        "event_id",
        "value",
        (F.col("event_id") % 100).cast("double").alias("idmod"),
        (F.col("event_type") == "purchase").alias("label"),
    )

    scored = score_ensemble(ev, DEMO_TREES, keep_cols=("label",))

    print("== classification report ==")
    classification_report(scored).orderBy("class").show(truncate=False)

    print("== ROC-AUC (exact, Mann-Whitney) ==")
    auc_exact(scored).show(truncate=False)

    print("== calibration: raw bins + isotonic fit ==")
    bins = calibration_bins(scored)
    isotonic_calibrate(bins).orderBy("bin").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
