"""Round-6 gated queries: the in-database model LIFECYCLE composed.

Round 5b shipped training (``train_decision_stump``), scoring
(``score_ensemble``) and the evaluation suite as separately-gated
operators; this round registers their COMPOSITION as one differential
query — train on a leakage-safe split, bridge the trained model into
the scorer, evaluate on the holdout — so the end-to-end wiring the
``examples/train_score_evaluate.py`` lifecycle advertises is itself
hash-gated, not just pytest-covered (VERDICT r05 item 4).

Registry growth is otherwise FROZEN this round (VERDICT r05 item 1:
clear the 46-query grading debt first) — this is the single permitted
addition and it queues behind the debt in the grading rotation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table
from ffi_etl_spark.queries import query

# The oracle recomputes the whole lifecycle in SQL: Gini stump on the
# even-event_id split (the round-5b _STUMP_ORACLE shape), probability
# leaves as single divisions of exact integers, holdout scoring via
# one CASE against the broadcast 1-row model, then the confusion
# reshape (the round-5b _report_oracle shape). Every count is a
# BIGINT; every double is one correctly-rounded division of exact
# integers, so the report hashes bit-strictly.
_LIFECYCLE_ORACLE = """
WITH binned AS (
  SELECT event_id,
         CAST(LEAST(99, GREATEST(0, FLOOR(value))) AS BIGINT) AS bin,
         CAST(event_type = 'purchase' AS BIGINT) AS y
  FROM events
), train AS (
  SELECT * FROM binned WHERE event_id % 2 = 0
), holdout AS (
  SELECT * FROM binned WHERE event_id % 2 = 1
), cells AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM train GROUP BY bin
), cum AS (
  SELECT bin,
         CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS nl,
         CAST(SUM(pos) OVER (ORDER BY bin) AS BIGINT) AS posl
  FROM cells
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(pos) AS BIGINT) AS pt FROM cells
), cand AS (
  SELECT bin, nl, posl, nt - nl AS nr, pt - posl AS posr,
         (CAST(nl AS DOUBLE)
          - (CAST(posl * posl AS DOUBLE) + CAST((nl - posl) * (nl - posl) AS DOUBLE))
            / CAST(nl AS DOUBLE))
         + (CAST(nt - nl AS DOUBLE)
            - (CAST((pt - posl) * (pt - posl) AS DOUBLE)
               + CAST(((nt - nl) - (pt - posl)) * ((nt - nl) - (pt - posl)) AS DOUBLE))
              / CAST(nt - nl AS DOUBLE)) AS gini_cost
  FROM cum CROSS JOIN tot
  WHERE nl > 0 AND nt - nl > 0
), best AS (
  SELECT bin AS t,
         CAST(posl AS DOUBLE) / CAST(nl AS DOUBLE) AS p_left,
         CAST(posr AS DOUBLE) / CAST(nr AS DOUBLE) AS p_right
  FROM cand ORDER BY gini_cost, bin LIMIT 1
), scored AS (
  SELECT h.y,
         CAST((CASE WHEN h.bin <= b.t THEN b.p_left ELSE b.p_right END) > 0.5
              AS BIGINT) AS p
  FROM holdout h CROSS JOIN best b
), pairs AS (
  SELECT y, p, CAST(COUNT(*) AS BIGINT) AS n FROM scored GROUP BY y, p
), by_true AS (
  SELECT y AS cls, CAST(SUM(n) AS BIGINT) AS support,
         CAST(SUM(CASE WHEN p = y THEN n ELSE 0 END) AS BIGINT) AS tp
  FROM pairs GROUP BY y
), by_pred AS (
  SELECT p AS cls, CAST(SUM(n) AS BIGINT) AS n_pred FROM pairs GROUP BY p
), rep AS (
  SELECT COALESCE(t.cls, q.cls) AS cls,
         COALESCE(t.tp, 0) AS tp,
         COALESCE(q.n_pred, 0) - COALESCE(t.tp, 0) AS fp,
         COALESCE(t.support, 0) - COALESCE(t.tp, 0) AS fn,
         COALESCE(t.support, 0) AS support
  FROM by_true t FULL OUTER JOIN by_pred q ON t.cls = q.cls
)
SELECT CAST(cls AS BIGINT) AS cls, CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
       CAST(support AS BIGINT) AS support,
       CASE WHEN tp + fp > 0
            THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS prec,
       CASE WHEN tp + fn > 0
            THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
       END AS f1
FROM rep
"""


@query("stump_score_report", oracle=_LIFECYCLE_ORACLE)
def _stump_score_report(spark, sf_dir):
    """Train → score → evaluate as ONE lazy plan, no driver collect:
    the Gini-optimal stump trains on the even-event_id split
    (operators/inference.py::train_decision_stump), the 1-row trained
    model broadcasts onto the odd-id holdout (the model IS the plan —
    the crossJoin build side is one row, so scoring stays in the scan
    stage), and classification_report reshapes the confusion counts.

    Scale shape: the corpus is read twice (train pass: one bin-keyed
    aggregate; score pass: narrow projection + K-row confusion
    aggregate); the trained model never leaves the JVM. At 100 TB the
    train split would be persisted or the binned cells reused — both
    sides stay one shuffle each."""
    from ffi_etl_spark.operators.inference import (
        classification_report,
        train_decision_stump,
    )

    binned = table(spark, sf_dir, "events").select(
        "event_id",
        F.least(F.lit(99), F.greatest(F.lit(0), F.floor(F.col("value"))))
        .cast("long")
        .alias("bin"),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )
    stump = train_decision_stump(
        binned.filter(F.col("event_id") % 2 == 0), bin_col="bin", label_col="y"
    )
    prob = F.when(
        F.col("bin") <= F.col("threshold_bin"),
        F.col("pos_left").cast("double") / F.col("n_left").cast("double"),
    ).otherwise(
        F.col("pos_right").cast("double") / F.col("n_right").cast("double")
    )
    scored = (
        binned.filter(F.col("event_id") % 2 == 1)
        .crossJoin(F.broadcast(stump))
        .select("y", (prob > F.lit(0.5)).cast("long").alias("p"))
    )
    rep = classification_report(scored, label_col="y", predicted_col="p")
    return rep.select(
        F.col("class").alias("cls"),
        "tp",
        "fp",
        "fn",
        "support",
        F.col("precision").alias("prec"),
        "recall",
        "f1",
    )
