"""Registry-wide physical-plan lint (tools/plan_lint.py) as a gate.

Every registered query's formatted plan is swept for the banned
shapes: CartesianProduct, row-at-a-time Python UDFs, and raw-row
global window/sort funnels. The allowlist in tools/plan_lint.py holds
the documented intentional exceptions; anything else fails here at
authoring time instead of in a human plan audit."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ffi_etl_spark.queries import QUERIES
from tools.plan_lint import ALLOWLIST, explain_formatted, lint_plan


def test_linter_catches_raw_global_window(spark, sf_dir):
    """Self-test: a deliberately bad plan (running sum windowed over
    the whole raw table with no partition key) is flagged, and the
    engine's own two-phase formulation of the same computation is
    clean — the lint separates the cliff from the fix."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bad = li.withColumn(
        "rt", F.sum("l_quantity").over(Window.orderBy("l_orderkey", "l_linenumber"))
    )
    assert any("SinglePartition" in f for f in lint_plan(explain_formatted(spark, bad)))

    from ffi_etl_spark.operators.textops import global_cumsum_exclusive

    good = global_cumsum_exclusive(
        li.select("l_orderkey", "l_linenumber", F.col("l_quantity").cast("long").alias("q")),
        ["l_orderkey", "l_linenumber"],
        "q",
    )
    assert lint_plan(explain_formatted(spark, good)) == []


def test_linter_catches_row_udf_and_cartesian(spark, sf_dir):
    from pyspark.sql.functions import udf

    li = spark.read.parquet(f"{sf_dir}/region.parquet")
    slow = li.withColumn("u", udf(lambda s: s.upper())(F.col("r_name")))
    assert any("BatchEvalPython" in f for f in lint_plan(explain_formatted(spark, slow)))

    cart = li.crossJoin(spark.read.parquet(f"{sf_dir}/nation.parquet").hint("shuffle_replicate_nl"))
    assert any("CartesianProduct" in f for f in lint_plan(explain_formatted(spark, cart)))


def test_registry_plans_clean(spark, sf_dir):
    """The actual sweep: no non-allowlisted query ships a banned plan
    shape. Slow-ish (builds every registered plan at sf0.001) but this
    is the machine version of the per-round human plan audit."""
    bad: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        findings = lint_plan(explain_formatted(spark, df))
        if findings and name not in ALLOWLIST:
            bad[name] = findings
        spark.catalog.clearCache()
    assert bad == {}, f"plan lint: {bad}"
