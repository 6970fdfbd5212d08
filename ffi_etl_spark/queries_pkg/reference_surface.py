"""Queries exercising the reference's operator surface (SURVEY.md §2)
mapped onto the driver testdata tables (FIXTURES.md Fixture D mapping).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table
from ffi_etl_spark.operators.rollup import demographic_rollup
from ffi_etl_spark.queries import query


# --- A1-A5: demographic roll-up (flagship; utils.py:190-223) -----------------
# Demographic = customer market segment, with negative-balance customers
# recoded to "Unknown" to exercise the excl-unknown denominator + blank
# Total Responses semantics.

@query(
    "rollup_demographic",
    oracle="""
WITH base AS (
  SELECT CASE WHEN c_acctbal < 0 THEN 'Unknown' ELSE c_mktsegment END AS "Category"
  FROM customer
), g AS (
  SELECT "Category", COUNT(*) AS "# of Survey Responses" FROM base GROUP BY "Category"
), t AS (
  SELECT g.*,
         SUM(CASE WHEN "Category" <> 'Unknown' THEN "# of Survey Responses" END) OVER () AS total_excl
  FROM g
)
SELECT 'Segment' AS "Demographic",
       "Category",
       "# of Survey Responses",
       printf('%.2f%%', "# of Survey Responses" * 100.0 / total_excl) AS "% of Survey Responses",
       CASE WHEN "Category" <> 'Unknown' THEN CAST(total_excl AS VARCHAR) ELSE '' END AS "Total Responses"
FROM t
ORDER BY "Category" DESC
""",
)
def _rollup_demographic(spark, sf_dir):
    cust = table(spark, sf_dir, "customer").withColumn(
        "segment",
        F.when(F.col("c_acctbal") < 0, "Unknown").otherwise(F.col("c_mktsegment")),
    )
    return demographic_rollup(cust, "segment", "Segment")
