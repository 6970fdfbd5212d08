"""Remaining TPC-H spine shapes (q4/q8/q11/q13/q15/q16/q17/q19/q20/q21).

Completes the OLAP shape catalogue started in olap_spines.py: correlated
EXISTS (q4), market-share ratio over a region-scoped 6-way join (q8),
scalar-subquery HAVING threshold (q11), left-outer count distribution
(q13), argmax-by-scalar-subquery (q15), distinct-count with NOT IN
exclusion (q16), correlated-average filter (q17), disjunctive
multi-range predicates (q19), nested IN with group-HAVING (q20), and the
multi-supplier waiting-order shape (q21, EXISTS + NOT EXISTS folded into
one per-order aggregation).

The reference itself has only two join shapes (SURVEY.md §2.3 —
extract_alchemer_data.py:19-24, merge_census.py:23); these queries are
the engine-extension OLAP surface. Shapes are adapted to the driver
testdata (TESTDATA.md): no partsupp table, so q11/q16/q20 derive
supplier-part relations from lineitem, and q4/q21's "late" predicate is
l_shipdate > o_orderdate + 60 days (testdata has no commit/receipt
dates).

Oracle-parity rules used throughout (same as olap_spines.py): money sums
go through DECIMAL(27,8) so addition order cannot change the result,
ratios divide two exact DOUBLE casts (IEEE ops on identical operands are
deterministic), and quantity sums/averages stay in DOUBLE because
l_quantity is integral (integers < 2^53 are exact in double regardless
of order).

Scale notes inline per query; the recurring pattern: filter dimensions
first, broadcast them, keep the lineitem scan narrow, and make the one
unavoidable shuffle the final low-cardinality group-by.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table
from ffi_etl_spark.queries import query

_DEC = "decimal(27,8)"


def _rev(df_col_price="l_extendedprice", df_col_disc="l_discount"):
    return (F.col(df_col_price) * (1 - F.col(df_col_disc))).cast(_DEC)


# --- q4 shape: EXISTS semi-join + priority counts -----------------------------

@query(
    "tpch_q4_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def _tpch_q4_priority(spark, sf_dir):
    """q4's correlated EXISTS as a left-semi join with a non-equi
    residual (late shipment: >60 days after order date). The semi join
    never materializes lineitem columns, and the date filter prunes the
    orders side before the shuffle; at scale the semi join is the only
    wide exchange and AQE can convert it to broadcast when the pruned
    orders side is small."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- q8 shape: market share (conditional ratio) over region-scoped join -------

@query(
    "tpch_q8_share",
    oracle="""
SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
       CAST(
         CAST(SUM(CASE WHEN n2.n_name = 'NATION_1'
                       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))
                       ELSE CAST(0 AS DECIMAL(27,8)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))) AS DOUBLE)
       AS DOUBLE) AS mkt_share
FROM part, lineitem, orders, customer, supplier, nation n1, nation n2, region
WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
  AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
  AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
  AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
  AND p_type = 'PROMO'
GROUP BY o_year
ORDER BY o_year
""",
)
def _tpch_q8_share(spark, sf_dir):
    """q8: NATION_1's share of PROMO-part revenue sold to ASIA
    customers, by year. Two roles of nation (customer-side region
    scoping vs supplier-side share flag) join independently; every
    dimension (part-filtered, region-scoped customers, nation-tagged
    suppliers) broadcasts, so lineitem⋈orders is the only shuffle and
    the ratio folds into ONE aggregation — no two-pass share math."""
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    zero = F.lit(0).cast(_DEC)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_1", _rev()).otherwise(zero)).cast("double")
                / F.sum(_rev()).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- q11 shape: group HAVING > scalar-subquery fraction of total --------------

@query(
    "tpch_q11_important",
    oracle="""
WITH natline AS (
  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(27,8)) AS val
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_1'),
tot AS (
  SELECT SUM(val) AS total, COUNT(DISTINCT l_partkey) AS nparts FROM natline)
SELECT l_partkey AS p_key, CAST(SUM(val) AS DOUBLE) AS part_value
FROM natline, tot
GROUP BY l_partkey, tot.total, tot.nparts
HAVING SUM(val) * tot.nparts * 2 > tot.total * 5
ORDER BY part_value DESC, p_key
""",
)
def _tpch_q11_important(spark, sf_dir):
    """q11's HAVING-above-fraction-of-total (partsupp replaced by
    NATION_1's lineitems). The real q11 scales its fraction by 1/SF;
    here the threshold is mean-relative (part value > 2.5x the mean
    part value — written as val*nparts*2 > total*5, integer-on-decimal
    only, exact on both engines) so the query selects a stable "heavy
    parts" tail at every scale factor. The global total+count come from
    a broadcast 1-row aggregate cross-joined in — NOT an
    empty-partition window (which would funnel every group through one
    task at scale) and NOT a driver collect() (the reference's
    anti-pattern, utils.py:207). The double cast happens only at
    output."""
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    natline = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", F.col("l_extendedprice").cast(_DEC).alias("val"))
    )
    per_part = natline.groupBy("l_partkey").agg(F.sum("val").alias("val_sum"))
    total = natline.agg(
        F.sum("val").alias("total"), F.countDistinct("l_partkey").alias("nparts")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val_sum") * F.col("nparts") * 2 > F.col("total") * 5)
        .select(
            F.col("l_partkey").alias("p_key"),
            F.col("val_sum").cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("p_key"))
    )


# --- q13 shape: left-outer join + two-level count distribution ----------------

@query(
    "tpch_q13_custdist",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def _tpch_q13_custdist(spark, sf_dir):
    """q13: customers-per-order-count histogram. The left-outer join
    keeps order-less customers (COUNT of a null column = 0 — exactly
    the q13 semantics). Two shuffles are inherent (join+count on
    c_custkey, then histogram on c_count); the second aggregates ~50
    distinct counts so it collapses map-side."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- q15 shape: argmax via scalar subquery over a derived revenue view --------

@query(
    "tpch_q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
""",
)
def _tpch_q15_top_supplier(spark, sf_dir):
    """q15: the supplier(s) with max quarterly revenue. The max comes
    from a broadcast 1-row aggregate; equality compares the DECIMAL
    sums (exact), not doubles. The revenue view is computed once and
    reused for both sides of the comparison — Spark dedups the scan via
    plan reuse; the supplier join broadcasts."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# --- q16 shape: distinct-count by part attrs with NOT IN exclusion ------------

@query(
    "tpch_q16_supplier_cnt",
    oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part, lineitem
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 14, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def _tpch_q16_supplier_cnt(spark, sf_dir):
    """q16: supplier variety per part spec (partsupp derived from
    lineitem). The NOT IN exclusion is a left-anti join against the
    tiny negative-balance supplier set (broadcast); s_suppkey is never
    null in testdata so anti-join == NOT IN here. COUNT(DISTINCT)
    expands to a two-phase partial-distinct aggregate — the
    high-cardinality dedup happens map-side before the group shuffle."""
    part = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 5, 9, 14, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --- q17 shape: correlated-average filter -------------------------------------

@query(
    "tpch_q17_small_qty",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,8))) AS DOUBLE) / 7.0 AS DOUBLE)
       AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
)
def _tpch_q17_small_qty(spark, sf_dir):
    """q17's correlated scalar average, decorrelated as a per-part
    window over the brand-joined lineitems (the brand filter selects
    whole parts, so the joined set contains every lineitem of each
    surviving part — the window average equals the correlated
    subquery). AVG(l_quantity) is exact in double (integral values), so
    the 0.2* threshold is bit-identical across engines. No self-join of
    lineitem: one scan, one window partitioned by l_partkey."""
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / 7.0)
            .cast("double")
            .alias("avg_yearly")
        )
    )


# --- q19 shape: disjunctive multi-range predicates ----------------------------

@query(
    "tpch_q19_disjunct",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))) AS DOUBLE)
       AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        AND l_quantity >= 1 AND l_quantity <= 11)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        AND l_quantity >= 10 AND l_quantity <= 20)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        AND l_quantity >= 20 AND l_quantity <= 30))
""",
)
def _tpch_q19_disjunct(spark, sf_dir):
    """q19: OR-of-conjunctions across both join sides. The part-side
    disjunction (brand ∈ {1,2,3}) is a common factor Catalyst can push
    into the broadcast build side; the mixed part+lineitem residual
    evaluates post-join inside codegen. One broadcast join, one 1-row
    aggregate — no shuffle at all."""
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & (q >= 20) & (q <= 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# --- q20 shape: nested IN with group-HAVING threshold -------------------------

@query(
    "tpch_q20_promo_suppliers",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem, part
  WHERE l_partkey = p_partkey AND p_name LIKE 'hot%'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > 50)
ORDER BY s_suppkey
""",
)
def _tpch_q20_promo_suppliers(spark, sf_dir):
    """q20: suppliers who moved real volume (>50 units of one 'hot'
    part in 1997). The inner aggregate's HAVING uses SUM(l_quantity) —
    integral doubles, exact. The IN collapses to a left-semi join
    against the distinct qualifying supplier keys; part filter
    broadcasts into the date-pruned lineitem scan so the only shuffle
    is the (l_suppkey, l_partkey) aggregate."""
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("hot%")).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    qualifying = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .orderBy("s_suppkey")
    )


# --- q21 shape: multi-supplier waiting orders (EXISTS + NOT EXISTS) -----------

@query(
    "tpch_q21_waiting",
    oracle="""
WITH ls AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey),
ord AS (
  SELECT l_orderkey, COUNT(*) AS nsupp, SUM(late) AS nlate
  FROM ls GROUP BY l_orderkey)
SELECT s_name, COUNT(*) AS numwait
FROM ls
JOIN ord USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE ls.late = 1 AND ord.nsupp > 1 AND ord.nlate = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
""",
)
def _tpch_q21_waiting(spark, sf_dir):
    """q21: the sole late supplier in a multi-supplier finished order.
    The classic EXISTS (another supplier) + NOT EXISTS (another LATE
    supplier) pair folds into ONE per-order aggregate — nsupp>1
    replaces EXISTS, nlate==1 replaces NOT-EXISTS-other-late — turning
    two correlated self-joins of lineitem into two hash aggregates on
    the same l_orderkey partitioning (no extra shuffle between them;
    both SQL and Spark use this decorrelated form, so semantics and
    hashes match by construction). Supplier names broadcast at the
    end."""
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    ls = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
                ).otherwise(0)
            ).alias("late")
        )
    )
    ord_stats = ls.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("nsupp"), F.sum("late").alias("nlate")
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ls.join(ord_stats, "l_orderkey")
        .filter((F.col("late") == 1) & (F.col("nsupp") > 1) & (F.col("nlate") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
