"""Relational suite, part 2: correlated subqueries, scalar subqueries,
histogram aggregation, disjunctive predicates, pivot, grouping sets,
and the SQL-string API surface.

Everything remains declarative DataFrame/SQL so Catalyst handles
decorrelation (subquery → join), pushdown, and join strategy. Queries
marked with spark.sql(...) exercise the SQL parser path on registered
temp views — same Catalyst plans as the fluent API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.functions.rounding import (
    duck_qavg_rounded,
    duck_qsum,
    duck_qsum_rounded,
    duck_round_he,
    qavg_rounded,
    qsum,
    qsum_rounded,
    round_he,
    sql_qsum_rounded,
)
from engine.io import load_table
from engine.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q7_nation_volume",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       floor((CAST(CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * CAST(10000.0 AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / CAST(10000.0 AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS volume
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, year(o_orderdate)
""",
    tags=("relational", "join"),
    exported=False,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 adapted: cross-nation trade volume by year. All dims
    broadcast; the lineitem⋈orders shuffle is the only big exchange."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.selectExpr("n_nationkey AS n1_key", "n_name AS supp_nation")
    n2 = nation.selectExpr("n_nationkey AS n2_key", "n_name AS cust_nation")
    return (
        li.join(orders, F.expr("l_orderkey = o_orderkey"))
        .join(F.broadcast(supp), F.expr("l_suppkey = s_suppkey"))
        .join(F.broadcast(cust), F.expr("o_custkey = c_custkey"))
        .join(F.broadcast(n1), F.expr("s_nationkey = n1_key"))
        .join(F.broadcast(n2), F.expr("c_nationkey = n2_key"))
        .filter(
            "supp_nation IN ('NATION_1', 'NATION_2')"
            " AND cust_nation IN ('NATION_1', 'NATION_2')"
            " AND supp_nation <> cust_nation"
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.expr("CAST(year(o_orderdate) AS INT) AS o_year"),
        )
        .agg(
            F.expr(
                f"{sql_qsum_rounded('l_extendedprice * (1 - l_discount)', 2)}"
                " AS volume"
            )
        )
    )


@query(
    "q9_product_profit",
    oracle="""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                - 60 * CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                     * CAST(l_quantity AS BIGINT))
            AS DOUBLE) / 10000.0 AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'PROMO'
GROUP BY n_name, year(o_orderdate)
""",
    tags=("relational", "join"),
    exported=False,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (0.6·retailprice stands in for ps_supplycost,
    which this schema lacks): profit by supplier nation and year.

    Profit is aggregated as EXACT integer 1e-4 dollars (cents ×
    discount-hundredths are integers, quantity is integral), then
    divided back once: a double sum re-associates differently across
    engines and partitionings, and at sf0.1 the result actually
    straddled a cent boundary (round-2 finding) — integer sums are
    order-independent, so the output is bit-stable under ANY plan."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter("p_type = 'PROMO'")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    cents = "CAST(floor({c} * 100 + 0.5D) AS BIGINT)"
    profit_1e4 = (
        f"{cents.format(c='l_extendedprice')}"
        f" * (100 - {cents.format(c='l_discount')})"
        f" - 60 * {cents.format(c='p_retailprice')}"
        " * CAST(l_quantity AS BIGINT)"
    )
    return (
        li.join(F.broadcast(part), F.expr("l_partkey = p_partkey"))
        .join(F.broadcast(supp), F.expr("l_suppkey = s_suppkey"))
        .join(orders, F.expr("l_orderkey = o_orderkey"))
        .join(F.broadcast(nation), F.expr("s_nationkey = n_nationkey"))
        .groupBy(
            F.expr("n_name AS nation"),
            F.expr("CAST(year(o_orderdate) AS INT) AS o_year"),
        )
        .agg(
            F.expr(f"CAST(sum({profit_1e4}) AS DOUBLE) / 10000.0D AS profit")
        )
    )


@query(
    "q13_order_count_histogram",
    oracle="""
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t GROUP BY c_count
""",
    tags=("relational", "outerjoin", "aggregate"),
    exported=False,  # driver-visible via facets2.q13_q18_order_size
)
def q13_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: orders-per-customer histogram via left outer join
    (customers with zero orders count as c_count = 0)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         floor((CAST(CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * CAST(10000.0 AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / CAST(10000.0 AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    tags=("relational", "subquery"),
    exported=False,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: CTE + scalar max subquery. Spark does NOT reuse the
    CTE across the two consumers (the supplier join and the max scalar
    agg each rebuilt the revenue aggregate from a fresh lineitem scan —
    two fact scans + two suppkey shuffles in the executed plan), so the
    revenue intermediate is persisted: one lineitem scan, one shuffle,
    and the max is a cheap single-partition fold of |suppliers| cached
    rows. Same multi-consumer discipline as semantic_dedup /
    hypertable_rollup."""
    from pyspark import StorageLevel

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            qsum_rounded(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "total_revenue"
            )
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_part_supplier_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size IN (5, 10, 15, 20)
GROUP BY p_brand, p_type, p_size
""",
    tags=("relational", "distinct"),
    exported=False,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: distinct supplier counts per part group.
    countDistinct expands to a two-phase aggregate — partial distinct
    map-side, exact count reduce-side."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(5, 10, 15, 20)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
SELECT floor((CAST(CAST(sum(CAST(floor((l_extendedprice / 7.0) * CAST(10000.0 AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / CAST(10000.0 AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
""",
    tags=("relational", "subquery"),
    exported=False,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated avg subquery, decorrelated into a
    per-part aggregate joined back to the fact — the plan Catalyst's
    decorrelation produces from the SQL form, written explicitly."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(qsum_rounded(F.col("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
SELECT floor((CAST(CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * CAST(10000.0 AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / CAST(10000.0 AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 15 AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size <= 25 AND l_quantity >= 5 AND l_quantity <= 30)
   OR (p_brand = 'Brand#3' AND p_size <= 35 AND l_quantity >= 10 AND l_quantity <= 40)
""",
    tags=("relational", "filter"),
    exported=False,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs predicate across join sides — exercises
    CNF conversion / partial pushdown (the p_size bounds push into the
    part scan; the mixed conjuncts stay on the join)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 25) & q.between(5, 30))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 35) & q.between(10, 40))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            qsum_rounded(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q22_idle_rich_customers",
    oracle=f"""
WITH avg_bal AS (
  SELECT CAST({duck_qsum("c_acctbal")} AS DOUBLE) / CAST(10000.0 AS DOUBLE)
         / count(*) AS ab
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, count(*) AS numcust,
       floor((CAST(CAST(sum(CAST(floor((c_acctbal) * CAST(10000.0 AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / CAST(10000.0 AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
""",
    tags=("relational", "subquery", "antijoin"),
    exported=False,  # driver-visible via facets2.q10_q22_customer_value
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted: above-average balances, no recent (2000+)
    orders — scalar subquery broadcast + anti join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    # Threshold from the exact integer-grid sum (identical IEEE op
    # sequence as the oracle): a raw avg(double) partial-sums in task
    # order, and a customer whose balance sits an ulp from the mean
    # could flip membership between engines/runs (the q11 class).
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            qsum("c_acctbal").cast("double")
            / F.lit(10000.0)
            / F.count(F.lit(1))
        ).alias("ab")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            qsum_rounded("c_acctbal", 2).alias("totacctbal"),
        )
    )


@query(
    "pivot_priority_by_status",
    oracle=f"""
SELECT o_orderstatus,
       coalesce({duck_qsum_rounded("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END", 2)}, 0.0) AS urgent,
       coalesce({duck_qsum_rounded("CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END", 2)}, 0.0) AS high,
       coalesce({duck_qsum_rounded("CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END", 2)}, 0.0) AS low
FROM orders
GROUP BY o_orderstatus
""",
    tags=("relational", "pivot"),
    exported=False,
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order priorities to columns. Explicit value list keeps the
    plan single-pass (no distinct-values pre-query) — required practice
    at scale. The pivoted money sums ride the qsum integer grid (the
    pivot aggregates the pre-quantized BIGINT), so partial-sum order
    can't move the rounded outputs on either engine."""
    orders = _t(spark, sf_dir, "orders")
    q = F.floor(F.col("o_totalprice") * F.lit(10000.0) + F.lit(0.5)).cast(
        "bigint"
    )
    piv = (
        orders.withColumn("_q", q)
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "5-LOW"])
        .sum("_q")
    )

    def unquant(c: str):
        return F.coalesce(
            round_he(F.col(c).cast("double") / F.lit(10000.0), 2), F.lit(0.0)
        )

    return piv.select(
        "o_orderstatus",
        unquant("1-URGENT").alias("urgent"),
        unquant("2-HIGH").alias("high"),
        unquant("5-LOW").alias("low"),
    )


@query(
    "grouping_sets_sql",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       floor((CAST(CAST(sum(CAST(floor((l_extendedprice) * CAST(10000.0 AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / CAST(10000.0 AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS total
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    tags=("relational", "groupingsets", "sql"),
    exported=False,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the SQL-string API (same Catalyst plan as
    the fluent rollup — exercises the parser surface)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               floor((CAST(CAST(sum(CAST(floor((l_extendedprice) * CAST(10000.0 AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / CAST(10000.0 AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS total
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "union_all_activity",
    oracle="""
SELECT actor_id, kind, n FROM (
  SELECT o_custkey AS actor_id, 'order' AS kind, count(*) AS n
  FROM orders GROUP BY o_custkey
  UNION ALL
  SELECT user_id AS actor_id, 'event' AS kind, count(*) AS n
  FROM events GROUP BY user_id
) t
""",
    tags=("relational", "setop"),
    exported=False,
)
def union_all_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two differently-sourced aggregates (bag semantics,
    no dedup shuffle — contrast with setop_* queries)."""
    orders = _t(spark, sf_dir, "orders")
    events = _t(spark, sf_dir, "events")
    a = orders.groupBy(F.col("o_custkey").alias("actor_id")).agg(
        F.count(F.lit(1)).alias("n")
    ).select("actor_id", F.lit("order").alias("kind"), "n")
    b = events.groupBy(F.col("user_id").alias("actor_id")).agg(
        F.count(F.lit(1)).alias("n")
    ).select("actor_id", F.lit("event").alias("kind"), "n")
    return a.unionByName(b)


@query(
    "null_bucketing",
    oracle="""
SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 1000 THEN 'low'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bal_bucket,
       count(*) AS n,
       floor((CAST(CAST(sum(CAST(floor((coalesce(nullif(c_acctbal, 0.0), 0.0)) * CAST(10000.0 AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / CAST(10000.0 AS DOUBLE) / count(coalesce(nullif(c_acctbal, 0.0), 0.0))) * CAST(10000.0 AS DOUBLE) + 0.5) / CAST(10000.0 AS DOUBLE) AS avg_bal
FROM customer
GROUP BY 1
""",
    tags=("relational", "scalar"),
    exported=False,
)
def null_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE bucketing + coalesce/nullif null plumbing."""
    cust = _t(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return cust.groupBy(bucket.alias("bal_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        qavg_rounded(
            F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(0.0)), 4
        ).alias("avg_bal"),
    )


@query(
    "like_regexp_filters",
    oracle="""
SELECT p_partkey, p_name, p_brand
FROM part
WHERE p_name LIKE 'small%'
  AND regexp_matches(p_brand, '^Brand#[12]$')
""",
    tags=("relational", "scalar", "filter"),
    exported=False,
)
def like_regexp_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE prefix (pushed to parquet as a range) + RLIKE regex."""
    part = _t(spark, sf_dir, "part")
    return part.filter(
        F.col("p_name").like("small%") & F.col("p_brand").rlike("^Brand#[12]$")
    ).select("p_partkey", "p_name", "p_brand")


# stats_lineitem_summary: every moment statistic is derived from exact
# integer-grid sums (sum-of-squares at DECIMAL(38,0)), so partial-
# aggregation ORDER cannot move any output digit — stddev/var/corr were
# the last aggregate family riding raw double sums. The grids are exact
# for the fixture decimals (quantity: integers, ×100; discount: 4dp,
# ×1e4; price: 2dp, ×100) and the identical formula TEXT is evaluated
# by both engines, so every double op downstream of the exact integers
# is the same IEEE op. Percentiles stay on the raw doubles: Spark's
# `percentile` and DuckDB's `quantile_cont` compute the SAME linear
# interpolation (lo + frac*(hi-lo) at pos p*(n-1)) with the same IEEE
# ops — verified bit-for-bit across a 160-case adversarial sweep
# (n up to 12,345; p in {.25,.5,.77,.9}) and continuously gated by
# tests/test_properties.py::
# test_percentile_bit_identical_to_duckdb_quantile_cont — then round
# via round_he. Constructed identity, not fixture luck.
_STATS_SD_QTY = duck_round_he(
    "sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sqq - sq * sq AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))"
    " / CAST(100.0 AS DOUBLE)",
    4,
)
_STATS_VAR_DISC = duck_round_he(
    "CAST(CAST(n AS DECIMAL(38,0)) * sdd - sd * sd AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))"
    " / CAST(10000.0 AS DOUBLE) / CAST(10000.0 AS DOUBLE)",
    6,
)
_STATS_CORR = duck_round_he(
    "CAST(CAST(n AS DECIMAL(38,0)) * sqp - sq * sp AS DOUBLE)"
    " / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sqq - sq * sq AS DOUBLE)"
    " * CAST(CAST(n AS DECIMAL(38,0)) * spp - sp * sp AS DOUBLE))",
    6,
)
_STATS_MEDIAN = duck_round_he("med_raw", 4)
_STATS_P90 = duck_round_he("p90_raw", 4)


@query(
    "stats_lineitem_summary",
    oracle=f"""
WITH g AS (
  SELECT l_returnflag, l_quantity, l_extendedprice,
         CAST(floor(l_quantity * CAST(100.0 AS DOUBLE) + 0.5) AS BIGINT) AS qq,
         CAST(floor(l_discount * CAST(10000.0 AS DOUBLE) + 0.5) AS BIGINT) AS qd,
         CAST(floor(l_extendedprice * CAST(100.0 AS DOUBLE) + 0.5) AS BIGINT) AS qp
  FROM lineitem
), a AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(sum(qq) AS DECIMAL(38,0)) AS sq,
         CAST(sum(qd) AS DECIMAL(38,0)) AS sd,
         CAST(sum(qp) AS DECIMAL(38,0)) AS sp,
         CAST(sum(CAST(qq * qq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sqq,
         CAST(sum(CAST(qd * qd AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sdd,
         CAST(sum(CAST(qp * qp AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS spp,
         CAST(sum(CAST(qq * qp AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sqp,
         quantile_cont(l_quantity, 0.5) AS med_raw,
         quantile_cont(l_extendedprice, 0.9) AS p90_raw
  FROM g GROUP BY l_returnflag
)
SELECT l_returnflag,
       {_STATS_SD_QTY} AS sd_qty,
       {_STATS_VAR_DISC} AS var_disc,
       {_STATS_CORR} AS corr_qty_price,
       {_STATS_MEDIAN} AS median_qty,
       {_STATS_P90} AS p90_price
FROM a
""",
    tags=("relational", "stats"),
    exported=False,
)
def stats_lineitem_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates — sample stddev/variance, Pearson
    correlation, exact interpolated percentiles (percentile ==
    DuckDB quantile_cont semantics) — with every moment computed from
    exact integer-grid sums (see the formula constants above): the
    shuffle carries BIGINT/DECIMAL partials, so the result is
    independent of partial-aggregation order on any cluster size."""
    li = _t(spark, sf_dir, "lineitem")

    def grid(col: str, q: float):
        return F.floor(F.col(col) * F.lit(q) + F.lit(0.5)).cast("bigint")

    g = li.select(
        "l_returnflag",
        "l_quantity",
        "l_extendedprice",
        grid("l_quantity", 100.0).alias("qq"),
        grid("l_discount", 10000.0).alias("qd"),
        grid("l_extendedprice", 100.0).alias("qp"),
    )
    a = g.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qq").cast("decimal(38,0)").alias("sq"),
        F.sum("qd").cast("decimal(38,0)").alias("sd"),
        F.sum("qp").cast("decimal(38,0)").alias("sp"),
        F.sum((F.col("qq") * F.col("qq")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sqq"),
        F.sum((F.col("qd") * F.col("qd")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sdd"),
        F.sum((F.col("qp") * F.col("qp")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("spp"),
        F.sum((F.col("qq") * F.col("qp")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sqp"),
        F.percentile("l_quantity", F.lit(0.5)).alias("med_raw"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_raw"),
    )
    return a.select(
        "l_returnflag",
        F.expr(_STATS_SD_QTY).alias("sd_qty"),
        F.expr(_STATS_VAR_DISC).alias("var_disc"),
        F.expr(_STATS_CORR).alias("corr_qty_price"),
        F.expr(_STATS_MEDIAN).alias("median_qty"),
        F.expr(_STATS_P90).alias("p90_price"),
    )


@query(
    "minmax_by_lookup",
    oracle="""
SELECT n_name, c_name AS richest_customer, round(max_bal, 2) AS max_bal
FROM (
  SELECT n_name, c_name,
         max(c_acctbal) OVER (PARTITION BY n_name) AS max_bal,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) t WHERE rn = 1
""",
    tags=("relational", "stats"),
    exported=False,
)
def minmax_by_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by argmax aggregation, ordered by a NUMERIC (balance,
    custkey) struct on both engines — a previous string ordering key
    (round(bal) || '-' || custkey) compared lexicographically, so
    '989.74' outranked '9664.04' and richest_customer contradicted
    max_bal in the same row; struct comparison is numeric field-by-
    field and the unique custkey keeps the argmax deterministic."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by(
                "c_name", F.struct(F.col("c_acctbal"), F.col("c_custkey"))
            ).alias("richest_customer"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
    )
