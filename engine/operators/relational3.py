"""Relational query suite, part 3 — the remaining TPC-H query shapes
(Q2, Q8, Q11, Q20, Q21), adapted to the fixture schema.

The synthetic tables (FIXTURES.md §2) have no ``partsupp`` relation, so
the three queries that consume it (Q2/Q11/Q20) are re-anchored on
``lineitem`` as the part↔supplier relation: "supply cost" becomes the
minimum observed unit price (``l_extendedprice / l_quantity``) and
"stock value" becomes shipped revenue. The query SHAPES — correlated
min subquery, scalar-subquery threshold, nested EXISTS / NOT EXISTS —
are preserved; those are what exercise the engine.

Reference parity note: the reference framework has no relational
operators at all (SURVEY.md §2.3; ``worker/__main__.py:55-58``
dispatches only map/reduce tasks), so this whole module is Layer-B
capability mandated by BASELINE.json's north star.

Cross-engine determinism: internal comparisons (argmin cost, EXISTS
date ordering) use per-row doubles or exact MIN/MAX — never
differently-ordered SUM/AVG — so Spark and DuckDB agree bit-for-bit;
rounding happens only on output columns.

Scale notes:
- Every dim join (part, supplier, nation, region, customer) is
  broadcast; only lineitem/orders ever shuffle.
- Q2's argmin is a window over (part) on the pre-aggregated
  part×supplier table — cardinality |parts|×|suppliers observed|, not
  |lineitem|.
- Q21's triple self-correlation is one shuffle on l_orderkey feeding a
  max-window + semi/anti logic, not three passes over lineitem.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from engine.functions.rounding import (
    duck_qsum,
    duck_round_he,
    qsum,
    round_he,
    sql_qsum,
    sql_round_he,
)
from engine.io import load_table
from engine.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q2-style: minimum-cost supplier per part (correlated min subquery).
# --------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
ranked AS (
  SELECT p.p_partkey, p.p_name, eu.s_name, eu.s_acctbal, eu.n_name,
         c.unit_cost,
         row_number() OVER (PARTITION BY p.p_partkey
                            ORDER BY c.unit_cost, eu.s_suppkey) AS rn
  FROM part p
  JOIN cost c ON p.p_partkey = c.l_partkey
  JOIN eu ON c.l_suppkey = eu.s_suppkey
  WHERE p.p_type IN ('SMALL', 'MEDIUM')
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       floor(unit_cost * 10000 + 0.5) / 10000 AS min_unit_cost
FROM ranked WHERE rn = 1
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    tags=("relational", "join", "subquery", "topk"),
    # Demoted from the exported 50 in round 10 to make room for
    # store_stream_source (round-9 verdict #6: the streaming source +
    # batch CDF was the round's second-biggest feature and the driver
    # never hashed its output). Q2's shapes stay driver-covered: the
    # correlated-min join via q15_q20_q21_supplier_audit's min-cost
    # facet and the part/supplier dimension joins via
    # q11_q16_part_stats; this row remains fully oracled as a library
    # query (tools/check_oracle.py gates it every round).
    exported=False,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each SMALL/MEDIUM part, the EUROPE supplier offering the
    lowest observed unit price. The classic Q2 correlated-min subquery,
    decorrelated as an argmin window over the part×supplier cost table.
    Argmin compares exact per-row MIN doubles (deterministic across
    engines); s_suppkey breaks cost ties.

    Output rounding is floor(x*1e4 + 0.5)/1e4 — identical IEEE double
    ops in both engines — because price/quantity often TERMINATES at
    the x.xxxx5 boundary, where Spark's BigDecimal HALF_UP and DuckDB's
    scaled-double nearbyint disagree (hit at sf0.1: 225.17875)."""
    li = _t(spark, sf_dir, "lineitem")
    cost = li.groupBy(
        "l_partkey", "l_suppkey"
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_type").isin("SMALL", "MEDIUM")
    ).select("p_partkey", "p_name")
    # Per-part argmin as min_by (ordering struct = the oracle's
    # (unit_cost, s_suppkey) row_number tie-break, unique per part):
    # partial aggregation collapses candidates map-side, where the
    # row_number window shuffled and sorted every (part, supplier) row.
    payload = F.struct("s_acctbal", "s_name", "n_name", "p_name", "unit_cost")
    best = (
        cost.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey")
        .agg(
            F.min_by(
                payload, F.struct(F.col("unit_cost"), F.col("s_suppkey"))
            ).alias("_b")
        )
    )
    return (
        best.select(
            F.col("_b.s_acctbal").alias("s_acctbal"),
            F.col("_b.s_name").alias("s_name"),
            F.col("_b.n_name").alias("n_name"),
            "p_partkey",
            F.col("_b.p_name").alias("p_name"),
            (F.floor(F.col("_b.unit_cost") * 10000 + 0.5) / 10000).alias(
                "min_unit_cost"
            ),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q8-style: national market share within a region's market.
# --------------------------------------------------------------------------

# Both CASE sums ride the 1e4 integer grid and the ratio of the exact
# integers is rounded via identical IEEE ops (as q14_promo_revenue) —
# round(sum(double)/sum(double)) was the last-digit partial-order flake
# class.
_Q8_SHARE = duck_round_he(
    "CAST("
    + duck_qsum(
        "CASE WHEN sn.n_name = 'NATION_2' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
    )
    + " AS DOUBLE) / CAST("
    + duck_qsum("l_extendedprice * (1 - l_discount)")
    + " AS DOUBLE)",
    6,
)


@query(
    "q8_market_share",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       {_Q8_SHARE} AS mkt_share
FROM lineitem
JOIN part      ON l_partkey = p_partkey
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region    ON cn.n_regionkey = r_regionkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
GROUP BY year(o_orderdate)
ORDER BY o_year
""",
    tags=("relational", "join", "aggregate"),
    exported=False,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_2's share of ECONOMY-part revenue sold to ASIA customers,
    per order year. Eight-table join: lineitem shuffles once onto
    orders; part/customer/supplier/nation/region all broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter("p_type = 'ECONOMY'").select("p_partkey")
    nat = _t(spark, sf_dir, "nation")
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nat.alias("cn")), F.expr("c_nationkey = cn.n_nationkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.expr("cn.n_regionkey = r_regionkey"),
        )
        .filter("r_name = 'ASIA'")
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat.alias("sn")), F.expr("s_nationkey = sn.n_nationkey"))
        .selectExpr("s_suppkey", "sn.n_name AS supp_nation")
    )
    vol = "l_extendedprice * (1 - l_discount)"
    joined = (
        li.join(F.broadcast(p), F.expr("l_partkey = p_partkey"))
        .join(o, F.expr("l_orderkey = o_orderkey"))
        .join(F.broadcast(cust), F.expr("o_custkey = c_custkey"))
        .join(F.broadcast(supp), F.expr("l_suppkey = s_suppkey"))
    )
    nat2_vol = f"CASE WHEN supp_nation = 'NATION_2' THEN {vol} ELSE 0.0D END"
    share = sql_round_he(
        f"CAST({sql_qsum(nat2_vol)} AS DOUBLE)"
        f" / CAST({sql_qsum(vol)} AS DOUBLE)",
        6,
    )
    return (
        joined.groupBy(F.expr("year(o_orderdate) AS o_year"))
        .agg(F.expr(f"{share} AS mkt_share"))
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q11-style: important parts by stocked value (scalar-subquery threshold).
# --------------------------------------------------------------------------
@query(
    "q11_important_parts",
    oracle=f"""
WITH eu_value AS (
  SELECT l_partkey, {duck_qsum("l_extendedprice")} AS pv_q
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey,
       {duck_round_he("CAST(pv_q AS DOUBLE) / CAST(10000.0 AS DOUBLE)", 2)}
         AS part_value
FROM eu_value
WHERE CAST(pv_q AS DOUBLE) / CAST(10000.0 AS DOUBLE)
      > (SELECT CAST(sum(pv_q) AS DOUBLE) / CAST(10000.0 AS DOUBLE)
                / count(*) * CAST(2.4 AS DOUBLE) FROM eu_value)
ORDER BY part_value DESC, p_partkey
""",
    tags=("relational", "subquery", "aggregate"),
    exported=False,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose EUROPE-supplied revenue exceeds 2.4× the per-part
    average (scale-free threshold ⇒ ~top 1% at any sf) — Q11's
    scalar-subquery-over-the-same-aggregate shape. The per-part
    aggregate is computed once; the global average is its single-row
    re-aggregation, joined back by broadcast (no second lineitem
    pass)."""
    li = _t(spark, sf_dir, "lineitem")
    eu_supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey")
    )
    # Scalar-subquery shape: eu_value feeds both the threshold and the
    # filter; persisted (1 row/part) so lineitem scans once. The
    # per-part sum rides the qsum integer grid and the threshold is
    # derived from the exact integer total via the same IEEE op
    # sequence as the oracle — round(sum(double)) here was the
    # order-dependent boundary class.
    eu_value = (
        li.join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(qsum("l_extendedprice").alias("pv_q"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    total = eu_value.agg(
        (
            F.sum("pv_q").cast("double")
            / F.lit(10000.0)
            / F.count(F.lit(1))
            * F.lit(2.4)
        ).alias("threshold")
    )
    pv = F.col("pv_q").cast("double") / F.lit(10000.0)
    return (
        eu_value.join(F.broadcast(total))
        .filter(pv > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            round_he(pv, 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


# --------------------------------------------------------------------------
# Q20-style: suppliers dominating supply of a part family (nested IN).
# --------------------------------------------------------------------------
@query(
    "q20_dominant_suppliers",
    oracle="""
WITH blue AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'
),
shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
  FROM lineitem JOIN blue ON l_partkey = p_partkey
  GROUP BY 1, 2
),
part_total AS (
  SELECT l_partkey, sum(supp_qty) AS total_qty FROM shipped GROUP BY 1
)
SELECT DISTINCT s_name, n_name
FROM shipped
JOIN part_total USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE supp_qty > 0.15 * total_qty
ORDER BY s_name
""",
    tags=("relational", "subquery", "semi-join"),
    exported=False,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers shipping >15% of any 'blue' part's total quantity —
    Q20's nested-subquery shape (correlated availability threshold)
    re-anchored on shipped quantities. Decorrelated into ONE pipeline:
    the explicit repartition on l_partkey ALONE replaces the
    (l_partkey, l_suppkey) exchange the groupBy would insert
    (hashpartitioning on a subset of the grouping keys satisfies the
    aggregate's clustering requirement), and the per-part total is a
    window sum over the SAME partitioning — no self-join, no persist,
    no second aggregate, no broadcast back. Quantities are small
    integers in doubles, so both the window sum and the 0.15×
    comparison are exact across engines regardless of ordering."""
    li = _t(spark, sf_dir, "lineitem")
    blue = _t(spark, sf_dir, "part").filter(F.col("p_name").like("blue%")).select(
        "p_partkey"
    )
    shipped = (
        li.join(F.broadcast(blue), F.col("l_partkey") == F.col("p_partkey"))
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    total = F.sum("supp_qty").over(W.partitionBy("l_partkey"))
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        shipped.withColumn("total_qty", total)
        .filter(F.col("supp_qty") > 0.15 * F.col("total_qty"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "n_name")
        .distinct()
        # no ORDER BY: result order is presentational only (the oracle
        # compare sorts rows) and the range exchange it costs is real
    )


# --------------------------------------------------------------------------
# Q21-style: suppliers who were last to ship in multi-supplier orders
# (EXISTS + NOT EXISTS double correlation).
# --------------------------------------------------------------------------
@query(
    "q21_last_to_ship_suppliers",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN orders   ON l1.l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    tags=("relational", "exists", "topk"),
    exported=False,
)
def q21_last_to_ship_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's double-correlated EXISTS/NOT EXISTS, re-anchored on ship
    order: count, per supplier, finished-order lines where another
    supplier participated (EXISTS) but none shipped later (NOT EXISTS).
    Decorrelated into ONE window pass over lineitem keyed on
    l_orderkey — max(shipdate) over other suppliers' lines — instead of
    three lineitem scans; MAX comparisons are exact doubles, so the
    anti-condition matches the oracle bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    w = W.partitionBy("l_orderkey")
    # Per line: max shipdate over the whole order, count of distinct
    # suppliers, and max shipdate among lines of the SAME supplier —
    # "some other supplier shipped later" ⇔ order max > this supplier's
    # max within the order... but the correlation is per-LINE, so:
    # another supplier shipped after l1 ⇔ max-over-others > l1.shipdate.
    # max-over-others = order_max if l1 isn't the unique max holder;
    # computing it directly: max over lines with a different suppkey.
    # Trick: top-2 distinct (shipdate, suppkey) pairs give the answer:
    #   other_max = order_max              if max-holder.suppkey <> l1's
    #             = second_distinct_max    otherwise (max over lines
    #               whose shipdate == order_max but other supplier, else
    #               strictly-smaller max).
    # Simpler and still single-shuffle: collect the max shipdate per
    # (order, supplier), then per order the top-2 of those supplier
    # maxima decide every line's fate.
    # Pre-partition on l_orderkey ALONE: that one exchange satisfies
    # the (l_orderkey, l_suppkey) groupBy's clustering requirement AND
    # every subsequent l_orderkey-partitioned window — the window
    # passes then add no exchange (was: one (ok, sk) agg exchange +
    # one ok window exchange).
    per_supp = (
        li.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_max"))
    )
    w2 = W.partitionBy("l_orderkey")
    per_supp = per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w2)).withColumn(
        "order_max", F.max("supp_max").over(w2)
    )
    # max over OTHER suppliers' maxima: if this supplier holds the
    # unique max, it's the 2nd-highest; otherwise the order max.
    w_rank = W.partitionBy("l_orderkey").orderBy(
        F.col("supp_max").desc(), F.col("l_suppkey")
    )
    per_supp = per_supp.withColumn(
        "top1_max", F.first("supp_max").over(w_rank.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    ).withColumn(
        "top1_supp",
        F.first("l_suppkey").over(
            w_rank.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ),
    ).withColumn(
        "top2_max",
        F.nth_value("supp_max", 2).over(
            w_rank.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ),
    )
    other_max = F.when(
        F.col("l_suppkey") == F.col("top1_supp"), F.col("top2_max")
    ).otherwise(F.col("top1_max"))
    qualifying_supp = per_supp.filter(
        (F.col("n_supp") > 1)  # EXISTS another supplier
        & (F.col("supp_max") >= other_max)  # this supplier's max line
    ).select(
        "l_orderkey",
        "l_suppkey",
        other_max.alias("other_max"),
    )
    # Back to LINE granularity: a line l1 qualifies iff no other
    # supplier shipped strictly later ⇔ l1.shipdate >= other_max.
    lines = li.join(qualifying_supp, ["l_orderkey", "l_suppkey"]).filter(
        F.col("l_shipdate") >= F.col("other_max")
    )
    fin = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lines.join(fin, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "array_agg_functions",
    oracle="""
WITH qs AS (
  SELECT l_orderkey, list_sort(list(l_quantity)) AS q
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(q) AS INT) AS n_items,
       round(q[1], 2) AS min_qty,
       round(q[-1], 2) AS max_qty,
       round(list_sum(list_transform(q, x -> CAST(x AS DOUBLE))), 2) AS sum_qty,
       CAST(list_contains(q, 25.0) AS BOOLEAN) AS has_qty_25,
       CAST(len(list_distinct(q)) AS INT) AS n_distinct_qty
FROM qs
""",
    tags=("relational", "array", "functions"),
)
def array_agg_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over per-order quantity lists:
    collect → sort → index (first/last) → fold (aggregate) → contains
    → distinct. collect_list is order-nondeterministic under retries,
    so every derived value goes through array_sort / order-insensitive
    folds — the same rule that makes the query engine-reproducible
    makes it retry-safe at scale. One shuffle (the groupBy); scalar
    outputs keep the value-hash gate array-free."""
    li = _t(spark, sf_dir, "lineitem")
    qs = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("q")
    )
    return qs.select(
        "l_orderkey",
        F.size("q").cast("int").alias("n_items"),
        F.round(F.element_at("q", 1), 2).alias("min_qty"),
        F.round(F.element_at("q", -1), 2).alias("max_qty"),
        F.round(
            F.expr(
                "aggregate(q, cast(0.0 as double), (acc, x) -> acc + cast(x as double))"
            ),
            2,
        ).alias("sum_qty"),
        F.array_contains("q", 25.0).alias("has_qty_25"),
        F.size(F.array_distinct("q")).cast("int").alias("n_distinct_qty"),
    )


N_HIST_BUCKETS = 10


@query(
    "histogram_order_totalprice",
    oracle=f"""
WITH b AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
)
SELECT CAST(CASE WHEN hi = lo THEN 0
            ELSE least(floor((o_totalprice - lo) / (hi - lo) * {N_HIST_BUCKETS}),
                       {N_HIST_BUCKETS - 1}) END AS BIGINT) AS bucket,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS bucket_min,
       round(max(o_totalprice), 2) AS bucket_max
FROM orders, b
GROUP BY 1
""",
    tags=("relational", "aggregate", "histogram"),
    exported=False,
)
def histogram_order_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of order totals: global min/max as a
    1-row broadcast scalar (never a global sort), then a pure
    expression bucket id — two scans, one count shuffle on ≤{N_HIST_BUCKETS}
    keys. Bucket edges use the same IEEE double ops in both engines,
    so assignment is bit-identical."""
    orders = _t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    # hi == lo (single-valued column) would be 0/0 → NaN bucket in
    # Spark vs NULL/error in DuckDB; pin the degenerate case to bucket 0
    # on both engines (round-1 advice).
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * N_HIST_BUCKETS
            ),
            F.lit(N_HIST_BUCKETS - 1),
        )
    )
    return (
        orders.join(F.broadcast(bounds))
        .groupBy(bucket.cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
    )


@query(
    "data_quality_audit",
    oracle="""
SELECT 'lineitem_rows' AS check, CAST(count(*) AS BIGINT) AS value FROM lineitem
UNION ALL
SELECT 'lineitem_null_quantity', CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_quantity IS NULL
UNION ALL
SELECT 'lineitem_nonpositive_price', CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_extendedprice <= 0
UNION ALL
SELECT 'orders_dup_pk', CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem_orphan_orders', CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders_orphan_customers', CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
""",
    tags=("relational", "audit"),
    exported=False,
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (the Deequ/great-expectations
    shape): completeness, validity, primary-key uniqueness, and
    referential integrity, emitted as one (check, value) metric table
    where 0 means clean for every check but row count.

    Scale shape: each check is an independent scalar aggregate over a
    pruned scan (count/null-count push down to the parquet footer
    statistics in the row-count cases); the two referential checks are
    left-anti joins that broadcast nothing and shuffle only the key
    columns. Checks union AFTER aggregation — the combined plan stays a
    union of O(1)-row results, so adding checks scales the audit
    linearly in scans, never in shuffle width.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def scalar(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check"),
            F.count(F.lit(1)).cast("bigint").alias("value"),
        )

    checks = [
        scalar("lineitem_rows", li),
        scalar("lineitem_null_quantity", li.filter(F.col("l_quantity").isNull())),
        scalar(
            "lineitem_nonpositive_price",
            li.filter(F.col("l_extendedprice") <= 0),
        ),
        orders.agg(
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
            .cast("bigint")
            .alias("value")
        ).select(F.lit("orders_dup_pk").alias("check"), "value"),
        scalar(
            "lineitem_orphan_orders",
            li.select("l_orderkey").join(
                orders.select("o_orderkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
                "left_anti",
            ),
        ),
        scalar(
            "orders_orphan_customers",
            orders.select("o_custkey").join(
                customer.select("c_custkey"),
                F.col("o_custkey") == F.col("c_custkey"),
                "left_anti",
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out
