"""Range join and hypertable-style rollup operators.

Absent from the reference (SURVEY.md §2.3 — its worker dispatches only
map/reduce tasks, ``worker/__main__.py:55-58``); both are Layer-B
capability for time-series / interval workloads.

Range join, the scale problem: Spark plans a non-equi interval
containment join (``point BETWEEN start AND end``) as
BroadcastNestedLoopJoin or a cartesian product — O(|points|×|intervals|)
at 100 TB. The standard fix (used by Databricks' range-join hints and
every streaming interval join) is BUCKETING: overlay a fixed-width grid,
emit each interval once per grid cell it covers, equi-join points to
cells, then apply the exact containment predicate. Cost becomes
O(|points| + Σ interval_width/bucket) shuffled on the cell key — an
ordinary hash join Catalyst and AQE already know how to execute.

Hypertable rollup (continuous-aggregate pattern): aggregate raw events
ONCE at the finest grain, then fold each coarser grain from the next
finer one — day from hour, month from day. At 100 TB the raw table is
scanned exactly once; coarser rollups re-aggregate ~1/3600th of the
data. Averages are carried as (sum, count) pairs so re-aggregation is
lossless (avg-of-avg is wrong under uneven buckets).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.functions.hashing import DUCK_H60, SPARK_H60
from engine.functions.rounding import (
    VALUE_Q,
    duck_round_he,
    qsum_rounded,
    round_he,
    sql_round_he,
)
from engine.io import load_table
from engine.registry import query


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    how: str = "inner",
    extra_condition: Column | None = None,
) -> DataFrame:
    """Bucketed interval-containment join: rows of ``points`` matched to
    rows of ``intervals`` where ``start_col <= point_col < end_col``
    (half-open, the time-series convention).

    ``bucket_seconds`` is the grid width — choose it near the typical
    interval length: too small multiplies interval replication
    (Σ width/bucket), too large multiplies false candidates per cell.
    Both inputs shuffle once on the cell key; no cartesian, no nested
    loop. Inner-only: the containment filter runs AFTER the cell join,
    where it would silently drop an outer join's null-extended rows —
    for LEFT semantics aggregate the inner result and re-join
    (range_join_order_day_events shows the pattern).
    """
    if how != "inner":
        raise ValueError(
            "range_join supports how='inner' only — the post-join"
            " containment filter drops null-extended rows, silently"
            " degrading any outer join to inner; build LEFT semantics"
            " by re-joining the aggregated inner result instead"
        )
    # Epoch seconds as DOUBLE (cast keeps sub-second precision):
    # unix_timestamp() truncates to whole seconds, which dropped the
    # final grid cell of any interval whose end carries a fractional
    # second (events.ts is nanosecond-precision per engine/io.py) —
    # a point in that last cell silently missed its match.
    p_sec = F.col(point_col).cast("double")
    s_sec = F.col(start_col).cast("double")
    e_sec = F.col(end_col).cast("double")
    p_b = points.withColumn(
        "__cell", F.floor(p_sec / F.lit(float(bucket_seconds))).cast("bigint")
    )
    first_cell = F.floor(s_sec / F.lit(float(bucket_seconds))).cast("bigint")
    # end is exclusive: an interval ending exactly on a cell boundary
    # does not reach into that cell, so last cell = ceil(end/bucket)-1
    # (correct for fractional ends too, unlike floor((end_s - 1)/b)).
    last_cell = (F.ceil(e_sec / F.lit(float(bucket_seconds))) - F.lit(1)).cast(
        "bigint"
    )
    i_b = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        # The end>start guard keeps the sequence ascending: an empty or
        # corrupt interval (end <= start) must yield ZERO cells, not
        # the descending runaway Spark's sequence produces when
        # stop < start. For valid half-open intervals last >= first
        # always holds.
        "__cell",
        F.explode(F.sequence(first_cell, last_cell)),
    )
    cond = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) < F.col(end_col)
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    return p_b.join(i_b, "__cell", how).filter(cond).drop("__cell")


@query(
    "range_join_order_day_events",
    oracle="""
SELECT o_orderkey,
       count(event_id) AS n_events,
       {sum2} AS sum_value
FROM orders
LEFT JOIN events
  ON ts >= o_orderdate AND ts < o_orderdate + INTERVAL 1 DAY
WHERE o_orderstatus = 'O'
GROUP BY o_orderkey
""".format(
        sum2=duck_round_he(
            "CAST(coalesce(CAST(sum(CAST(floor(value * CAST(10000.0 AS DOUBLE)"
            " + 0.5) AS BIGINT)) AS BIGINT), 0) AS DOUBLE)"
            " / CAST(10000.0 AS DOUBLE)",
            2,
        )
    ),
    tags=("rangejoin", "events", "join"),
    exported=False,
)
def range_join_order_day_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per open order: how many events (any user) landed in the 24 h
    after the order timestamp — a pure non-equi interval join, executed
    as a bucketed equi-join (1-day grid) instead of the
    BroadcastNestedLoopJoin Spark would otherwise plan."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("win_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).alias("win_end"),
        )
    )
    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    matched = range_join(
        events, orders, "ts", "win_start", "win_end", bucket_seconds=86400
    )
    # LEFT semantics: orders with no event in window keep a zero row.
    counts = matched.groupBy("o_orderkey").agg(
        F.count("event_id").alias("n_events"),
        # Exact integer-grid sum: order-free across tasks and engines.
        qsum_rounded("value", 2).alias("sum_value"),
    )
    return (
        orders.select("o_orderkey")
        .join(counts, "o_orderkey", "left")
        .select(
            "o_orderkey",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


@query(
    "hypertable_rollup",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket_start,
         count(*) AS n_events,
         CAST(sum(CAST(floor(value * CAST({q!r} AS DOUBLE) + 0.5) AS BIGINT))
              AS BIGINT) AS q_value
  FROM events GROUP BY 1
),
daily AS (
  SELECT date_trunc('day', bucket_start) AS bucket_start,
         CAST(sum(n_events) AS BIGINT) AS n_events,
         CAST(sum(q_value) AS BIGINT) AS q_value
  FROM hourly GROUP BY 1
),
monthly AS (
  SELECT date_trunc('month', bucket_start) AS bucket_start,
         CAST(sum(n_events) AS BIGINT) AS n_events,
         CAST(sum(q_value) AS BIGINT) AS q_value
  FROM daily GROUP BY 1
)
SELECT 'hour' AS grain, bucket_start, n_events,
       {sum2} AS sum_value,
       {avg4} AS avg_value
FROM hourly
UNION ALL
SELECT 'day', bucket_start, n_events, {sum2}, {avg4}
FROM daily
UNION ALL
SELECT 'month', bucket_start, n_events, {sum2}, {avg4}
FROM monthly
""".format(
        q=VALUE_Q,
        sum2=duck_round_he(
            f"CAST(q_value AS DOUBLE) / CAST({VALUE_Q!r} AS DOUBLE)", 2
        ),
        avg4=duck_round_he(
            f"CAST(q_value AS DOUBLE) / CAST({VALUE_Q!r} AS DOUBLE) / n_events", 4
        ),
    ),
    tags=("rollup", "events", "timeseries", "headline"),
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity continuous aggregate (hour → day → month):
    raw events are scanned and aggregated once at hour grain; each
    coarser grain folds the next finer rollup (~1/24, ~1/30 of the
    rows), never the raw table. Averages derive from carried
    (sum, count) — avg-of-avg would be wrong under uneven buckets.

    value is aggregated on a 1e-4 integer grid (BIGINT): double sums
    combine in task-completion order, so the same query can differ by
    an ulp between runs — and round-half-even at a cent boundary then
    flips (ADVICE r1: 42.55825). Integer sums are exact and
    order-free, so Spark and DuckDB agree bit-for-bit; headroom is
    ~1e14 rows/bucket before BIGINT overflow (use DECIMAL(38,0)
    aggregation past that)."""
    ev = load_table(spark, sf_dir, "events")
    # Each rollup feeds two consumers (its own output + the next
    # grain); persisted so the raw table is scanned ONCE and each grain
    # folds the cached finer one — without this, every union branch
    # re-aggregates from raw and the "continuous aggregate" claim is a
    # lie in the physical plan. Rollups are bounded (|hours|, |days|).
    hourly = ev.groupBy(
        F.expr("date_trunc('hour', ts) AS bucket_start")
    ).agg(
        F.expr("count(1) AS n_events"),
        F.expr(
            f"CAST(sum(CAST(floor(value * {VALUE_Q!r}D + 0.5D) AS BIGINT))"
            " AS BIGINT) AS q_value"
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    fold = [
        F.expr("CAST(sum(n_events) AS BIGINT) AS n_events"),
        F.expr("CAST(sum(q_value) AS BIGINT) AS q_value"),
    ]
    daily = hourly.groupBy(
        F.expr("date_trunc('day', bucket_start) AS bucket_start")
    ).agg(*fold).persist(StorageLevel.MEMORY_AND_DISK)
    monthly = daily.groupBy(
        F.expr("date_trunc('month', bucket_start) AS bucket_start")
    ).agg(*fold)

    def fmt(df: DataFrame, grain: str) -> DataFrame:
        dollars = f"CAST(q_value AS DOUBLE) / {VALUE_Q!r}D"
        return df.selectExpr(
            f"'{grain}' AS grain",
            "bucket_start",
            "n_events",
            sql_round_he(dollars, 2) + " AS sum_value",
            sql_round_he(f"({dollars}) / n_events", 4) + " AS avg_value",
        )

    return fmt(hourly, "hour").unionAll(fmt(daily, "day")).unionAll(
        fmt(monthly, "month")
    )


def _incr_lab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared batch labeling for the incremental-rollup pair: per event
    the (day, event_type) rollup key, the grid-quantized value, and the
    arrival-batch flag — delta = last 7 event-days OR a deterministic
    10% late-arrival h60 sample (so delta keys collide with base keys).
    The 7-day cutoff is a 1-row scalar broadcast."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    cut = ev.agg(
        F.expr("date_trunc('day', max(ts)) - INTERVAL 7 DAY").alias("cutoff")
    )
    qv = F.floor(F.col("value") * F.lit(VALUE_Q) + F.lit(0.5)).cast("bigint")
    late = (
        F.expr(SPARK_H60.format(x="cast(event_id as string)")) % 10 == 0
    )
    return ev.join(F.broadcast(cut)).select(
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
        qv.alias("qv"),
        ((F.date_trunc("day", "ts") >= F.col("cutoff")) | late).alias(
            "is_delta"
        ),
    )


# Shared batch-labeling CTE for the incremental-rollup pair: day/type
# keys, grid-quantized value, and the arrival-batch flag (last 7
# event-days plus a deterministic 10% late-arrival sample).
_INCR_LAB_SQL = """
WITH cut AS (
  SELECT date_trunc('day', max(ts)) - INTERVAL 7 DAY AS cutoff FROM events
),
lab AS (
  SELECT date_trunc('day', ts) AS day, event_type,
         CAST(floor(value * CAST({q!r} AS DOUBLE) + 0.5) AS BIGINT) AS qv,
         (date_trunc('day', ts) >= cutoff OR ({h60} % 10 = 0)) AS is_delta
  FROM events, cut
)
""".format(
    q=VALUE_Q,
    h60=DUCK_H60.format(x="CAST(event_id AS VARCHAR)"),
)

_INCR_ORACLE = _INCR_LAB_SQL + """
SELECT CAST(day AS TIMESTAMP) AS day, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN is_delta THEN 0 ELSE 1 END) AS BIGINT) AS n_base,
       CAST(sum(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
       {sum2} AS sum_value,
       {avg4} AS avg_value,
       {min2} AS min_value,
       {max2} AS max_value
FROM lab GROUP BY day, event_type
""".format(
    sum2=duck_round_he(
        f"CAST(sum(qv) AS DOUBLE) / CAST({VALUE_Q!r} AS DOUBLE)", 2
    ),
    avg4=duck_round_he(
        f"CAST(sum(qv) AS DOUBLE) / CAST({VALUE_Q!r} AS DOUBLE) / count(*)", 4
    ),
    min2=duck_round_he(
        f"CAST(min(qv) AS DOUBLE) / CAST({VALUE_Q!r} AS DOUBLE)", 2
    ),
    max2=duck_round_he(
        f"CAST(max(qv) AS DOUBLE) / CAST({VALUE_Q!r} AS DOUBLE)", 2
    ),
)


@query(
    "rollup_incremental_merge",
    oracle=_INCR_ORACLE,
    tags=("rollup", "events", "timeseries", "incremental"),
    exported=False,  # driver-visible via facets2.grains_distribution_stats
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental continuous-aggregate maintenance: merge a DELTA
    batch's partial aggregates into a BASE rollup instead of
    recomputing from raw — the pattern that keeps a 100 TB rollup
    refresh proportional to the new data, not the corpus.

    Batch split simulates an arrival-time boundary over event-time
    data: the delta batch is the last 7 event-days PLUS a deterministic
    10% late-arrival sample (h60(event_id) % 10 == 0) drawn from ALL
    days — so delta keys genuinely COLLIDE with base keys and the merge
    must re-aggregate, not merely append. Each batch is reduced to
    per-(day, event_type) partials carrying the mergeable state
    (count, grid-sum, grid-min, grid-max); the merge is a union +
    re-aggregation over rollup-sized inputs (sum/sum/min/max are
    associative-commutative semilattice folds; avg derives from the
    merged sum/count, never avg-of-avg). n_base/n_delta are carried
    through the merge so the output proves both sides contributed to
    every collided key.

    The DuckDB oracle computes the SAME output by FULL RECOMPUTE from
    raw — a hash match IS the incremental-equals-recompute identity,
    end-to-end. At 100 TB the base partials come from the stored
    rollup (no raw scan) and the delta scan is pruned to the arrival
    partition; here both derive from the same raw table so the query
    is self-contained (two pushed-filter scans at test scale). The
    7-day cutoff is a 1-row scalar broadcast (never a driver round
    trip). Absent from the reference (SURVEY §2.3 — no incremental
    state at all; every reference job recomputes its full input)."""
    lab = _incr_lab(spark, sf_dir)

    def partials(df: DataFrame, is_delta: bool) -> DataFrame:
        agg = df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qv").cast("bigint").alias("q"),
            F.min("qv").alias("mn"),
            F.max("qv").alias("mx"),
        )
        n_base = F.lit(0).cast("bigint") if is_delta else F.col("n")
        n_delta = F.col("n") if is_delta else F.lit(0).cast("bigint")
        return agg.select(
            "day", "event_type", "n", "q", "mn", "mx",
            n_base.alias("n_base"), n_delta.alias("n_delta"),
        )

    base = partials(lab.filter(~F.col("is_delta")), is_delta=False)
    delta = partials(lab.filter(F.col("is_delta")), is_delta=True)
    merged = base.unionAll(delta).groupBy("day", "event_type").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.sum("n_base").cast("bigint").alias("n_base"),
        F.sum("n_delta").cast("bigint").alias("n_delta"),
        F.sum("q").cast("bigint").alias("q"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    dollars = F.col("q").cast("double") / F.lit(VALUE_Q)
    return merged.select(
        "day",
        "event_type",
        "n_events",
        "n_base",
        "n_delta",
        round_he(dollars, 2).alias("sum_value"),
        round_he(dollars / F.col("n_events"), 4).alias("avg_value"),
        round_he(F.col("mn").cast("double") / F.lit(VALUE_Q), 2).alias(
            "min_value"
        ),
        round_he(F.col("mx").cast("double") / F.lit(VALUE_Q), 2).alias(
            "max_value"
        ),
    )


_UPSERT_ORACLE = _INCR_LAB_SQL + """
, base AS (
  SELECT day, event_type, CAST(count(*) AS BIGINT) AS n_old,
         CAST(sum(qv) AS BIGINT) AS q_old
  FROM lab WHERE NOT is_delta GROUP BY day, event_type
),
delta AS (
  SELECT day, event_type, CAST(count(*) AS BIGINT) AS n_added,
         CAST(sum(qv) AS BIGINT) AS q_add
  FROM lab WHERE is_delta GROUP BY day, event_type
)
SELECT CAST(d.day AS TIMESTAMP) AS day, d.event_type,
       CAST(coalesce(b.n_old, 0) AS BIGINT) AS n_old,
       d.n_added,
       CAST(coalesce(b.n_old, 0) + d.n_added AS BIGINT) AS n_new,
       {sum_old} AS sum_old,
       {sum_new} AS sum_new,
       {avg_new} AS avg_new
FROM delta d LEFT JOIN base b
  ON d.day = b.day AND d.event_type = b.event_type
""".format(
    sum_old=duck_round_he(
        f"CAST(b.q_old AS DOUBLE) / CAST({VALUE_Q!r} AS DOUBLE)", 2
    ),
    sum_new=duck_round_he(
        f"CAST(coalesce(b.q_old, 0) + d.q_add AS DOUBLE)"
        f" / CAST({VALUE_Q!r} AS DOUBLE)",
        2,
    ),
    avg_new=duck_round_he(
        f"CAST(coalesce(b.q_old, 0) + d.q_add AS DOUBLE)"
        f" / CAST({VALUE_Q!r} AS DOUBLE)"
        f" / (coalesce(b.n_old, 0) + d.n_added)",
        4,
    ),
)


@query(
    "rollup_upsert_cells",
    oracle=_UPSERT_ORACLE,
    tags=("rollup", "events", "timeseries", "incremental", "upsert"),
    exported=False,  # driver-visible via facets2.grains_distribution_stats
)
def rollup_upsert_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write-back half of incremental rollup maintenance: the
    MINIMAL upsert changeset — only cells the delta batch touched,
    each with its before (base-only) and after (merged) values. This
    is what a MERGE INTO against the stored rollup would apply: at
    100 TB you rewrite the changed cells (or the partitions holding
    them), never the whole rollup — `rollup_incremental_merge` proves
    the merged VALUES equal a full recompute; this operator proves
    the WRITE SET is correctly scoped and carries the right
    before/after pair.

    Shape: delta partials LEFT-join base partials on the rollup key —
    both sides are rollup-sized (days × event types), so the join is
    tiny relative to the raw scans that produce it, and brand-new
    cells (no base row) surface with n_old = 0 / sum_old = NULL
    rather than being silently dropped (an inner join here would
    lose exactly the cells an append-only refresh creates). The
    DuckDB oracle replays the same split + join from raw; the hash
    pins both the scoping (no untouched cell leaks into the
    changeset) and the merged values per cell."""
    lab = _incr_lab(spark, sf_dir)
    base = (
        lab.filter(~F.col("is_delta"))
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_old"),
            F.sum("qv").cast("bigint").alias("q_old"),
        )
    )
    delta = (
        lab.filter(F.col("is_delta"))
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_added"),
            F.sum("qv").cast("bigint").alias("q_add"),
        )
    )
    joined = delta.join(base, ["day", "event_type"], "left")
    n_old = F.coalesce(F.col("n_old"), F.lit(0)).cast("bigint")
    q_new = (F.coalesce(F.col("q_old"), F.lit(0)) + F.col("q_add")).cast(
        "bigint"
    )
    n_new = (n_old + F.col("n_added")).cast("bigint")
    return joined.select(
        "day",
        "event_type",
        n_old.alias("n_old"),
        F.col("n_added").cast("bigint").alias("n_added"),
        n_new.alias("n_new"),
        round_he(F.col("q_old").cast("double") / F.lit(VALUE_Q), 2).alias(
            "sum_old"
        ),
        round_he(q_new.cast("double") / F.lit(VALUE_Q), 2).alias("sum_new"),
        round_he(
            q_new.cast("double") / F.lit(VALUE_Q) / n_new, 4
        ).alias("avg_new"),
    )
