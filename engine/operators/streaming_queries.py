"""Registry entries for the Structured Streaming layer: each runs a
bounded availableNow pass over the events file stream and returns the
materialized result, so the DuckDB oracle can hash-check STREAMING
semantics (window/session assignment, dedup, stream-static join) —
stronger than the rows-only check non-SQL ops get.

The reference has no streaming constructs at all (SURVEY.md §2.3);
this is new Layer-B capability. Scale notes live on the underlying
operators in engine/streaming/events.py (watermark-bounded state,
zero-state broadcast enrichment); the availableNow harness here is the
test/driver entry point — production swaps in a continuous trigger and
a real sink, same plan.

Boundary semantics pinned by the oracles:
- tumbling windows are UTC epoch-aligned days (`date_trunc('day')`);
- `session_window` starts a NEW session when the gap is >= the 30-min
  timeout (merge requires next_start < session_end), which differs
  from the batch sessionizer `w_sessionize_events` (gap > timeout);
  the session oracle below uses >= accordingly.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.functions.rounding import duck_qsum_rounded
from engine.io import load_table
from engine.registry import query
from engine.streaming.events import (
    read_event_stream,
    run_available_now,
    streaming_dedup,
    streaming_enriched_purchases,
    streaming_session_windows,
    streaming_tumbling_counts,
)

# memory-sink query names must be unique within a SparkSession
_seq = itertools.count()


def _sink(name: str) -> str:
    return f"{name}_{next(_seq)}"


@query(
    "streaming_tumbling_daily",
    oracle="""
SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
       event_type,
       count(*) AS n_events,
       {sum2} AS total_value
FROM events GROUP BY 1, 2
""".format(sum2=duck_qsum_rounded("value", 2)),
    tags=("streaming", "window", "events"),
    exported=False,
)
def streaming_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling daily counts, executed as a bounded
    availableNow stream; on bounded input the final complete-mode
    result equals the batch GROUP BY, which is what the oracle pins."""
    ev = read_event_stream(spark, sf_dir)
    return run_available_now(
        streaming_tumbling_counts(ev),
        _sink("t_daily"),
        output_mode="complete",
    )


@query(
    "streaming_session_bounds",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(CAST(ts AS TIMESTAMP))
                      - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                      >= 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM ordered
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM sess GROUP BY user_id, session_seq
""",
    tags=("streaming", "sessionize", "events"),
)
def streaming_session_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native `session_window` sessions (30-min gap) as a bounded
    stream; the oracle re-derives Spark's merge rule in SQL
    (new session iff gap >= timeout; end = last event + timeout)."""
    ev = read_event_stream(spark, sf_dir)
    return run_available_now(
        streaming_session_windows(ev),
        _sink("t_sessions"),
        output_mode="complete",
    )


@query(
    "streaming_dedup_counts",
    oracle="""
SELECT event_type, count(DISTINCT event_id) AS n_unique
FROM events GROUP BY event_type
""",
    tags=("streaming", "dedup", "events"),
    exported=False,
)
def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming dedup on event_id, then a per-type
    count — equals DISTINCT counting on bounded input."""
    ev = read_event_stream(spark, sf_dir)
    deduped = streaming_dedup(ev)
    counts = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique")
    )
    return run_available_now(
        counts, _sink("t_dedup"), output_mode="complete"
    )


@query(
    "streaming_enriched_purchase_rows",
    oracle="""
SELECT e.event_id, e.user_id, n.n_name, e.value
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE e.event_type = 'purchase'
""",
    tags=("streaming", "join", "events"),
    exported=False,  # driver-visible via facets2.streaming_enriched_windows
)
def streaming_enriched_purchase_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast dimension enrichment (zero stream
    state): purchases joined per micro-batch to the static
    customer→nation dims."""
    ev = read_event_stream(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return run_available_now(
        streaming_enriched_purchases(ev, customer, nation),
        _sink("t_enriched"),
    )


@query(
    "streaming_windowed_counts",
    oracle="""
SELECT 'tumbling' AS facet,
       CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
       event_type,
       count(*) AS n,
       {sum2} AS x
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'dedup', CAST(NULL AS TIMESTAMP), event_type,
       count(DISTINCT event_id), CAST(NULL AS DOUBLE)
FROM events GROUP BY event_type
""".format(sum2=duck_qsum_rounded("value", 2)),
    tags=("streaming", "window", "dedup", "events"),
    exported=False,  # driver-visible via facets2.streaming_enriched_windows
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful-aggregation surface, two facets, each a
    bounded availableNow run whose final complete-mode result the
    oracle pins against batch SQL: `tumbling` (watermarked tumbling
    daily counts + value sums per event type) and `dedup`
    (watermark-bounded dropDuplicates on event_id, then per-type
    unique counts)."""
    tumb = streaming_tumbling_daily(spark, sf_dir).select(
        F.lit("tumbling").alias("facet"),
        "day",
        "event_type",
        F.col("n_events").alias("n"),
        F.col("total_value").alias("x"),
    )
    ded = streaming_dedup_counts(spark, sf_dir).select(
        F.lit("dedup").alias("facet"),
        F.lit(None).cast("timestamp").alias("day"),
        "event_type",
        F.col("n_unique").alias("n"),
        F.lit(None).cast("double").alias("x"),
    )
    return tumb.unionAll(ded)


@query(
    "streaming_view_purchase_pairs",
    oracle="""
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       CAST(v.ts AS TIMESTAMP) AS view_ts,
       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
       p.value AS purchase_value
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND p.ts > v.ts
 AND p.ts <= v.ts + INTERVAL 1 HOUR
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
""",
    tags=("streaming", "join", "stream-stream", "events"),
    exported=False,
)
def streaming_view_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join, hash-checked against batch SQL (round
    5 — previously pytest-rows-only): each purchase matched to the
    same user's views in the preceding hour, both sides watermarked
    with a time-range join condition so state on either side is
    dropped once the watermark passes view_ts + horizon — the bounded-
    state requirement for an unbounded stream. purchase_value is a
    raw fixture column (byte-identical in both engines); timestamps
    are event times both engines read from the same parquet."""
    from engine.streaming.events import streaming_view_purchase_join

    ev = read_event_stream(spark, sf_dir)
    return run_available_now(
        streaming_view_purchase_join(ev), _sink("t_vp_pairs")
    )
