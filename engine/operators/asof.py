"""As-of (temporal) join: for each left row, the most recent right row
at-or-before it, per key.

Spark has no native ASOF JOIN (DuckDB does); the scalable construction
is union-the-streams + one window over (key, time) — a single shuffle
on the key, no range explosion, no driver-side loop. That is what
``asof_join`` implements and what the oracle SQL mirrors (we pin the
window semantics rather than DuckDB's ASOF syntax so tie-handling is
explicit: ties on ts resolve by event order, strictly-prior rows only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from engine.io import load_table
from engine.registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    strict: bool = True,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Generic as-of join via union + window.

    Returns ``left`` columns plus, for each requested right value
    column, the value from the latest right row with
    ``right_ts < left_ts`` (or ``<=`` when strict=False), per ``key``.

    Determinism contract: right rows with a NULL timestamp are dropped
    (a row with no time can never be "the most recent prior" — without
    the filter they sort NULLS FIRST into every frame and fabricate
    matches), and right rows SHARING a timestamp are ordered by
    ``tiebreak_cols`` (default: the value columns, ascending), so the
    carried value is reproducible across task orders and retries
    instead of whichever duplicate a partition happened to emit last.

    Scale: one shuffle on ``key``; window state is O(1) per row
    (last_value carry-forward), so it survives arbitrarily long
    histories — unlike a range join, which explodes on wide gaps.
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r = (
        right.filter(F.col(right_ts).isNotNull())
        .withColumn("_side", F.lit(0))
        .withColumn("_ts", F.col(right_ts))
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    for c in right_value_cols:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None))
    cols = lcols + ["_side", "_ts"] + [c for c in right_value_cols if c not in lcols]
    u = l.select(*cols).unionByName(r.select(*cols))
    # Order: time, then LEFT-before-right on ties iff strict (so a
    # strictly-prior-only join never sees a same-timestamp right row
    # in its UNBOUNDED..-1 frame), then the deterministic right-row
    # tiebreak (left rows carry NULLs there, which cannot reorder
    # them relative to right rows because _side sorts first).
    side = F.col("_side") if not strict else (1 - F.col("_side"))
    ties = [F.col(c) for c in (tiebreak_cols or sorted(right_value_cols))]
    order = [F.col("_ts"), side, *ties]
    w = (
        W.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1 if strict else 0)
    )
    out = u
    for c in right_value_cols:
        out = out.withColumn(
            f"asof_{c}",
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    return out.filter(F.col("_side") == 1).select(
        *lcols, *[f"asof_{c}" for c in right_value_cols]
    )


@query(
    "asof_purchase_prior_view",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events WHERE event_type IN ('purchase', 'view')
), enriched AS (
  SELECT user_id, event_id, ts, event_type,
         max(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_ts
  FROM tagged
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, prev_view_ts,
       CAST(floor(epoch(ts)) - floor(epoch(prev_view_ts)) AS BIGINT) AS gap_s
FROM enriched WHERE event_type = 'purchase'
""",
    tags=("asof", "events"),
    exported=False,
)
def asof_purchase_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the most recent strictly-prior view by the
    same user, and the gap in seconds (NULL when no prior view)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    prev_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("prev_view_ts", prev_view)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "prev_view_ts",
            (F.unix_seconds("ts") - F.unix_seconds("prev_view_ts")).alias("gap_s"),
        )
    )
