"""Approximate aggregates — the sketches that replace exact operators
when exactness stops being worth the shuffle at 100 TB.

- ``approx_count_distinct`` (HyperLogLog++): fixed-size mergeable
  sketch per partition; an exact COUNT(DISTINCT) must shuffle every
  distinct value. ~2% default relative error.
- ``percentile_approx`` (KLL-style quantile sketch): mergeable, size
  bounded by accuracy parameter; exact percentiles need a global sort.

No DuckDB oracle (its HLL/quantile sketches differ from Spark's, so
results can't hash-match) — the driver records a rows-only check, and
``tests/test_approx.py`` pins each against its exact twin with an
error bound, which is the real contract of an approximate operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.io import load_table
from engine.registry import query

PCTS = [0.5, 0.95, 0.99]
PCT_ACCURACY = 10000


@query("approx_distinct_users_by_type", tags=("approx", "sketch", "events"))
def approx_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via HLL++ — the scale form of
    COUNT(DISTINCT): per-partition sketches merge in O(sketch) instead
    of shuffling every (type, user) pair."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
        .orderBy("event_type")
    )


@query("approx_value_percentiles", tags=("approx", "sketch", "events"))
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P50/P95/P99 of purchase value per event type via the mergeable
    quantile sketch (no global sort)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", PCTS, PCT_ACCURACY
            ).alias("pcts")
        )
        .select(
            "event_type",
            F.col("pcts")[0].alias("p50"),
            F.col("pcts")[1].alias("p95"),
            F.col("pcts")[2].alias("p99"),
        )
        .orderBy("event_type")
    )
