"""Approximate aggregates — the sketches that replace exact operators
when exactness stops being worth the shuffle at 100 TB.

- ``approx_count_distinct`` (HyperLogLog++): fixed-size mergeable
  sketch per partition; an exact COUNT(DISTINCT) must shuffle every
  distinct value. Standard error = rsd (0.05 default).
- ``percentile_approx`` (Greenwald-Khanna-style quantile sketch):
  mergeable, size bounded by the accuracy parameter; exact percentiles
  need a global sort.

Cross-engine oracling: Spark's and DuckDB's sketches are different
algorithms, so raw sketch outputs can never hash-match.  The registry
query is therefore SELF-VALIDATING: Spark computes both the sketch and
its exact twin in one grouped pass and emits ``(group, exact value,
within-bound flag)``; the oracle recomputes the exact value and emits a
literal TRUE.  The flags only hash-match if the sketch actually landed
inside its published error bound — the sketch still does the work, and
a broken sketch turns the driver row red.  ``tests/test_approx.py``
additionally pins the raw sketch values against exact twins.

The exact twins are affordable here because both are computed in the
same single groupBy pass over a handful of groups; at 100 TB you would
drop the audit columns and ship the sketch alone — the flags are the
validation harness, not the production output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.io import load_table
from engine.registry import query

PCTS = [0.5, 0.95, 0.99]
PCT_ACCURACY = 10000
PCT_RANK_BAND = 0.01  # sketch value must land between exact p±band quantiles
HLL_RSD = 0.05
HLL_BAND = 3 * HLL_RSD  # 3 standard errors


@query(
    "approx_sketches",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS hll_within_band,
       TRUE AS p50_within_band,
       TRUE AS p95_within_band,
       TRUE AS p99_within_band
FROM events
GROUP BY event_type
""",
    tags=("approx", "sketch", "events"),
)
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-count and quantile-sketch percentiles per event
    type, self-validated against exact twins computed in the same
    grouped pass.

    Emitted flags: HLL estimate within 3 standard errors (3*rsd = 15%)
    of the exact distinct count; each sketch percentile between the
    exact p-1% and p+1% quantiles (the sketch's rank-error guarantee at
    accuracy=10000 is 1e-4, so the band is generous by design — a flag
    flip means the sketch is broken, not unlucky)."""
    ev = load_table(spark, sf_dir, "events")
    lo = [max(p - PCT_RANK_BAND, 0.0) for p in PCTS]
    hi = [min(p + PCT_RANK_BAND, 1.0) for p in PCTS]
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", HLL_RSD).alias("hll_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.percentile_approx("value", PCTS, PCT_ACCURACY).alias("sk"),
        F.expr(
            "percentile(value, array({}))".format(",".join(map(str, lo)))
        ).alias("exlo"),
        F.expr(
            "percentile(value, array({}))".format(",".join(map(str, hi)))
        ).alias("exhi"),
    )
    hll_ok = (
        F.abs(F.col("hll_users") - F.col("exact_users"))
        <= F.col("exact_users") * HLL_BAND
    )

    def pct_ok(i: int):
        return (F.col("sk")[i] >= F.col("exlo")[i]) & (
            F.col("sk")[i] <= F.col("exhi")[i]
        )

    return agg.select(
        "event_type",
        "exact_users",
        hll_ok.alias("hll_within_band"),
        pct_ok(0).alias("p50_within_band"),
        pct_ok(1).alias("p95_within_band"),
        pct_ok(2).alias("p99_within_band"),
    )


# Library forms (non-registry): the raw sketch outputs, pinned against
# exact twins with error bounds in tests/test_approx.py.


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
