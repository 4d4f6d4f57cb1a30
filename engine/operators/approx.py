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


CM_DEPTH = 4  # independent hash rows
CM_WIDTH = 1024  # buckets per row; error bound e/width * N
CM_TOPK = 20


@query(
    "approx_heavy_hitters",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
),
tc AS (SELECT token, count(*) AS c FROM toks GROUP BY 1)
SELECT token, CAST(c AS BIGINT) AS exact_cnt,
       TRUE AS cm_no_underestimate, TRUE AS cm_within_eps
FROM tc ORDER BY c DESC, token LIMIT {CM_TOPK}
""",
    tags=("approx", "sketch", "text"),
    exported=False,
)
def approx_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the token stream,
    self-validated like `approx_sketches`: the sketch is built as
    CM_DEPTH grouped counts over hashed buckets (pure DataFrame ops —
    the 100 TB shape is one shuffle of (row, bucket) pairs, sketch size
    CM_DEPTH x CM_WIDTH regardless of corpus size), then probed for the
    exact top-{CM_TOPK} tokens. Flags assert the two count-min
    guarantees: estimates never underestimate, and overestimate by at
    most (e/width)*N. The oracle recomputes the exact counts and
    literal-TRUE flags — a broken sketch turns the driver row red."""
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    tc = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Sketch build: one explode to (hash_row, bucket) then one grouped
    # count — at scale this is the only full pass, and its output is
    # CM_DEPTH x CM_WIDTH rows. Built from the token *counts* (sum of
    # colliding tokens' counts == count of colliding occurrences).
    buckets = F.expr(
        f"transform(sequence(0, {CM_DEPTH - 1}), i -> struct(i AS i,"
        f" pmod(xxhash64(concat(cast(i AS string), '|', token)),"
        f" {CM_WIDTH}) AS b))"
    )
    cm = (
        tc.select(F.col("exact_cnt").alias("c"), F.explode(buckets).alias("g"))
        .groupBy(F.col("g.i").alias("i"), F.col("g.b").alias("b"))
        .agg(F.sum("c").alias("bucket_cnt"))
    )
    n_total = tc.agg(F.sum("exact_cnt").alias("n"))
    top = (
        tc.orderBy(F.col("exact_cnt").desc(), "token")
        .limit(CM_TOPK)
        .select("token", "exact_cnt", F.explode(buckets).alias("g"))
    )
    est = (
        top.join(
            F.broadcast(cm),
            (F.col("g.i") == F.col("i")) & (F.col("g.b") == F.col("b")),
        )
        .groupBy("token", "exact_cnt")
        .agg(F.min("bucket_cnt").alias("cm_est"))
    )
    eps = 2.718281828 / CM_WIDTH
    return (
        est.join(F.broadcast(n_total))
        .select(
            "token",
            F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
            (F.col("cm_est") >= F.col("exact_cnt")).alias("cm_no_underestimate"),
            (F.col("cm_est") - F.col("exact_cnt") <= F.lit(eps) * F.col("n")).alias(
                "cm_within_eps"
            ),
        )
    )
