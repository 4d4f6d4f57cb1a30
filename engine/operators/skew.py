"""Skew mitigation: salted joins and two-phase aggregation.

At 100 TB a handful of hot keys (the empty-string token, a viral
user_id, a default partkey) can put >90% of a shuffle partition's rows
on one reducer. Two standard mitigations, both expressible as plain
DataFrame transforms:

- **Salted join** (for joining a skewed fact to a dimension): append a
  random-ish salt in [0, S) to the fact's key; replicate each dim row S
  times, one per salt value; equi-join on (key, salt). Hot keys spread
  over S reducers at the cost of S× the (small) dim side. AQE's
  skew-join split handles moderate skew automatically; salting is the
  explicit fix when one key alone exceeds an executor.

- **Two-phase aggregation** (for skewed groupBy): aggregate on
  (key, salt) first — the partial results are at most S rows per key —
  then re-aggregate on key. Spark's map-side partial aggregation
  already does this implicitly for algebraic aggregates; the explicit
  form matters for aggregates without partial pushdown (collect_list,
  exact distinct via sets).

The salt is deterministic (hash of a row-unique column, not rand()) so
results are reproducible and retried tasks emit identical rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(
    df: DataFrame, n_salts: int, salt_source: str | Column | None
) -> Column:
    """Deterministic per-row salt in [0, n_salts)."""
    if salt_source is None:
        src = F.xxhash64(*[F.col(c) for c in df.columns])
    elif isinstance(salt_source, Column):
        src = F.xxhash64(salt_source)
    else:
        src = F.xxhash64(F.col(salt_source))
    return F.pmod(src, F.lit(n_salts)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to (small) ``dim`` on ``key`` with S-way salting.

    ``salt_source``: the column the fact-side salt is derived from. It
    must VARY WITHIN a key (a row-unique id is ideal) — salting by the
    key itself would put every hot-key row back in one bucket. Defaults
    to a hash of ALL fact columns: deterministic under task retries
    (unlike ``rand()`` / ``monotonically_increasing_id``), and only
    fully-duplicate rows share a salt.

    ``how`` is restricted to fact-side-preserving joins: a right/full
    outer would return every unmatched dim row once PER SALT REPLICA
    (the explode below replicates dim n_salts×, and nothing collapses
    unmatched replicas).
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the dim side is"
            " replicated per salt, so right/full outer joins would emit"
            " each unmatched dim row n_salts times"
        )
    salt_col = _salt(fact, n_salts, salt_source)
    f = fact.withColumn("__salt", salt_col)
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, [key, "__salt"], how).drop("__salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation on a skewed ``key``.

    ``aggs`` maps output column → (input column, agg), where agg is one
    of ``sum`` / ``count`` / ``min`` / ``max`` — the algebraic
    aggregates that re-combine losslessly (count re-combines as sum).
    Salt defaults to a hash of all columns (varies within a key).
    """
    salt_col = _salt(df, n_salts, salt_source)
    phase1_exprs = []
    phase2_exprs = []
    for out, (col, agg) in aggs.items():
        if agg == "count":
            phase1_exprs.append(F.count(col).alias(out))
            phase2_exprs.append(F.sum(out).alias(out))
        elif agg in ("sum", "min", "max"):
            phase1_exprs.append(getattr(F, agg)(col).alias(out))
            phase2_exprs.append(getattr(F, agg)(out).alias(out))
        else:
            raise ValueError(f"non-algebraic agg {agg!r} cannot be salted")
    partial = df.withColumn("__salt", salt_col).groupBy(key, "__salt").agg(
        *phase1_exprs
    )
    return partial.groupBy(key).agg(*phase2_exprs)


# -- registry query ---------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from engine.io import load_table  # noqa: E402
from engine.registry import query  # noqa: E402

EVENT_WEIGHTS = [
    ("view", 1),
    ("click", 2),
    ("purchase", 10),
    ("signup", 5),
    ("error", 0),
]
_SALTS = 8


@query(
    "skew_salted_events",
    oracle="""
WITH w(event_type, weight) AS (VALUES
  ('view', 1), ('click', 2), ('purchase', 10), ('signup', 5), ('error', 0)
)
SELECT e.event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT) * weight) AS BIGINT)
         AS weighted_cents
FROM events e JOIN w USING (event_type)
GROUP BY e.event_type
""",
    tags=("skew", "join", "events"),
)
def skew_salted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately worst-case skewed join + aggregation through the
    salting machinery: events' join key (event_type) has only 5
    distinct values, so an unsalted shuffle join would put ~20% of the
    fact table on single reducers. `salted_join` spreads each hot key
    over 8 salt buckets (the dim side replicates 8×, visible as the
    explode in the plan); `salted_agg` then two-phase-aggregates on
    (key, salt) before re-combining per key.

    Values are aggregated as integer cents × integer weights, so the
    two-phase sum is order-independent and bit-equal to the oracle's
    single-phase sum (double sums would re-associate differently)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        (
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("cents"),
    )
    dim = ev.sparkSession.createDataFrame(
        EVENT_WEIGHTS, "event_type string, weight int"
    )
    joined = salted_join(
        ev, dim, "event_type", n_salts=_SALTS, salt_source="event_id"
    ).withColumn("wcents", F.col("cents") * F.col("weight"))
    return salted_agg(
        joined,
        "event_type",
        {
            # count over the never-NULL key, not wcents: the oracle is
            # count(*), and F.count(col) skips NULLs — a NULL-valued
            # event would silently put the two engines off by one.
            "n_events": ("event_id", "count"),
            "weighted_cents": ("wcents", "sum"),
        },
        n_salts=_SALTS,
        salt_source="event_id",
    )


# -- shuffle-skew diagnostic profiler ---------------------------------------
#
# The complement of the salting machinery above: before deciding to
# salt (or to raise spark.sql.adaptive skew thresholds), a 100 TB
# operator wants MEASUREMENTS — how concentrated is this join key, and
# how unbalanced would a hash shuffle over it actually be?  The profile
# costs one map-side-combined key-count shuffle per (table, key) — the
# same key movement as the aggregation being diagnosed, but carrying
# only (key, count) pairs — then a P-row reduction; output is O(1) per
# facet.  At full corpus scale you would point it at a hash-predicate
# sample of the fact table (the estimates are ratios, so sampling
# commutes); the plan shape is identical.
#
# The simulated reducer id uses the engine-portable md5-derived h60
# hash, NOT Spark's internal Murmur3, so the oracle reproduces the
# exact partition loads: the point is the MEASUREMENT contract (same
# skew verdict from both engines), and any uniform hash family gives
# the same imbalance statistics for a given key distribution.

from engine.functions.hashing import DUCK_H60, SPARK_H60  # noqa: E402

SKEW_PROFILE_PARTS = 32
# (table, key column) pairs profiled: the engine's own join/agg keys,
# spanning near-uniform (l_partkey, o_custkey, user_id) and
# pathologically concentrated (event_type: 5 values; source: 4).
SKEW_PROFILE_KEYS = (
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
    ("events", "event_type"),
    ("events", "user_id"),
    ("documents", "source"),
)


def _skew_facet_oracle(table: str, col: str) -> str:
    p = SKEW_PROFILE_PARTS
    h = DUCK_H60.format(x="k")
    return f"""
SELECT '{table}.{col}' AS facet, n_rows, n_keys, top1_cnt, maxpart_load,
       parts_used,
       CAST((20000 * top1_cnt + n_rows) // (2 * n_rows) AS BIGINT)
         AS top1_bp,
       CAST((20000 * maxpart_load * {p} + n_rows) // (2 * n_rows)
            AS BIGINT) AS imb_bp
FROM (
  SELECT CAST(sum(load) AS BIGINT) AS n_rows,
         CAST(sum(nk) AS BIGINT) AS n_keys,
         CAST(max(mx) AS BIGINT) AS top1_cnt,
         CAST(max(load) AS BIGINT) AS maxpart_load,
         CAST(count(*) AS BIGINT) AS parts_used
  FROM (
    SELECT {h} % {p} AS part,
           CAST(sum(cnt) AS BIGINT) AS load,
           count(*) AS nk,
           max(cnt) AS mx
    FROM (
      SELECT COALESCE(CAST({col} AS VARCHAR), '') AS k, count(*) AS cnt
      FROM {table} GROUP BY 1
    ) kc
    GROUP BY 1
  ) pl
) s
"""


@query(
    "shuffle_skew_profile",
    oracle="\nUNION ALL\n".join(
        _skew_facet_oracle(t, c) for t, c in SKEW_PROFILE_KEYS
    ),
    tags=("skew", "audit", "diagnostics"),
    exported=False,  # driver-visible via facets2.eval_quality_audit
)
def shuffle_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics, one row per profiled (table, key):
    total rows, distinct keys, hottest-key count, the heaviest
    simulated reducer's load at {P} hash partitions, partitions
    actually hit, and two basis-point ratios — `top1_bp` (hottest key's
    row share) and `imb_bp` (max-partition load vs the perfect-balance
    ideal: 10000 = balanced, {P}x10000 = everything on one reducer).
    Integer-DIV basis points on a BIGINT grid; no float reaches the
    output.  See the section comment for the scale contract."""
    p = SKEW_PROFILE_PARTS
    out = None
    for table, col in SKEW_PROFILE_KEYS:
        rows = load_table(spark, sf_dir, table).select(
            F.coalesce(F.col(col).cast("string"), F.lit("")).alias("k")
        )
        kc = rows.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
        pl = (
            kc.select(
                "cnt",
                F.expr(f"({SPARK_H60.format(x='k')}) % {p}").alias("part"),
            )
            .groupBy("part")
            .agg(
                F.sum("cnt").alias("load"),
                F.count(F.lit(1)).alias("nk"),
                F.max("cnt").alias("mx"),
            )
        )
        st = pl.agg(
            F.sum("load").cast("bigint").alias("n_rows"),
            F.sum("nk").cast("bigint").alias("n_keys"),
            F.max("mx").cast("bigint").alias("top1_cnt"),
            F.max("load").cast("bigint").alias("maxpart_load"),
            F.count(F.lit(1)).cast("bigint").alias("parts_used"),
        ).select(
            F.lit(f"{table}.{col}").alias("facet"),
            "n_rows",
            "n_keys",
            "top1_cnt",
            "maxpart_load",
            "parts_used",
            F.expr("(20000 * top1_cnt + n_rows) DIV (2 * n_rows)")
            .cast("bigint")
            .alias("top1_bp"),
            F.expr(
                f"(20000 * maxpart_load * {p} + n_rows) DIV (2 * n_rows)"
            )
            .cast("bigint")
            .alias("imb_bp"),
        )
        out = st if out is None else out.unionAll(st)
    return out
