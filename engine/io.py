"""Table IO: load the synthetic TPC-H-ish parquet fixtures.

Reference analog: the reference's only source is a directory of text
files listed in sorted order (``manager/__main__.py:193``); our engine
generalizes to parquet columnar scans with predicate pushdown and
column pruning (free via Catalyst), plus the text source used by the
Layer-A MapReduce runner (``engine.mapreduce``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcast-join these against facts.
# At 100 TB the facts (lineitem/orders/events/documents) are the only
# tables that grow past broadcast size.
SMALL_DIMS = ("region", "nation", "supplier", "part", "customer")

# Default fixture dir for ad-hoc use; the CLI (engine/__main__.py)
# honors the same SPARK_GRAFT_SF_DIR env var.
DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def pin_fixture_ts_confs(spark: SparkSession) -> None:
    """Pin the runtime confs every fixture read depends on. The caller
    may hand us a session built without engine.session's configs (the
    driver does); these are load-bearing for correctness and are
    runtime-settable. Fixture timestamps are naive
    (isAdjustedToUTC=false); read them as session-tz TIMESTAMP (= UTC
    wall clock, matching the DuckDB oracle's naive semantics) rather
    than TIMESTAMP_NTZ, which chrono functions like unix_micros
    reject."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def normalize_fixture_ts(df: DataFrame) -> DataFrame:
    """Normalize per-vintage timestamp encodings to session-tz
    TIMESTAMP — the ONE place both batch (load_table) and streaming
    (engine.streaming.events.read_event_stream) get the logic, so a
    new fixture vintage can't make them read the same file
    differently."""
    if dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (see engine.session); convert to
        # microsecond timestamp with integer division — `ts/1000` in
        # doubles would lose precision at ~1.7e18 ns epochs.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Belt-and-braces for sessions where the NTZ-inference conf is
    # ignored: same wall-clock values under the UTC session timezone.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# Lazy-scan plan memo, keyed weakly by session then by (dir, table).
# This caches the unexecuted DataFrame OBJECT (a logical plan), never
# data: every action on it still scans the parquet files. The point is
# driver-side latency — building the scan costs ~10 Python↔JVM round
# trips (read.parquet, dtypes, the ts normalization) at ~1-3 ms each on
# the bench sandbox (measured round 11, tools/count_py4j.py), and a
# federated query re-loads the same table per facet (q7_q8_q9 builds
# 12 scans of 5 tables; the bench repeats that 5×). A WeakKeyDictionary
# keeps a stopped/replaced session's entries collectable; a fresh
# session wrapper simply re-misses.
import weakref

_SCAN_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def invalidate_scan_memo(
    spark: SparkSession, sf_dir: str | None = None
) -> None:
    """Drop memoized scan plans for ``sf_dir`` (or all dirs) in this
    session. The memo caches the *plan* (never data), but the plan pins
    the file listing taken at first load: parquet files added to a
    table dir later in the same session would otherwise stay invisible.
    Call this after mutating a fixture dir in-place. (The driver's
    testdata is immutable, so nothing on the query path needs it.)"""
    per_session = _SCAN_MEMO.get(spark)
    if not per_session:
        return
    if sf_dir is None:
        per_session.clear()
    else:
        for key in [k for k in per_session if k[0] == sf_dir]:
            del per_session[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Memoized lazy scan. NOTE: the memoized plan pins the file
    listing from first load — see ``invalidate_scan_memo`` if the dir
    can change within a session."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    per_session = _SCAN_MEMO.setdefault(spark, {})
    df = per_session.get((sf_dir, name))
    if df is None:
        pin_fixture_ts_confs(spark)
        df = normalize_fixture_ts(
            spark.read.parquet(table_path(sf_dir, name))
        )
        per_session[(sf_dir, name)] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API) and return them."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
