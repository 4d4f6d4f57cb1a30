"""Sinks: partitioned parquet, text (reference F10 lives in
engine.mapreduce.runner), and bucketed tables for co-located joins.

Scale notes:
- Partitioned parquet (`partitionBy`) gives partition pruning on read —
  the write-side half of predicate pushdown. Choose low-cardinality
  partition columns (date, region), never high-cardinality keys.
- Bucketed tables pre-shuffle ONCE at write time; subsequent joins on
  the bucket key between co-bucketed tables need NO exchange — the
  pattern that turns a recurring 100 TB shuffle into a one-time cost.
  (Asserted in tests/test_sinks.py: the join plan has zero shuffle
  exchanges.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table."""
    w = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ~target-size files; returns the
    new file count.

    Small-files pathology: a streaming sink or over-partitioned write
    leaves thousands of KB-scale files; every downstream scan then pays
    per-file open/footer cost and the driver pays listing cost. The fix
    is a periodic rewrite sized by DATA VOLUME, not partition count.
    Writes to a staging dir first, then publishes via two renames (old
    aside, staging in): the published path itself only ever changes by
    rename, so a reader either sees the old directory or the new one,
    and a crash leaves the data recoverable in one of the two dirs —
    never a missing path mid-``rmtree``. (On a real deployment prefer a
    table format with a transactional commit; same-filesystem rename is
    the strongest primitive a plain directory sink has.)
    """
    import math
    import os
    import shutil
    import tempfile
    from pathlib import Path

    df = spark.read.parquet(path)
    total_bytes = sum(
        int(f.stat().st_size) for f in Path(path).rglob("*.parquet")
    )
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    parent = str(Path(path).parent)
    staging = tempfile.mkdtemp(prefix="compact-", dir=parent)
    retired = tempfile.mktemp(prefix="compact-old-", dir=parent)
    try:
        df.repartition(n_files).write.mode("overwrite").parquet(staging)
        os.rename(path, retired)
        try:
            os.rename(staging, path)
        except OSError:
            os.rename(retired, path)  # roll back: republish the old data
            raise
        shutil.rmtree(retired, ignore_errors=True)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return n_files
