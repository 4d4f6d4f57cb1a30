"""Tabular sources: parquet (primary), CSV, JSON lines.

Always pass explicit schemas in production paths — schema inference
reads the data twice and types drift between runs; at 100 TB that is
both a correctness and a cost bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from engine.io import load_table as read_parquet  # noqa: F401  (re-export)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scans get the same vectorized reader + predicate pushdown as
    parquet (spark.sql.orc.impl=native is the default)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written under an EVOLVING schema (columns added over
    time): ``mergeSchema`` unions the file footers' schemas, and files
    missing a column surface NULLs for it.

    Scale note: schema merging reads every file's footer at planning
    time — fine for a handful of snapshot generations, wrong for a
    10M-file lake (there, keep the merged schema in a catalog and pass
    it explicitly). Additive widening only: a column whose TYPE changed
    between generations fails the merge rather than silently coercing.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)
