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
