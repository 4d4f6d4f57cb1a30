"""DataFrame-native re-expressions of the reference's MapReduce
workloads (SURVEY.md §2.2) over the shared `documents` corpus.

These are the same computations the reference runs through mapper /
reducer executables (W1 tokenize+count, W5/W6 grep), declared as
Catalyst plans: explode+groupBy replaces the md5-partition + sort +
`uniq -c` pipeline, and the shuffle/partial-agg strategy is Spark's.
Executable-compatible byte-exact jobs live in ``engine.mapreduce``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.io import load_table
from engine.registry import query


@query(
    "wordcount_tokens",
    oracle="""
SELECT token, count(*) AS cnt
FROM (SELECT unnest(string_split_regex(lower(text), '[ \t]')) AS token
      FROM documents) t
GROUP BY token
""",
    tags=("mapreduce", "wordcount", "headline"),
)
def wordcount_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W3 wordcount (wc_map.sh:12 semantics: split on [ \\t],
    lowercase, KEEP empty tokens; wc_reduce.sh:14 sum-per-key).

    Map-side partial aggregation makes this shuffle |vocab| rows per
    partition regardless of corpus size — the 100 TB plan is identical
    to the 60 kB one."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), "[ \t]")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "grep_lines",
    oracle="""
SELECT doc_id, text AS line FROM documents
WHERE contains(lower(text), 'window')
""",
    tags=("mapreduce", "grep"),
)
def grep_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/W6 grep (grep_map.py:14-28): case-insensitive substring
    filter, identity projection. The predicate is Catalyst-pushed into
    the parquet scan."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.lower(F.col("text")).contains("window")).select(
        "doc_id", F.col("text").alias("line")
    )


def token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens: wordcount + TakeOrderedAndProject (per-partition
    heaps — no global sort of the vocabulary)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), "[ \t]")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(20)
    )
