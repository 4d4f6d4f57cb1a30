"""Line-oriented text directory source (reference F1 parity).

``spark.read.text`` lists files deterministically and splits by
``spark.sql.files.maxPartitionBytes`` — the round-robin file split of
the reference (F2, ``manager/__main__.py:195-202``) is superseded by
size-based splitting, which is strictly better at scale (no straggler
from one huge file). ``engine.mapreduce.runner`` retains task-count
parity where it matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_text_dir(
    spark: SparkSession, path: str, wholetext: bool = False, with_file: bool = False
) -> DataFrame:
    """Read a directory of UTF-8 text files as DataFrame[value: string].

    with_file=True adds the source filename (useful for per-file
    provenance, the unit of work in the reference's data model).
    """
    from pyspark.sql import functions as F

    df = spark.read.option("wholetext", str(wholetext).lower()).text(path)
    if with_file:
        df = df.withColumn("src_file", F.input_file_name())
    return df
