"""Retry determinism: an injected task failure + Spark reattempt must
reproduce byte-identical results.

The engine claims retry-safety everywhere — samplers/splits are salted
h60 hash predicates (never ``rand()``, which resamples on reattempt),
and value aggregates ride the integer-grid ``qsum`` (order-independent
sums). This test PROVES the claim: partition 0 of the scan fails once
(then succeeds on reattempt, ``maxFailures=3``), and the output must
equal the clean run's bit-for-bit. It is the Spark analog of the
reference's task-reassignment assertions (reference:
tests/test_manager_05.py — a dead worker's task is re-assigned and the
job's output files must be unchanged).

Runs in a subprocess because task reattempts need ``local[N, F]`` with
F > 1, and the shared test session is already up with maxFailures=1.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import json, os, sys, tempfile
sys.path.insert(0, __REPO__)
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[4, 3]")  # 4 threads, maxFailures=3
    .appName("retry-determinism")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from engine.functions.hashing import SPARK_H60
from engine.functions.rounding import qsum_rounded
from engine.io import load_table

SF = "/root/testdata/sf0.001"
marker = tempfile.mktemp(prefix="flaky_once_")


def run(flaky):
    docs = load_table(spark, SF, "documents")
    if flaky:
        schema = docs.schema

        def inject(pid, it):
            # First attempt of partition 0 dies AFTER marking, so the
            # reattempt (and every other partition) succeeds.
            if pid == 0 and not os.path.exists(marker):
                open(marker, "w").close()
                raise RuntimeError("injected task failure (attempt 0)")
            return it

        docs = spark.createDataFrame(
            docs.rdd.mapPartitionsWithIndex(inject), schema
        )
    bucket = F.expr(
        SPARK_H60.format(x="concat('split:', cast(doc_id as string))") + " % 100"
    )
    split = (
        F.when(bucket < 5, "test").when(bucket < 10, "val").otherwise("train")
    )
    agg = (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            qsum_rounded(F.col("n_chars").cast("double"), 2).alias("chars2"),
        )
    )
    return sorted(tuple(r) for r in agg.collect())


clean = run(False)
flaky = run(True)
print(
    json.dumps(
        {
            "equal": clean == flaky,
            "failure_injected": os.path.exists(marker),
            "rows": len(clean),
        }
    )
)
"""


def test_injected_task_failure_reproduces_identical_output():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("__REPO__", repr(REPO))],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["failure_injected"], "the injected failure never fired"
    assert out["rows"] == 3  # train/val/test
    assert out["equal"], "task retry changed the result — not retry-safe"
