"""Scalable global row numbering (engine.operators.globalrank):
agreement with the single-partition-window definition, plus the NTILE
closed form against Spark's own ntile."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from engine.io import load_table
from engine.operators.globalrank import ntile_expr, with_global_row_number

SF_DIR = "/root/testdata/sf0.001"


def test_row_number_matches_global_window(spark):
    """Range-partitioned numbering == unpartitioned-window row_number
    on a multi-partition fact table with a total tie-break order."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    order = [F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"]
    got, total = with_global_row_number(li, order, out_col="rn", num_partitions=8)
    assert total == li.count()
    expected = li.withColumn("rn", F.row_number().over(W.orderBy(*order)))
    assert (
        got.select("l_orderkey", "l_linenumber", "rn")
        .exceptAll(expected.select("l_orderkey", "l_linenumber", "rn"))
        .isEmpty()
    )
    # contract: 1-based, dense, complete
    agg = got.agg(F.min("rn"), F.max("rn"), F.count_distinct("rn")).first()
    assert tuple(agg) == (1, total, total)


def test_row_number_empty_input(spark):
    li = load_table(spark, SF_DIR, "lineitem").filter(F.lit(False))
    got, total = with_global_row_number(li, ["l_orderkey"], num_partitions=4)
    assert total == 0
    assert got.count() == 0


@pytest.mark.parametrize("k,n", [(4, 100), (4, 101), (4, 3), (3, 10), (7, 7), (5, 1)])
def test_ntile_closed_form_matches_spark(spark, k, n):
    df = spark.range(1, n + 1).withColumnRenamed("id", "rn")
    got = df.select(
        "rn", ntile_expr(F.col("rn"), n, k).cast("int").alias("tile")
    )
    expected = df.select(
        "rn", F.ntile(k).over(W.orderBy("rn")).alias("tile")
    )
    assert got.exceptAll(expected).isEmpty()


from hypothesis import given, settings, strategies as st


@settings(max_examples=15, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-5, max_value=5), min_size=0, max_size=60
    )
)
def test_row_number_property_duplicate_heavy(spark, vals):
    """Heavy duplicate keys + unique tie-break: numbering equals the
    Python sorted() enumeration regardless of range-boundary placement."""
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows or [(0, 0)], "id INT, v INT")
    if not rows:
        df = df.filter(F.lit(False))
    got, total = with_global_row_number(
        df, [F.col("v").desc(), "id"], out_col="rn", num_partitions=5
    )
    assert total == len(rows)
    expected = {
        id_: i + 1
        for i, (id_, _) in enumerate(
            sorted(rows, key=lambda r: (-r[1], r[0]))
        )
    }
    for r in got.collect():
        assert r["rn"] == expected[r["id"]]
