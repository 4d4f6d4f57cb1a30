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


def test_value_ranks_match_global_window(spark):
    """with_global_value_ranks == Spark's own global window functions
    (row_number/rank/dense_rank) on data crafted to exercise the
    partition-boundary stitching: heavy duplicate runs that straddle
    range partitions, including a partition made entirely of one run."""
    from pyspark.sql import Window as W

    from engine.operators.globalrank import with_global_value_ranks

    rows = [(i, v) for i, v in enumerate(
        [5.0] * 7 + [4.0] * 1 + [3.0] * 13 + [2.0] * 2 + [1.0] * 9
    )]
    df = spark.createDataFrame(rows, "id long, v double")

    got, total = with_global_value_ranks(
        df, [F.col("v").desc(), F.col("id")], value_col="v", num_partitions=5
    )
    assert total == len(rows)

    w = W.orderBy(F.col("v").desc(), F.col("id"))
    wv = W.orderBy(F.col("v").desc())
    expected = df.select(
        "id",
        F.row_number().over(w).alias("e_rn"),
        F.rank().over(wv).alias("e_rank"),
        F.dense_rank().over(wv).alias("e_dense"),
    )
    joined = got.join(expected, "id").collect()
    assert len(joined) == len(rows)
    for r in joined:
        assert r["rn"] == r["e_rn"], r
        assert r["rank"] == r["e_rank"], r
        assert r["dense"] == r["e_dense"], r


def test_value_ranks_property(spark):
    """Randomized-but-deterministic duplicate patterns across several
    partition counts."""
    import hashlib

    from pyspark.sql import Window as W

    from engine.operators.globalrank import with_global_value_ranks

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)

    rows = [(i, float(h(i) % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v double")
    w = W.orderBy("v", "id")
    wv = W.orderBy("v")
    expected = {
        r["id"]: (r["e_rn"], r["e_rank"], r["e_dense"])
        for r in df.select(
            "id",
            F.row_number().over(w).alias("e_rn"),
            F.rank().over(wv).alias("e_rank"),
            F.dense_rank().over(wv).alias("e_dense"),
        ).collect()
    }
    for n_parts in (1, 3, 8, 50):
        got, total = with_global_value_ranks(
            df, ["v", "id"], value_col="v", num_partitions=n_parts
        )
        assert total == 200
        for r in got.collect():
            assert (r["rn"], r["rank"], r["dense"]) == expected[r["id"]], (
                n_parts,
                r,
            )


def test_topk_per_group_matches_plain_window(spark):
    """Two-phase per-group top-k == the single-task window definition,
    and is invariant to how the input happens to be partitioned."""
    from engine.operators.globalrank import topk_per_group

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    order = [F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"]
    expected = (
        li.withColumn(
            "rank",
            F.row_number()
            .over(W.partitionBy("l_suppkey").orderBy(*order))
            .cast("bigint"),
        )
        .filter(F.col("rank") <= 5)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "rank")
    )
    for reshaped in (li, li.repartition(3), li.repartition(64, "l_orderkey")):
        got = topk_per_group(reshaped, ["l_suppkey"], order, 5).select(
            "l_suppkey", "l_orderkey", "l_linenumber", "rank"
        )
        assert got.exceptAll(expected).isEmpty()
        assert expected.exceptAll(got).isEmpty()


def test_topk_per_group_small_groups(spark):
    """Groups smaller than k come through whole, ranked densely."""
    from engine.operators.globalrank import topk_per_group

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 7)], "g string, v int"
    )
    got = topk_per_group(df, ["g"], [F.col("v").desc()], 10).collect()
    by_g = {(r.g, r.v): r["rank"] for r in got}
    assert by_g == {("a", 2): 1, ("a", 1): 2, ("b", 7): 1}
