"""Skew-mitigation tests: salted join / salted agg must agree exactly
with their plain twins, and the salt must actually spread a hot key."""

from pyspark.sql import functions as F

from engine.io import load_table
from engine.operators.skew import _salt, salted_agg, salted_join
from tests.conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_linenumber"
    )
    part = load_table(spark, SF_SMOKE, "part").withColumnRenamed(
        "p_partkey", "l_partkey"
    ).select("l_partkey", "p_brand")
    plain = li.join(part, "l_partkey")
    salted = salted_join(li, part, "l_partkey", n_salts=4)
    key = lambda r: (r.l_orderkey, r.l_partkey, r.l_linenumber, r.p_brand)
    assert sorted(map(key, plain.collect())) == sorted(map(key, salted.collect()))


def test_salted_agg_matches_plain_agg(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    plain = {
        r.event_type: (r.n, round(r.total, 6), r.mx)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.event_type: (r.n, round(r.total, 6), r.mx)
        for r in salted_agg(
            ev,
            "event_type",
            {"n": ("value", "count"), "total": ("value", "sum"), "mx": ("value", "max")},
            n_salts=4,
        ).collect()
    }
    assert plain == salted


def test_salt_spreads_hot_key(spark):
    """Every row of one hot key must land in >1 salt bucket (the whole
    point); default salt derives from row content, not the key."""
    hot = spark.range(10_000).select(
        F.lit("HOT").alias("k"), F.col("id").alias("row_id")
    )
    n_buckets = hot.withColumn("s", _salt(hot, 8, None)).select("s").distinct().count()
    assert n_buckets == 8
