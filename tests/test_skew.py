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


def test_salted_count_distinct_matches_plain(spark):
    """The two-phase exact distinct chain (round 7, VERDICT r6 #5) must
    equal countDistinct exactly — including NULL exclusion and the
    all-NULL-key → 0 case — and mix with algebraic aggs in one call."""
    rows = [
        ("a", 1, 10), ("a", 1, 11), ("a", 2, 12), ("a", None, 13),
        ("b", 7, 20), ("b", 7, 21),
        ("c", None, 30), ("c", None, 31),  # all-NULL values → 0
    ]
    df = spark.createDataFrame(rows, "k string, v int, w int")
    plain = {
        r.k: (r.nd, r.total)
        for r in df.groupBy("k")
        .agg(F.count_distinct("v").alias("nd"), F.sum("w").alias("total"))
        .collect()
    }
    salted = {
        r.k: (r.nd, r.total)
        for r in salted_agg(
            df,
            "k",
            {"nd": ("v", "count_distinct"), "total": ("w", "sum")},
            n_salts=4,
        ).collect()
    }
    assert plain == salted
    assert salted["c"][0] == 0

    # distinct-only call (no algebraic base to join onto)
    only = {
        r.k: r.nd
        for r in salted_agg(df, "k", {"nd": ("v", "count_distinct")}, n_salts=4).collect()
    }
    assert only == {k: v[0] for k, v in plain.items()}

    # a big skewed input agrees too (hot key, many dup values)
    big = spark.range(20_000).select(
        F.when(F.col("id") % 10 != 0, "HOT").otherwise("cold").alias("k"),
        (F.col("id") % 97).alias("v"),
        F.col("id").alias("w"),
    )
    p = {r.k: r.nd for r in big.groupBy("k").agg(F.count_distinct("v").alias("nd")).collect()}
    s = {
        r.k: r.nd
        for r in salted_agg(big, "k", {"nd": ("v", "count_distinct")}, n_salts=8).collect()
    }
    assert p == s


def test_profile_driven_salting_rebalances_hot_key(spark):
    """Close the profiler→mitigation loop (round 7, VERDICT r6 #6):
    recommend_n_salts sizes the salt from the measured imb_bp, and
    re-profiling the post-salt composite key with the SAME measurement
    shows the simulated max-partition load dropping to the model's
    prediction (x2 slack for hash placement variance). All hashes are
    deterministic (md5-h60, fixed fixture), so the asserted bounds are
    stable, not flaky."""
    from engine.operators.skew import (
        SALT_TARGET_IMB_BP,
        profile_key,
        recommend_n_salts,
    )

    ev = load_table(spark, SF_SMOKE, "events").select(
        F.coalesce(F.col("event_type").cast("string"), F.lit("")).alias("k"),
        "event_id",
    )
    pre = profile_key(ev.select("k"), "pre").first()
    assert pre["imb_bp"] > 3 * 10000  # genuinely hot: 5 keys over 32 parts

    n = recommend_n_salts(pre["imb_bp"])
    assert 1 < n <= 64
    salted = ev.select(
        F.concat_ws("#", "k", _salt(ev, n, "event_id").cast("string")).alias("k")
    )
    post = profile_key(salted, "post").first()
    # model: expected post-imb ≈ 10000 + (pre-10000)/n; verify within 2x
    model_bp = 10000 + (pre["imb_bp"] - 10000) // n
    assert post["imb_bp"] <= 2 * model_bp, (pre["imb_bp"], n, post["imb_bp"])
    assert post["imb_bp"] < pre["imb_bp"] // 2
    assert post["n_rows"] == pre["n_rows"]  # salting moves rows, loses none

    # formula edge cases are pinned
    assert recommend_n_salts(SALT_TARGET_IMB_BP) == 1
    assert recommend_n_salts(10**9) == 64
    assert recommend_n_salts(20000, target_bp=15000) == 2


def test_salted_collect_set_matches_plain_sorted(spark):
    """collect_set through the salted two-phase chain returns the
    distinct value set as a SORTED array (deterministic under retry,
    unlike raw collect_set ordering) — equal to sorted(collect_set)
    per key, with all-NULL keys reporting an empty array."""
    rows = [
        ("a", 3), ("a", 1), ("a", 1), ("a", None),
        ("b", 7),
        ("c", None),
    ]
    df = spark.createDataFrame(rows, "k string, v int")
    plain = {
        r.k: sorted(r.s)
        for r in df.groupBy("k").agg(F.collect_set("v").alias("s")).collect()
    }
    got = {
        r.k: list(r.s)
        for r in salted_agg(
            df, "k", {"s": ("v", "collect_set")}, n_salts=4
        ).collect()
    }
    assert got == plain
    assert got["c"] == []

    # mixes with algebraic + count_distinct in one call
    mixed = salted_agg(
        df,
        "k",
        {
            "n": ("k", "count"),
            "nd": ("v", "count_distinct"),
            "s": ("v", "collect_set"),
        },
        n_salts=4,
    ).collect()
    for r in mixed:
        assert r.nd == len(r.s)


def test_salt_sizing_facet_matches_python_recommender(spark):
    """The salt_sizing facet of skew_salted_events (round 8, VERDICT
    r7 #6) must be the Python recommender run in-plan: its n_salts
    equals recommend_n_salts(pre_imb_bp) exactly, the recommendation
    actually fires on the pathological event_type key (> 1 salt), and
    the achieved post-salt imbalance improves on the profiled one."""
    from engine.operators.skew import recommend_n_salts, skew_salted_events

    rows = skew_salted_events(spark, SF_SMOKE).collect()
    sizing = [r for r in rows if r.facet == "salt_sizing"]
    assert len(sizing) == 1
    s = sizing[0]
    assert s.n_salts == recommend_n_salts(s.pre_imb_bp)
    assert s.n_salts > 1, s
    assert s.post_imb_bp < s.pre_imb_bp, s
    assert s.post_maxpart_load < s.pre_maxpart_load, s
    # agg facet values unchanged by the facet plumbing: spot-check one
    # against a plain (unsalted) aggregation
    agg = {r.event_type: r for r in rows if r.facet == "agg"}
    from engine.io import load_table
    from pyspark.sql import functions as F

    plain = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("nu"),
        )
        .collect()
    )
    for p in plain:
        assert agg[p.event_type].n_events == p.n
        assert agg[p.event_type].n_users == p.nu
