"""Property-based tests (hypothesis): library operators must agree with
their brute-force definitions on arbitrary inputs, not just fixtures.

Examples are capped low — each example builds Spark DataFrames — but
shrinking still gives minimal counterexamples on failure."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from engine.operators.rangejoin import range_join
from engine.operators.skew import salted_agg

BASE = dt.datetime(2024, 1, 1)

_ts = st.integers(min_value=0, max_value=3 * 86400).map(
    lambda s: BASE + dt.timedelta(seconds=s)
)
_points = st.lists(_ts, min_size=0, max_size=12)
_intervals = st.lists(
    st.tuples(_ts, st.integers(min_value=0, max_value=2 * 86400)),
    min_size=0,
    max_size=8,
)

_prop_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(points=_points, intervals=_intervals, bucket=st.sampled_from([60, 3600, 86400]))
@_prop_settings
def test_range_join_equals_brute_force(spark, points, intervals, bucket):
    p = spark.createDataFrame(
        [(i, t) for i, t in enumerate(points)] or [(None, None)],
        "pid int, t timestamp",
    ).filter(F.col("pid").isNotNull())
    iv = spark.createDataFrame(
        [
            (j, s, s + dt.timedelta(seconds=w))
            for j, (s, w) in enumerate(intervals)
        ]
        or [(None, None, None)],
        "iid int, s timestamp, e timestamp",
    ).filter(F.col("iid").isNotNull())

    got = {
        (r.pid, r.iid)
        for r in range_join(p, iv, "t", "s", "e", bucket).collect()
    }
    want = {
        (i, j)
        for i, t in enumerate(points)
        for j, (s, w) in enumerate(intervals)
        if s <= t < s + dt.timedelta(seconds=w)
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=30,
    ),
    n_salts=st.sampled_from([1, 3, 8]),
)
@_prop_settings
def test_salted_agg_equals_plain_agg(spark, rows, n_salts):
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], "k string, v long, rid long"
    )
    plain = {
        r.k: (r.n, r.total, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n, r.total, r.mn, r.mx)
        for r in salted_agg(
            df,
            "k",
            {
                "n": ("v", "count"),
                "total": ("v", "sum"),
                "mn": ("v", "min"),
                "mx": ("v", "max"),
            },
            n_salts=n_salts,
        ).collect()
    }
    assert plain == salted
