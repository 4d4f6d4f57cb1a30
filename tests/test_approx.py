"""Approximate-aggregate contracts: each sketch result must sit within
its documented error bound of the exact twin — that bound IS the
operator's correctness statement (no hash-match oracle can apply)."""

from pyspark.sql import functions as F

from engine.io import load_table
from engine.operators.approx import (
    approx_distinct_users_by_type,
    approx_value_percentiles,
)
from tests.conftest import SF_SMOKE


def test_hll_distinct_within_relative_error(spark):
    approx = {
        r.event_type: r.approx_users
        for r in approx_distinct_users_by_type(spark, SF_SMOKE).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for t, n in exact.items():
        rel = abs(approx[t] - n) / n
        assert rel <= 0.05, f"{t}: HLL rel error {rel:.3f} (approx {approx[t]}, exact {n})"


def test_percentile_sketch_within_rank_tolerance(spark):
    approx = {
        r.event_type: (r.p50, r.p95, r.p99)
        for r in approx_value_percentiles(spark, SF_SMOKE).collect()
    }
    # Sketches guarantee RANK error, not value error: the approx p-th
    # percentile must lie between the exact (p-5%)- and (p+5%)-iles.
    lo_hi = {
        r.event_type: (tuple(r.lo), tuple(r.hi))
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, array(0.45, 0.90, 0.94))").alias("lo"),
            F.expr("percentile(value, array(0.55, 1.00, 1.00))").alias("hi"),
        )
        .collect()
    }
    assert approx.keys() == lo_hi.keys()
    for t, (lo, hi) in lo_hi.items():
        for a, l, h in zip(approx[t], lo, hi):
            assert l - 1e-9 <= a <= h + 1e-9, (t, a, l, h)
