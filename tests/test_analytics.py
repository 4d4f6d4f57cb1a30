"""Analytics operators (engine.operators.analytics): invariants beyond
the oracle equality that test_queries_oracle already pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.operators.analytics import (
    PR_DAMP,
    PR_ITERS,
    SAMPLE_K,
    pagerank_items,
    purchase_attribution,
    weighted_sample_aes,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pagerank_mass_conserved(spark):
    """Total rank stays ~1: per round the damped walk redistributes
    all mass (no dangling nodes in a symmetric graph), so drift is
    bounded by the per-node quantization (1e-9 per round per node)."""
    pr = pagerank_items(spark, SF_DIR)
    agg = pr.agg(
        F.sum("pr9").alias("mass"), F.count(F.lit(1)).alias("n")
    ).first()
    tol = 2e-9 * agg["n"] * (PR_ITERS + 1)
    assert abs(agg["mass"] - 1.0) < max(tol, 1e-6)
    # every rank at least the teleport floor
    n = agg["n"]
    assert pr.filter(F.col("pr9") < (1 - PR_DAMP) / n - 1e-9).count() == 0


def test_weighted_sample_is_k_per_source(spark):
    got = weighted_sample_aes(spark, SF_DIR)
    per = got.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")
    )
    bad = per.filter(
        (F.col("n") > SAMPLE_K) | (F.col("n") != F.col("mx"))
    ).count()
    assert bad == 0
    # deterministic: two builds agree exactly
    again = weighted_sample_aes(spark, SF_DIR)
    assert got.exceptAll(again).isEmpty() and again.exceptAll(got).isEmpty()


def test_attribution_purchase_total(spark):
    """The matrix partitions ALL purchases exactly once."""
    from engine.io import load_table

    total = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    got = purchase_attribution(spark, SF_DIR)
    assert got.agg(F.sum("n_purchases")).first()[0] == total
