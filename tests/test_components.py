"""Synthetic-graph tests for min-label connected components
(engine.operators.dedup.min_label_components): a long chain forces
multiple propagation rounds; disjoint components must not merge."""

from pyspark.sql import functions as F

from engine.operators.dedup import min_label_components


def _labels(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a BIGINT, doc_b BIGINT")
    return {
        r["node"]: r["lbl"] for r in min_label_components(df).collect()
    }


def test_chain_and_disjoint_components(spark):
    # chain 10-11-...-19 (diameter 9, exercises multi-round convergence),
    # triangle {2,3,4}, isolated pair {100, 7}.
    chain = [(i, i + 1) for i in range(10, 19)]
    pairs = chain + [(3, 2), (4, 3), (2, 4), (100, 7)]
    lbl = _labels(spark, pairs)
    assert all(lbl[n] == 10 for n in range(10, 20))
    assert lbl[2] == lbl[3] == lbl[4] == 2
    assert lbl[100] == lbl[7] == 7
    assert len(lbl) == 15


def test_star_component(spark):
    # hub-and-spoke with the min id on a spoke, not the hub
    pairs = [(50, 1), (50, 60), (50, 70), (80, 50)]
    lbl = _labels(spark, pairs)
    assert set(lbl.values()) == {1}
    assert len(lbl) == 5
