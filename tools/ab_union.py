"""Interleaved A/B: sequential union vs concurrent checkpointed union
for the federated headliners, in ONE session so host drift cancels.

Usage: python tools/ab_union.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def med(xs):
    return sorted(xs)[len(xs) // 2]


def main() -> None:
    from pyspark.sql import functions as F

    from engine.operators import relational, relational2, relational3, similarity
    from engine.plans import checkpoint_concurrently

    spark = get_spark("ab")

    def q789_parts(spark, sf_dir):
        q7 = relational2.q7_nation_volume(spark, sf_dir).select(
            F.lit("q7").alias("facet"),
            F.col("supp_nation").alias("k1"),
            F.col("cust_nation").alias("k2"),
            F.col("o_year").cast("bigint").alias("o_year"),
            F.col("volume").alias("x"),
        )
        nv = F.lit(None).cast("string")
        q8 = relational3.q8_market_share(spark, sf_dir).select(
            F.lit("q8").alias("facet"),
            nv.alias("k1"),
            nv.alias("k2"),
            F.col("o_year").cast("bigint").alias("o_year"),
            F.col("mkt_share").alias("x"),
        )
        q9 = relational2.q9_product_profit(spark, sf_dir).select(
            F.lit("q9").alias("facet"),
            F.col("nation").alias("k1"),
            nv.alias("k2"),
            F.col("o_year").cast("bigint").alias("o_year"),
            F.col("profit").alias("x"),
        )
        return [("q7", q7), ("q8", q8), ("q9", q9)]

    def ann_parts(spark, sf_dir):
        cols = ["query_id", "neighbor_id", "cos_sim", "rn"]
        return [
            ("brute", similarity.ann_cosine_topk(spark, sf_dir).select(F.lit("brute").alias("method"), *cols)),
            ("ivf", similarity.ann_ivf_topk(spark, sf_dir).select(F.lit("ivf").alias("method"), *cols)),
            ("hamming", similarity.ann_hamming_topk(spark, sf_dir).select(F.lit("hamming").alias("method"), *cols)),
            ("hardneg", similarity.hard_negative_topk(spark, sf_dir).select(F.lit("hardneg").alias("method"), *cols)),
        ]

    for label, parts_fn in (("q7_q8_q9", q789_parts), ("ann_topk", ann_parts)):
        # warm both shapes
        for variant in ("seq", "conc"):
            parts = parts_fn(spark, SF_DIR)
            if variant == "conc":
                dfs = checkpoint_concurrently([(f"ab_{t}", d) for t, d in parts])
            else:
                dfs = [d for _, d in parts]
            u = dfs[0]
            for d in dfs[1:]:
                u = u.unionAll(d)
            u.write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        times = {"seq": [], "conc": []}
        for _ in range(N):
            for variant in ("seq", "conc"):
                t0 = time.perf_counter()
                parts = parts_fn(spark, SF_DIR)
                if variant == "conc":
                    dfs = checkpoint_concurrently([(f"ab_{t}", d) for t, d in parts])
                else:
                    dfs = [d for _, d in parts]
                u = dfs[0]
                for d in dfs[1:]:
                    u = u.unionAll(d)
                u.write.format("noop").mode("overwrite").save()
                times[variant].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        print(
            f"{label}: seq median {med(times['seq']):.3f}s conc median "
            f"{med(times['conc']):.3f}s  (seq {sorted(times['seq'])}, conc {sorted(times['conc'])})"
        )


if __name__ == "__main__":
    main()
