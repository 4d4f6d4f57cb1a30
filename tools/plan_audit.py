"""Physical-plan audit across every registered query: flags the
anti-patterns that are invisible at test scale but fatal at 100 TB.

Checks per query (at sf0.001 — plan shape, not data):
- CartesianProduct / BroadcastNestedLoopJoin nodes (all-pairs work);
  whitelisted for queries that intentionally broadcast a tiny side
  against an inequality condition (brute-force oracle baselines,
  scalar-subquery joins).
- Window operators with an EMPTY partition spec (single-partition
  global windows — "No Partition Defined" → every row on one task).
- Parquet scans with no pushed filters AND full-schema reads on
  queries that filter/project (pushdown failure).

Usage: python tools/plan_audit.py [query ...]   (default: all)
Exit code 1 if any non-whitelisted finding remains.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.registry import all_queries  # noqa: E402
from engine.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_SF", "/root/testdata/sf0.001")

# Queries where a nested-loop/cartesian is the DOCUMENTED intent: tiny
# broadcast side (queries / scalar aggregate / grid) against an
# inequality or free condition. Each is bounded by |small side| and
# stays bounded at scale.
NESTED_LOOP_OK = {
    # library forms (audited via tests/check_oracle's library surface)
    "ann_cosine_topk",  # 10 broadcast query vectors × corpus
    "embedding_near_dups_brute",  # documented all-pairs oracle baseline
    "ann_ivf_topk",  # K=16 broadcast centroids × corpus (build pass)
    "ann_hamming_topk",  # 10 broadcast query signatures × corpus scan
    "hard_negative_topk",  # 10 broadcast queries × corpus, label-!= scan
    "q11_important_parts",  # 1-row scalar threshold broadcast
    "q15_top_supplier",  # 1-row scalar max broadcast
    "q17_small_quantity_revenue",  # per-part avg broadcast, equi-ish
    "q22_idle_rich_customers",  # 1-row scalar avg broadcast
    "minmax_by_lookup",  # 1-row argmax broadcast
    "stats_lineitem_summary",  # 1-row stats broadcast
    "histogram_order_totalprice",  # 1-row min/max bounds broadcast
    "tfidf_top_terms",  # 1-row corpus-size broadcast
    "pipeline_source_mix",  # 1-row sampled-total broadcast
    "pipeline_temperature_mix",  # 1-row weight-normalizer broadcast
    "rollup_incremental_merge",  # 1-row 7-day-cutoff scalar broadcast
    "rollup_upsert_cells",  # same 1-row cutoff broadcast (shared _incr_lab)
    "approx_heavy_hitters",  # 1-row total-N broadcast vs 20 hitters
    "embedding_kmeans",  # K=8 broadcast centroids × corpus (Lloyd pass)
    "semantic_dedup",  # same bounded centroid broadcast per iteration
    "embedding_pq",  # PQ_K=8 broadcast codebook × corpus per subspace
    "ann_pq_adc_topk",  # same codebook broadcasts + Q×M×K ADC table
    "rerank_cross_encoder",  # inherits ann_cosine_topk's bounded query broadcast
    "collocations_lift",  # 1-row corpus-total broadcast
    "bpe_merges",  # 1-row argmax merge-pair broadcast per round
    "bpe_encode_docs",  # same 1-row argmax broadcasts (learn-chain replay)
    "user_path_patterns",  # 3-row constant pattern-set broadcast
    "pipeline_lm_likelihood",  # 1-row vocab-size V broadcast
    # federated registry queries inheriting a whitelisted component's
    # bounded broadcast (each BNLJ side is O(1) rows or the documented
    # broadcast query/centroid set — bounded at any corpus size)
    "ann_topk",  # brute query set + IVF centroid broadcasts
    "q6_q14_q17_q19_revenue",  # q17 per-part avg broadcast
    "q11_q16_part_stats",  # q11 scalar threshold broadcast
    "q15_q20_q21_supplier_audit",  # q15 scalar max broadcast
    "scalar_predicate_facets",  # minmax_by 1-row argmax broadcast
    "distribution_stats",  # stats + histogram 1-row broadcasts
    "term_rankings",  # corpus-size broadcast + 20-row topk rank join
    "pipeline_mix_funnel",  # source_mix 1-row total broadcast
    # round-3 federations inheriting whitelisted components' bounded
    # broadcasts (same O(1)-row / bounded-set sides as the components)
    "grains_distribution_stats",  # stats/histogram/incr-cutoff 1-row broadcasts
    "scalar_setops_facets",  # minmax_by 1-row argmax broadcast
    "bpe_pipeline",  # bpe 1-row argmax merge-pair broadcasts
    # round-7 layout audits: 1-row grid-bounds broadcast + the 16-row
    # (12-row for 3-dim) probe-workload broadcast against the
    # |layouts|x|files| (=128 row) file-stats table — every side
    # bounded by constants at any scale
    "layout_zorder_skipping",
    "layout_zorder3_skipping",
    "q10_q22_customer_value",  # q22 1-row scalar avg broadcast
    "corpus_mining",  # heavy-hitters/collocations 1-row total broadcasts
    "recsys_paths",  # rerank query broadcast + 3-row pattern set
    "embedding_suite",  # kmeans/PQ bounded codebook/centroid broadcasts
    "pipeline_extended",  # lm_likelihood 1-row vocab-size broadcast
    "kcore_items",  # two 1-row edge-count scalars (convergence flag)
    "graph_analytics",  # inherits kcore's 1-row convergence scalars
    # round-8 1-row broadcasts, bounded at any scale:
    # corpus_build_e2e's zaudit — the (minid, maxid) grid-bounds row
    # and the 12-row probe workload vs the |splits|x16 footer table;
    # skew_salted_events' salt_sizing — the 1-row profile-driven
    # n_salts recommendation broadcast into the salting expression
    "corpus_build_e2e",
    "skew_salted_events",
}

# Queries allowed a global (unpartitioned) window. EMPTY by design:
# global ranks go through engine.operators.globalrank (range-partition
# + broadcast offsets), which needs no single-partition window.
GLOBAL_WINDOW_OK: set[str] = set()


def audit(name: str, fn) -> list[str]:
    from engine.plans import rdd_leaf_classes
    from engine.plans import inspect as plan_inspect

    spark = get_spark("plan-audit")
    findings: list[str] = []
    # Deterministic baseline: the audit must classify THIS query's own
    # plan. A leftover cache from an earlier test/query can splice an
    # InMemoryTableScan whose cached subtree embeds ANOTHER query's
    # localCheckpoint leaf — an RDD id no capture in this audit's sink
    # recorded, which the (round-7) id-matched classifier rightly calls
    # blind. Same rule as test_plans' budget tests.
    spark.catalog.clearCache()
    # Arm a per-query capture sink: eager operators record their
    # pre-checkpoint plans while fn() builds, so checkpoint RDD leaves
    # can be verified as AUDITED below (vs a blind spot).
    outer = plan_inspect.ITERATION_PLAN_SINK
    plan_inspect.ITERATION_PLAN_SINK = {}
    try:
        df = fn(spark, SF_DIR)
        captured = plan_inspect.captured_rdd_ids(
            plan_inspect.ITERATION_PLAN_SINK
        )
    except Exception as exc:  # pragma: no cover
        return [f"build failed: {exc}"]
    finally:
        plan_inspect.ITERATION_PLAN_SINK = outer
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # Eager-checkpoint blindness gate (round 5): every ExistingRDD
    # leaf must be a bounded createDataFrame local input OR an eager
    # checkpoint whose pre-checkpoint plan recorded a capture tag
    # during construction — a 'blind' leaf means a shuffle regression
    # could hide below it, invisible to every check in this file.
    n_blind = rdd_leaf_classes(plan, captured).count("blind")
    if n_blind:
        findings.append(
            f"{n_blind} unaudited RDD-scan leaves (add a"
            " record_iteration_plan tag at the checkpoint site)"
        )
    if "CartesianProduct" in plan and name not in NESTED_LOOP_OK:
        findings.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_OK:
        findings.append("BroadcastNestedLoopJoin")
    # Formatted plans print each node as a block:
    #   (N) Window
    #   Input [...]: [...]
    #   Arguments: [<funcs>], [<partition cols>], [<sort>]
    # A GLOBAL window omits the partition list (only two top-level
    # lists) — that is the "No Partition Defined / moving all data to a
    # single partition" shape.
    for block in plan.split("\n\n"):
        # Exactly "Window" (WindowGroupLimit is a partitioned rank
        # pushdown whose Arguments shape would false-positive).
        if re.match(r"\(\d+\) Window\n", block):
            m = re.search(r"Arguments: (.*)", block)
            if not m:
                continue
            # Arguments: [funcs](, [partition])(, [sort]) — partition
            # and sort lists are omitted when empty. A sort list always
            # carries ASC/DESC; a partition list never does. Global ⇔
            # funcs only, or funcs + a sort list.
            lists = m.group(1).count("], [") + 1
            trailing_is_sort = bool(
                re.search(r"\[[^\[]*(ASC|DESC)[^\]]*\]$", m.group(1))
            )
            if lists == 1 or (lists == 2 and trailing_is_sort):
                if name not in GLOBAL_WINDOW_OK:
                    findings.append("global (unpartitioned) Window")
                break
    return findings


def main() -> int:
    # default sweep = the exported surface; explicit names may name
    # library queries too (new operators are audited on landing)
    from engine.registry import all_queries_including_library

    specs = all_queries_including_library() if sys.argv[1:] else all_queries()
    names = sys.argv[1:] or sorted(specs)
    bad = 0
    for name in names:
        findings = audit(name, specs[name].fn)
        if findings:
            bad += 1
            print(f"FLAG {name}: {'; '.join(findings)}")
        else:
            print(f"ok   {name}")
    print(f"\n{len(names) - bad} clean, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
