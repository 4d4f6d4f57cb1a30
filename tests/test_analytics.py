"""Analytics operators (engine.operators.analytics): invariants beyond
the oracle equality that test_queries_oracle already pins."""

from __future__ import annotations

import pytest
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


def test_fuzzy_blocking_complete_vs_bruteforce(spark):
    """Deletion blocking finds EXACTLY the ed<=1 pairs that all-pairs
    levenshtein finds on a typo-seeded vocabulary (the fixture corpus
    has no typos, so the registered query's 0 rows are vacuous — this
    pins the matcher itself)."""
    import itertools

    from engine.operators.analytics import fuzzy_pairs_from_vocab

    toks = [
        "hello", "helo", "hella", "jello",       # deletions + substitutions
        "spark", "spork", "sparks",              # substitution + insertion
        "window", "windows", "winnow",
        "query", "queue", "banana", "bandana",   # ed 2+ distractors
    ]
    vocab = spark.createDataFrame([(t, 1) for t in toks], "token string, freq long")
    got = {
        (r.tok_a, r.tok_b)
        for r in fuzzy_pairs_from_vocab(vocab).collect()
    }

    def ed1(a: str, b: str) -> bool:
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = j = diff = 0
        while i < la and j < lb:
            if a[i] != b[j]:
                diff += 1
                if diff > 1:
                    return False
                j += 1
            else:
                i += 1
                j += 1
        return True

    expected = {
        tuple(sorted(p)) for p in itertools.combinations(toks, 2) if ed1(*p)
    }
    assert got == expected and len(expected) >= 5


def test_triangle_counts_match_bruteforce(spark):
    """Degree-oriented enumeration == O(n^3) brute force on the
    sf0.001 co-purchase graph (~83 nodes)."""
    import itertools

    import duckdb

    from engine.operators.analytics import PR_BASKET_CAP, triangle_counts

    pairs = duckdb.sql(f"""
        WITH ui AS (
          SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item
          FROM read_parquet('{SF_DIR}/events.parquet') WHERE event_type = 'purchase'
        ),
        capped AS (
          SELECT user_id, item FROM (
            SELECT user_id, item,
                   row_number() OVER (PARTITION BY user_id ORDER BY item) AS rn
            FROM ui) t WHERE rn <= {PR_BASKET_CAP}
        )
        SELECT DISTINCT a.item, b.item FROM capped a JOIN capped b
          ON a.user_id = b.user_id AND a.item < b.item
    """).fetchall()
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expected = {n: 0 for n in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            expected[a] += 1
            expected[b] += 1
            expected[c] += 1
    got = {r.item: r.n_triangles for r in triangle_counts(spark, SF_DIR).collect()}
    assert got == expected
    assert sum(expected.values()) > 0  # fixture graph actually has triangles


def test_scd2_intervals_tile(spark):
    """SCD2 contract: per user exactly one open (is_current) interval,
    versions are 1..n contiguous, and each closed interval's valid_to
    equals the next version's valid_from (no gaps, no overlaps)."""
    from engine.operators.analytics import scd2_user_tiers

    scd = scd2_user_tiers(spark, SF_DIR).cache()
    assert scd.filter("is_current AND valid_to IS NOT NULL").count() == 0
    assert scd.filter("NOT is_current AND valid_to IS NULL").count() == 0
    per_user = scd.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open"),
        F.count(F.lit(1)).alias("n"),
        F.min("version").alias("vmin"),
        F.max("version").alias("vmax"),
    )
    assert per_user.filter(
        (F.col("n_open") != 1) | (F.col("vmin") != 1) | (F.col("vmax") != F.col("n"))
    ).count() == 0
    nxt = scd.select(
        "user_id", (F.col("version") - 1).alias("version"),
        F.col("valid_from").alias("next_from"),
    )
    joined = scd.filter("NOT is_current").join(nxt, ["user_id", "version"])
    assert joined.filter(F.col("valid_to") != F.col("next_from")).count() == 0
    scd.unpersist()


def test_transition_matrix_rows_are_distributions(spark):
    """Each from_type's outgoing probabilities sum to ~1 and its pair
    counts sum to n_from exactly."""
    from engine.operators.analytics import event_transition_matrix

    tm = event_transition_matrix(spark, SF_DIR)
    rows = tm.groupBy("from_type").agg(
        F.sum("p6").alias("psum"),
        F.sum("n").alias("nsum"),
        F.first("n_from").alias("n_from"),
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.nsum == r.n_from
        assert abs(r.psum - 1.0) < 1e-4  # K*5e-7 rounding slack


def test_trending_items_day_coverage(spark):
    """Every fixture day emits exactly K ranked items, rank 1..K."""
    from engine.operators.analytics import TREND_K, trending_items

    got = trending_items(spark, SF_DIR)
    per = got.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")
    )
    assert per.filter((F.col("n") != TREND_K) | (F.col("mx") != TREND_K)).count() == 0


def test_gapfill_fills_and_carries_forward(spark, tmp_path):
    """The fixture has no idle days (oracle equality there is
    gap-free), so pin gap semantics on synthetic sparse events: missing
    days appear with n=0/is_gap, and locf2 carries the last observed
    daily sum forward."""
    import datetime as dt

    from engine.operators.analytics import events_daily_gapfill

    rows = [
        (1, dt.datetime(2024, 1, 1, 5), 10, "click", 10.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 6), 11, "click", 2.5, "{}"),
        (3, dt.datetime(2024, 1, 4, 9), 10, "click", 7.0, "{}"),
        (4, dt.datetime(2024, 1, 2, 1), 10, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.event_type, r.day.day): (r.n, r.is_gap, r.locf2)
        for r in events_daily_gapfill(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("click", 1): (2, False, 12.5),
        ("click", 2): (0, True, 12.5),   # gap: carried forward
        ("click", 3): (0, True, 12.5),   # gap: still carried
        ("click", 4): (1, False, 7.0),
        ("view", 2): (1, False, 1.0),    # single-day type: no spine gaps
    }


def test_ols_recovers_known_line(spark, tmp_path):
    """OLS on synthetic exact-line data recovers slope/intercept to
    the output grid."""
    import datetime as dt

    from engine.operators.analytics import value_trend_ols

    # y = 3 + 0.5 * x over days x = 0..9, one point per day
    rows = [
        (i, dt.datetime(2024, 1, 1 + i, 12), 1, "click", 3.0 + 0.5 * i, "{}")
        for i in range(10)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = value_trend_ols(spark, str(tmp_path)).collect()
    assert len(r) == 1
    assert abs(r[0].slope6 - 0.5) < 1e-6 and abs(r[0].intercept6 - 3.0) < 1e-5


def test_ols_zero_variance_group_defined(spark, tmp_path):
    """A group whose events all share one day has denominator 0 in the
    normal equations (ADVICE r2) — slope must be exactly 0 and the
    intercept the group mean, never Inf/NaN."""
    import datetime as dt

    from engine.operators.analytics import value_trend_ols

    rows = [
        (i, dt.datetime(2024, 3, 5, 8 + i), 1, "burst", 2.0 + i, "{}")
        for i in range(4)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = value_trend_ols(spark, str(tmp_path)).collect()
    assert len(r) == 1
    assert r[0].slope6 == 0.0
    assert abs(r[0].intercept6 - 3.5) < 1e-6  # mean of 2,3,4,5


def test_epoch_order_is_distinct_bijection(spark):
    """Each epoch's positions are a 1..n bijection and the two epochs
    are genuinely different permutations."""
    from engine.operators.pipeline import pipeline_epoch_order

    df = pipeline_epoch_order(spark, SF_DIR).cache()
    per = df.groupBy("epoch").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("pos").alias("nd"),
        F.min("pos").alias("mn"),
        F.max("pos").alias("mx"),
    ).collect()
    assert len(per) == 2
    for r in per:
        assert r.n == r.nd and r.mn == 1 and r.mx == r.n
    e0 = df.filter("epoch = 0").select("doc_id", F.col("pos").alias("p0"))
    e1 = df.filter("epoch = 1").select("doc_id", F.col("pos").alias("p1"))
    moved = e0.join(e1, "doc_id").filter(F.col("p0") != F.col("p1")).count()
    assert moved > 0
    df.unpersist()


def test_langid_eval_identities(spark):
    """Eval identities: sum(tp)+sum(fn) == corpus size (every doc has
    exactly one actual class), sum(fp) == sum(fn) (each error is one
    class's fp and another's fn), and metrics stay in [0, 1]."""
    from engine.io import load_table
    from engine.operators.textstats import langid_eval

    rows = langid_eval(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.tp + r.fn for r in rows) == n_docs
    assert sum(r.fp for r in rows) == sum(r.fn for r in rows)
    for r in rows:
        for v in (r.precision6, r.recall6, r.f16):
            assert 0.0 <= v <= 1.0


def test_prefix_filter_complete_vs_unfiltered_join(spark):
    """Prefix-filtered candidates lose NO true pairs: the surviving
    pair set equals the any-shingle join's pairs at the same
    threshold (the oracle replays the same pruning, so a shared
    too-aggressive prefix would slip past it — this compares against
    the unpruned definition)."""
    from engine.operators.dedup import (
        PF_TAU,
        dedup_ngram_jaccard,
        dedup_prefix_filter,
    )

    got = {
        (r.id_a, r.id_b)
        for r in dedup_prefix_filter(spark, SF_DIR).collect()
    }
    # dedup_ngram_jaccard blocks on ANY shared shingle (superset of
    # candidates) at threshold 0.2; filtering its exact jaccard to
    # PF_TAU gives the ground-truth pair set.
    expected = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, SF_DIR).collect()
        if r.jaccard >= PF_TAU
    }
    assert got == expected and len(expected) > 0


def test_kcore_matches_python_peel_to_fixpoint(spark):
    """Capped-round peeling == pure-Python peeling run to FIXPOINT on
    the sf0.001 graph (proves the round cap converged), and some nodes
    were actually peeled."""
    import duckdb

    from engine.operators.analytics import KCORE_K, PR_BASKET_CAP, kcore_items

    pairs = duckdb.sql(f"""
        WITH ui AS (
          SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item
          FROM read_parquet('{SF_DIR}/events.parquet') WHERE event_type = 'purchase'
        ),
        capped AS (
          SELECT user_id, item FROM (
            SELECT user_id, item,
                   row_number() OVER (PARTITION BY user_id ORDER BY item) AS rn
            FROM ui) t WHERE rn <= {PR_BASKET_CAP}
        )
        SELECT DISTINCT a.item, b.item FROM capped a JOIN capped b
          ON a.user_id = b.user_id AND a.item < b.item
    """).fetchall()
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    n_all = len(adj)
    changed = True
    while changed:
        doomed = [n for n, nb in adj.items() if len(nb) < KCORE_K]
        changed = bool(doomed)
        for n in doomed:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    got = {r.item: r.core_deg for r in kcore_items(spark, SF_DIR).collect()}
    assert got == {n: len(nb) for n, nb in adj.items()}
    assert 0 < len(adj) < n_all  # peeling really removed nodes


def test_static_planning_restores_aqe_and_preserves_values(spark):
    """pagerank_core materializes its chain under static planning; the
    session must come back with AQE exactly as it was, both on success
    and when the materialization raises."""
    from engine.session import static_planning

    key = "spark.sql.adaptive.enabled"
    before = spark.conf.get(key)
    rows = {r.item: r.pr9 for r in pagerank_items(spark, SF_DIR).collect()}
    assert spark.conf.get(key) == before
    assert rows  # chain actually produced ranks
    with pytest.raises(RuntimeError):
        with static_planning(spark):
            assert spark.conf.get(key) == "false"
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before


def test_pagerank_core_empty_graph(spark):
    """An empty pair list (no purchase events) must return the empty
    (item, out_deg, pr9) frame, not ZeroDivisionError on 1/n."""
    from engine.operators.analytics import pagerank_core

    empty = spark.createDataFrame([], "lo bigint, hi bigint")
    out = pagerank_core(empty)
    assert out.columns == ["item", "out_deg", "pr9"]
    assert out.count() == 0


def test_incremental_rollup_merge_identity_and_collisions(spark):
    """The incremental merge's two invariants beyond the oracle hash:
    (1) the batch split is a partition — n_base + n_delta == n_events
    on every key; (2) the late-arrival sample forces genuine key
    COLLISIONS (keys with both batches contributing), so the merge is
    exercised as a re-aggregation, not a disjoint append."""
    from engine.operators.rangejoin import rollup_incremental_merge

    out = rollup_incremental_merge(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows, "merge produced no rollup rows"
    assert all(r["n_base"] + r["n_delta"] == r["n_events"] for r in rows)
    collided = [r for r in rows if r["n_base"] > 0 and r["n_delta"] > 0]
    assert collided, (
        "no key saw both base and delta rows — the merge path "
        "degenerated to a disjoint append and re-aggregation is untested"
    )
    # both pure-base keys (old days, no late rows) and pure-delta keys
    # (the last-7-day window) should also exist at this corpus shape
    assert any(r["n_delta"] == 0 for r in rows)
    assert any(r["n_base"] == 0 for r in rows)


def test_rollup_upsert_changeset_scoped_and_consistent(spark):
    """The upsert changeset must be exactly the delta-touched subset of
    the merged rollup: same keys as merge rows with n_delta > 0, same
    before/after counts, and brand-new cells (n_old == 0) marked with a
    NULL sum_old rather than a fabricated zero."""
    from engine.operators.rangejoin import (
        rollup_incremental_merge,
        rollup_upsert_cells,
    )

    sf = "/root/testdata/sf0.001"
    merge = {
        (r["day"], r["event_type"]): r
        for r in rollup_incremental_merge(spark, sf).collect()
    }
    ups = rollup_upsert_cells(spark, sf).collect()
    assert ups, "empty changeset"
    touched = {k for k, r in merge.items() if r["n_delta"] > 0}
    assert {(r["day"], r["event_type"]) for r in ups} == touched
    for r in ups:
        m = merge[(r["day"], r["event_type"])]
        assert r["n_old"] == m["n_base"]
        assert r["n_added"] == m["n_delta"]
        assert r["n_new"] == m["n_events"]
        assert r["sum_new"] == m["sum_value"]
        assert r["avg_new"] == m["avg_value"]
        if r["n_old"] == 0:
            assert r["sum_old"] is None
