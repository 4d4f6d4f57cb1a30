"""Round-3 federated registry queries.

Same consolidation pattern as ``tpch_merged`` / ``facets``: the
driver's correctness gate records ~50 entries, so the round-2 library
additions (graph analytics, journey/timeseries analytics, BPE, PPJoin)
get driver-visible rows by federating them under ``facet`` columns —
and four pairs of kindred existing rows are merged to stay inside the
cap. Every component stays registered (``exported=False``) with its
own oracle, so the local gate keeps checking each one individually;
the federated oracle wraps the unchanged component oracles as
subqueries, so the driver's value hash still pins every component's
values exactly.

Perf discipline: federations that share an expensive intermediate
build it ONCE — ``graph_analytics`` persists one co-purchase pair
list for all three graph cores (the events scan + basket self-join
runs once, not three times), and ``bpe_pipeline`` runs the K-round
merge-learning chain once for both the merge table and the corpus
encoding.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Importing the component modules registers their specs (and oracles).
from engine.operators import (  # noqa: F401
    analytics,
    bpe,
    dedup,
    facets,
    streaming_queries,
)
from engine.registry import _REGISTRY, query

def _oracle(name: str) -> str:
    return _REGISTRY[name].oracle


_NB = "CAST(NULL AS BIGINT)"
_ND = "CAST(NULL AS DOUBLE)"
_NV = "CAST(NULL AS VARCHAR)"
_NT = "CAST(NULL AS TIMESTAMP)"
_NBOOL = "CAST(NULL AS BOOLEAN)"


def _nb():
    return F.lit(None).cast("bigint")


def _nd():
    return F.lit(None).cast("double")


def _nv():
    return F.lit(None).cast("string")


def _nt():
    return F.lit(None).cast("timestamp")


def _nbool():
    return F.lit(None).cast("boolean")


# ---------------------------------------------------------------------------
# New driver rows for round-2 library operators
# ---------------------------------------------------------------------------


@query(
    "graph_analytics",
    oracle=f"""
SELECT 'pagerank' AS facet, item, out_deg AS n1, {_NB} AS n2,
       pr9 AS x, {_NBOOL} AS flag
FROM ({_oracle('pagerank_items')}) pr
UNION ALL
SELECT 'triangle', item, degree, n_triangles, clustering6, {_NBOOL}
FROM ({_oracle('triangle_counts')}) tc
UNION ALL
SELECT 'kcore', item, core_deg, {_NB}, {_ND}, converged
FROM ({_oracle('kcore_items')}) kc
""",
    tags=("analytics", "graph", "iterative", "events", "headline"),
)
def graph_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-purchase graph operators, federated: `pagerank` (item,
    n1 = out-degree, x = rank after 5 damped rounds on the 1e-9 grid),
    `triangle` (n1 = degree, n2 = triangle count, x = clustering
    coefficient), `kcore` (n1 = degree within the k-core, flag =
    peeling reached fixpoint). The pair list — the dominant cost: an
    events scan + capped basket self-join — is built ONCE, persisted,
    and fanned out to all three cores."""
    pairs = analytics.copurchase_pairs(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pr = analytics.pagerank_core(pairs).select(
        F.lit("pagerank").alias("facet"),
        "item",
        F.col("out_deg").alias("n1"),
        _nb().alias("n2"),
        F.col("pr9").alias("x"),
        _nbool().alias("flag"),
    )
    tc = analytics.triangle_core(pairs).select(
        F.lit("triangle").alias("facet"),
        "item",
        F.col("degree").alias("n1"),
        F.col("n_triangles").alias("n2"),
        F.col("clustering6").alias("x"),
        _nbool().alias("flag"),
    )
    kc = analytics.kcore_core(pairs).select(
        F.lit("kcore").alias("facet"),
        "item",
        F.col("core_deg").alias("n1"),
        _nb().alias("n2"),
        _nd().alias("x"),
        F.col("converged").alias("flag"),
    )
    return pr.unionAll(tc).unionAll(kc)


@query(
    "events_lifecycle_analytics",
    oracle=f"""
SELECT 'attribution' AS facet, first_touch AS k1, last_touch AS k2,
       {_NB} AS id, {_NB} AS seq, {_NT} AS t1, {_NT} AS t2,
       n_purchases AS n1, {_NB} AS n2, {_NBOOL} AS flag,
       revenue2 AS x1, {_ND} AS x2
FROM ({_oracle('purchase_attribution')}) at
UNION ALL
SELECT 'markov', from_type, to_type, {_NB}, {_NB}, {_NT}, {_NT},
       n, n_from, {_NBOOL}, p6, {_ND}
FROM ({_oracle('event_transition_matrix')}) tm
UNION ALL
SELECT 'scd2', tier, {_NV}, user_id, version, valid_from, valid_to,
       {_NB}, {_NB}, is_current, {_ND}, {_ND}
FROM ({_oracle('scd2_user_tiers')}) sc
UNION ALL
SELECT 'trending', {_NV}, {_NV}, item, rank, day, {_NT},
       n, n_prev, {_NBOOL}, {_ND}, {_ND}
FROM ({_oracle('trending_items')}) tr
UNION ALL
SELECT 'gapfill', event_type, {_NV}, {_NB}, {_NB}, day, {_NT},
       n, {_NB}, is_gap, locf2, {_ND}
FROM ({_oracle('events_daily_gapfill')}) gf
UNION ALL
SELECT 'ols', event_type, {_NV}, {_NB}, {_NB}, {_NT}, {_NT},
       n, {_NB}, {_NBOOL}, slope6, intercept6
FROM ({_oracle('value_trend_ols')}) ol
""",
    tags=("analytics", "sequence", "timeseries", "events"),
)
def events_lifecycle_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user-journey and time-series analytics operators, six
    facets over events:

    - `attribution`: first-/last-touch matrix (k1/k2 = touches, n1 =
      purchases, x1 = integer-grid revenue);
    - `markov`:      first-order transition matrix (k1→k2, n1/n2 =
      pair/row counts, x1 = exact-ratio probability);
    - `scd2`:        Type-2 tier history (k1 = tier, id = user, seq =
      version, t1/t2 = validity interval, flag = is_current);
    - `trending`:    per-day top-K items (id = item, seq = rank, t1 =
      day, n1/n2 = count/prev-day count);
    - `gapfill`:     dense calendar with LOCF (k1 = type, t1 = day,
      n1 = count, flag = gap day, x1 = carried-forward sum);
    - `ols`:         per-type closed-form trend (x1/x2 = slope/
      intercept from integer-grid sufficient statistics).
    """
    at = analytics.purchase_attribution(spark, sf_dir).select(
        F.lit("attribution").alias("facet"),
        F.col("first_touch").alias("k1"),
        F.col("last_touch").alias("k2"),
        _nb().alias("id"),
        _nb().alias("seq"),
        _nt().alias("t1"),
        _nt().alias("t2"),
        F.col("n_purchases").alias("n1"),
        _nb().alias("n2"),
        _nbool().alias("flag"),
        F.col("revenue2").alias("x1"),
        _nd().alias("x2"),
    )
    tm = analytics.event_transition_matrix(spark, sf_dir).select(
        F.lit("markov").alias("facet"),
        F.col("from_type").alias("k1"),
        F.col("to_type").alias("k2"),
        _nb().alias("id"),
        _nb().alias("seq"),
        _nt().alias("t1"),
        _nt().alias("t2"),
        F.col("n").alias("n1"),
        F.col("n_from").alias("n2"),
        _nbool().alias("flag"),
        F.col("p6").alias("x1"),
        _nd().alias("x2"),
    )
    sc = analytics.scd2_user_tiers(spark, sf_dir).select(
        F.lit("scd2").alias("facet"),
        F.col("tier").alias("k1"),
        _nv().alias("k2"),
        F.col("user_id").alias("id"),
        F.col("version").alias("seq"),
        F.col("valid_from").alias("t1"),
        F.col("valid_to").alias("t2"),
        _nb().alias("n1"),
        _nb().alias("n2"),
        F.col("is_current").alias("flag"),
        _nd().alias("x1"),
        _nd().alias("x2"),
    )
    tr = analytics.trending_items(spark, sf_dir).select(
        F.lit("trending").alias("facet"),
        _nv().alias("k1"),
        _nv().alias("k2"),
        F.col("item").alias("id"),
        F.col("rank").alias("seq"),
        F.col("day").alias("t1"),
        _nt().alias("t2"),
        F.col("n").alias("n1"),
        F.col("n_prev").alias("n2"),
        _nbool().alias("flag"),
        _nd().alias("x1"),
        _nd().alias("x2"),
    )
    gf = analytics.events_daily_gapfill(spark, sf_dir).select(
        F.lit("gapfill").alias("facet"),
        F.col("event_type").alias("k1"),
        _nv().alias("k2"),
        _nb().alias("id"),
        _nb().alias("seq"),
        F.col("day").alias("t1"),
        _nt().alias("t2"),
        F.col("n").alias("n1"),
        _nb().alias("n2"),
        F.col("is_gap").alias("flag"),
        F.col("locf2").alias("x1"),
        _nd().alias("x2"),
    )
    ol = analytics.value_trend_ols(spark, sf_dir).select(
        F.lit("ols").alias("facet"),
        F.col("event_type").alias("k1"),
        _nv().alias("k2"),
        _nb().alias("id"),
        _nb().alias("seq"),
        _nt().alias("t1"),
        _nt().alias("t2"),
        F.col("n").alias("n1"),
        _nb().alias("n2"),
        _nbool().alias("flag"),
        F.col("slope6").alias("x1"),
        F.col("intercept6").alias("x2"),
    )
    return at.unionAll(tm).unionAll(sc).unionAll(tr).unionAll(gf).unionAll(ol)


@query(
    "bpe_pipeline",
    oracle=f"""
SELECT 'merge' AS facet, step, merge_left AS k1, merge_right AS k2,
       {_NB} AS doc_id, pair_count AS n1, {_NB} AS n2, {_NB} AS n3,
       {_ND} AS x
FROM ({_oracle('bpe_merges')}) bm
UNION ALL
SELECT 'encode', {_NB}, {_NV}, {_NV}, doc_id, n_words, n_chars_alpha,
       n_tokens, compression6
FROM ({_oracle('bpe_encode_docs')}) be
""",
    tags=("text", "tokenizer", "bpe"),
)
def bpe_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE tokenizer pipeline, federated: `merge` (the learned
    merge table — step, k1/k2 = merged pair, n1 = pair count) and
    `encode` (the corpus tokenized with that vocabulary — per-doc
    word/char/token counts, x = compression ratio). The K-round
    merge-learning chain runs ONCE for both facets (learn_chain
    returns the merge table and the final vocabulary state)."""
    words = bpe._spark_words(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    merges, final_words = bpe.learn_chain(words)
    bm = merges.select(
        F.lit("merge").alias("facet"),
        "step",
        F.col("merge_left").alias("k1"),
        F.col("merge_right").alias("k2"),
        _nb().alias("doc_id"),
        F.col("pair_count").alias("n1"),
        _nb().alias("n2"),
        _nb().alias("n3"),
        _nd().alias("x"),
    )
    be = bpe.encode_from_vocab(spark, sf_dir, final_words).select(
        F.lit("encode").alias("facet"),
        _nb().alias("step"),
        _nv().alias("k1"),
        _nv().alias("k2"),
        "doc_id",
        F.col("n_words").alias("n1"),
        F.col("n_chars_alpha").alias("n2"),
        F.col("n_tokens").alias("n3"),
        F.col("compression6").alias("x"),
    )
    return bm.unionAll(be)


@query(
    "dedup_minhash_prefix",
    oracle=f"""
SELECT 'minhash' AS facet, doc_a, doc_b, {_NB} AS n_common,
       {_NB} AS n_a, {_NB} AS n_b, est_jaccard AS x
FROM ({_oracle('dedup_minhash_lsh')}) mh
UNION ALL
SELECT 'prefix', id_a, id_b, n_common, n_a, n_b, jaccard6
FROM ({_oracle('dedup_prefix_filter')}) pf
""",
    tags=("dedup", "minhash", "lsh", "prefix-filter"),
)
def dedup_minhash_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two blocked set-similarity methods, federated: `minhash`
    (MinHash + 8×2 LSH banding candidates with estimated Jaccard = x)
    and `prefix` (PPJoin prefix-filtered candidates with exact
    Jaccard = x and the intersection/set sizes in n_common/n_a/n_b).
    Both generate candidates from bucket equi-joins — nothing
    all-pairs."""
    mh = dedup.dedup_minhash_lsh(spark, sf_dir).select(
        F.lit("minhash").alias("facet"),
        "doc_a",
        "doc_b",
        _nb().alias("n_common"),
        _nb().alias("n_a"),
        _nb().alias("n_b"),
        F.col("est_jaccard").alias("x"),
    )
    pf = dedup.dedup_prefix_filter(spark, sf_dir).select(
        F.lit("prefix").alias("facet"),
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "n_common",
        "n_a",
        "n_b",
        F.col("jaccard6").alias("x"),
    )
    return mh.unionAll(pf)


# ---------------------------------------------------------------------------
# Merged pairs of existing rows (freeing driver-cap slots)
# ---------------------------------------------------------------------------


@query(
    "grains_distribution_stats",
    oracle=f"""
SELECT facet, k1, k2, n, x AS x1, {_ND} AS x2, {_ND} AS x3,
       {_ND} AS x4, {_ND} AS x5, p1, p2, p3
FROM ({_oracle('multi_grain_pivot')}) mg
UNION ALL
SELECT facet, k, {_NV}, n, x1, x2, x3, x4, x5, {_NB}, {_NB}, {_NB}
FROM ({_oracle('distribution_stats')}) ds
""",
    tags=("relational", "grouping-sets", "statistics", "histogram"),
)
def grains_distribution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged multi-grain + distribution surface (six facets):
    `grouping_sets`/`cube`/`rollup`/`pivot` from multi_grain_pivot
    (k1/k2 = grain keys, n = count, x1 = measure, p1..p3 = pivoted
    priority counts) and `stats`/`histogram` from distribution_stats
    (k1 = flag/bucket, x1..x5 = the five statistics or bucket
    bounds)."""
    mg = facets.multi_grain_pivot(spark, sf_dir).select(
        "facet",
        "k1",
        "k2",
        "n",
        F.col("x").alias("x1"),
        _nd().alias("x2"),
        _nd().alias("x3"),
        _nd().alias("x4"),
        _nd().alias("x5"),
        "p1",
        "p2",
        "p3",
    )
    ds = facets.distribution_stats(spark, sf_dir).select(
        "facet",
        F.col("k").alias("k1"),
        _nv().alias("k2"),
        "n",
        "x1",
        "x2",
        "x3",
        "x4",
        "x5",
        _nb().alias("p1"),
        _nb().alias("p2"),
        _nb().alias("p3"),
    )
    return mg.unionAll(ds)


@query(
    "scalar_setops_facets",
    oracle=f"""
SELECT facet, k, s1, s2, s3, n1, n2, n3, n4, x, t1, t2
FROM ({_oracle('scalar_predicate_facets')}) sp
UNION ALL
SELECT facet, {_NB}, key, kind, {_NV}, n, {_NB}, {_NB}, {_NB}, {_ND},
       {_NT}, {_NT}
FROM ({_oracle('setops_cohorts')}) so
""",
    tags=("relational", "functions", "predicates", "setop"),
)
def scalar_setops_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged scalar-function + set-operation surface (nine facets):
    the five scalar_predicate_facets facets unchanged, plus the four
    setops_cohorts facets mapped onto the same schema (s1 = cohort
    member / segment, s2 = activity kind, n1 = count)."""
    sp = facets.scalar_predicate_facets(spark, sf_dir)
    so = facets.setops_cohorts(spark, sf_dir).select(
        "facet",
        _nb().alias("k"),
        F.col("key").alias("s1"),
        F.col("kind").alias("s2"),
        _nv().alias("s3"),
        F.col("n").alias("n1"),
        _nb().alias("n2"),
        _nb().alias("n3"),
        _nb().alias("n4"),
        _nd().alias("x"),
        _nt().alias("t1"),
        _nt().alias("t2"),
    )
    return sp.unionAll(so)


@query(
    "streaming_enriched_windows",
    oracle=f"""
SELECT 'enriched' AS facet, event_id, user_id, n_name AS key,
       {_NT} AS day, {_NB} AS n, value AS x
FROM ({_oracle('streaming_enriched_purchase_rows')}) en
UNION ALL
SELECT facet, {_NB}, {_NB}, event_type, day, n, x
FROM ({_oracle('streaming_windowed_counts')}) wc
""",
    tags=("streaming", "join", "window", "dedup", "events"),
)
def streaming_enriched_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged streaming surface (three facets, each a bounded
    availableNow run pinned against batch SQL): `enriched`
    (stream-static broadcast dimension join — event/user ids, key =
    nation, x = value), `tumbling` (watermarked daily counts + value
    sums) and `dedup` (watermark-bounded dropDuplicates counts)."""
    en = streaming_queries.streaming_enriched_purchase_rows(spark, sf_dir).select(
        F.lit("enriched").alias("facet"),
        "event_id",
        "user_id",
        F.col("n_name").alias("key"),
        _nt().alias("day"),
        _nb().alias("n"),
        F.col("value").alias("x"),
    )
    wc = streaming_queries.streaming_windowed_counts(spark, sf_dir).select(
        "facet",
        _nb().alias("event_id"),
        _nb().alias("user_id"),
        F.col("event_type").alias("key"),
        "day",
        "n",
        "x",
    )
    return en.unionAll(wc)
