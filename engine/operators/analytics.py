"""Product/corpus analytics the reference cannot express:
marketing-touch attribution, weighted sampling without replacement,
and inverted-index construction.

The reference computes nothing relational at all (SURVEY.md §2.3 —
`worker/__main__.py:55-58` dispatches only map/reduce executables), so
these are new Layer-B capability, written DataFrame-first with DuckDB
oracles. (Retention cohorts already live in
``engine.operators.relational.events_retention_cohorts``.)

100 TB shapes:

- **purchase_attribution** — one user-keyed window pass (bounded by
  per-user event counts) + one tiny matrix aggregate. Revenue sums use
  the integer-grid ``qsum`` so task order can't flip the hash.
- **weighted_sample_aes** — Efraimidis–Spirakis A-ES keys from the
  shared deterministic h60 (no ``rand()`` — retry/replay-safe), top-k
  per source via the two-phase ``topk_per_group`` (no whole-group
  sort in one task).
- **inverted_index_postings** — posting lists are CAPPED at the P
  smallest doc_ids per term via ``topk_per_group``; a stopword's
  billion-row posting never ships to one task. Term stats (df/tf) come
  from an ordinary two-level count aggregate (map-side partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from engine.functions.hashing import DUCK_H60, SPARK_H60
from engine.functions.rounding import duck_qsum_rounded, qsum_rounded
from engine.io import load_table
from engine.operators.globalrank import topk_per_group
from engine.plans import audited_checkpoint, record_iteration_plan
from engine.registry import query

SAMPLE_K = 20
POSTINGS_CAP = 10
TWO60 = float(1 << 60)


@query(
    "purchase_attribution",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type, value,
         first_value(event_type) OVER w AS first_touch,
         last_value(event_type) OVER w AS last_touch
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT coalesce(first_touch, 'none') AS first_touch,
       coalesce(last_touch, 'none') AS last_touch,
       CAST(count(*) AS BIGINT) AS n_purchases,
       {duck_qsum_rounded("value", 2)} AS revenue2
FROM seq WHERE event_type = 'purchase'
GROUP BY 1, 2
""",
    tags=("analytics", "attribution", "events"),
    exported=False,
)
def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-/last-touch attribution matrix: for every purchase, the
    user's earliest event and the event immediately preceding it (frame
    UNBOUNDED PRECEDING..1 PRECEDING over ts, event_id — the house
    deterministic tie-break), 'none' when the purchase is the user's
    first event. One user-keyed window shuffle; the output matrix is
    |event_types|² rows. Revenue uses the integer-grid qsum."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    seq = ev.select(
        "event_type",
        "value",
        F.coalesce(F.first("event_type").over(w), F.lit("none")).alias("first_touch"),
        F.coalesce(F.last("event_type").over(w), F.lit("none")).alias("last_touch"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy("first_touch", "last_touch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            qsum_rounded("value", 2).alias("revenue2"),
        )
    )


_AES_H_SPARK = SPARK_H60.format(x="concat('aes:', cast(doc_id as string))")
_AES_H_DUCK = DUCK_H60.format(x="'aes:' || CAST(doc_id AS VARCHAR)")


@query(
    "weighted_sample_aes",
    oracle=f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         ln(({_AES_H_DUCK} + 1) / CAST({TWO60!r} AS DOUBLE))
           / CAST(greatest(n_chars, 1) AS DOUBLE) AS k
  FROM documents
)
SELECT source, rank, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         CAST(row_number() OVER (PARTITION BY source ORDER BY k DESC, doc_id)
              AS BIGINT) AS rank
  FROM keyed
) t WHERE rank <= {SAMPLE_K}
""",
    tags=("analytics", "sampling", "documents"),
    exported=False,
)
def weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): key = ln(u) / w with u a deterministic (0,1] uniform from
    the shared h60 hash and w = n_chars; the top-k keys per source are
    an exact weighted sample. No ``rand()`` — replays and speculative
    retries see identical samples. Keys stay internal (only integer
    rank/ids are emitted), and h60 key gaps are ~2^40 ulp wide, so a
    ≤1-ulp ``ln`` difference between engines cannot reorder them.
    Top-k per source runs through the two-phase ``topk_per_group`` —
    a billion-doc source is never sorted by a single task."""
    docs = load_table(spark, sf_dir, "documents")
    u = (F.expr(_AES_H_SPARK) + F.lit(1)) / F.lit(TWO60)
    keyed = docs.select(
        "source",
        "doc_id",
        "n_chars",
        (F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")).alias("k"),
    )
    top = topk_per_group(
        keyed, ["source"], [F.col("k").desc(), F.col("doc_id")], SAMPLE_K,
        out_col="rank",
    )
    return top.select("source", "rank", "doc_id", "n_chars")


@query(
    "inverted_index_postings",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
td AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf_d
  FROM tok WHERE term <> '' GROUP BY 1, 2
),
stats AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf_d) AS BIGINT) AS tf
  FROM td GROUP BY term
),
topd AS (
  SELECT term, doc_id FROM (
    SELECT term, doc_id,
           row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
    FROM td
  ) t WHERE rn <= {POSTINGS_CAP}
),
post AS (
  SELECT term, string_agg(CAST(doc_id AS VARCHAR), '|' ORDER BY doc_id)
           AS postings
  FROM topd GROUP BY term
)
SELECT s.term, s.df, s.tf, p.postings
FROM stats s JOIN post p USING (term)
""",
    tags=("analytics", "text", "documents"),
    exported=False,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: per term, document frequency,
    total term frequency, and a posting list of the P smallest doc_ids
    ('|'-joined string — arrays don't survive the driver's value
    hash). The posting cap is enforced BEFORE collection via
    ``topk_per_group``, so a stopword's full posting list never
    materializes in one task; df/tf come from ordinary partial-agg
    counts over (term, doc) pairs."""
    docs = load_table(spark, sf_dir, "documents")
    td = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf_d"))
    )
    stats = td.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf_d").cast("bigint").alias("tf"),
    )
    top = topk_per_group(
        td.select("term", "doc_id"), ["term"], [F.col("doc_id")], POSTINGS_CAP
    )
    postings = top.groupBy("term").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(doc_id)),"
            " x -> cast(x as string)), '|')"
        ).alias("postings")
    )
    return stats.join(postings, "term").select("term", "df", "tf", "postings")


# -- PageRank over the co-purchase item graph ------------------------------
#
# Iterative algorithms are an absent class in the reference (SURVEY
# §2.3 — single-round map/reduce only; multi-round = manual
# resubmission). PageRank here is the join-based formulation: T rounds
# of edges ⋈ ranks → grouped contribution sums. Cross-engine exactness
# uses the house trick from semantic_dedup/bpe_merges: every round's
# rank is quantized to a 1e-9 grid with identical-IEEE ops, and the
# in-neighbor contribution sum is a BIGINT sum of grid units —
# order-independent, so Spark task order and DuckDB's single-threaded
# replay produce bit-identical doubles. The DuckDB oracle replays all
# T rounds as a generated CTE chain.
#
# 100 TB shape: per round, one src-keyed join shuffle + one dst-keyed
# aggregate; lineage is cut with localCheckpoint per round (the
# dedup_canonical_components precedent) so plans stay bounded. Baskets
# are capped (BASKET_CAP, the recsys skew bound), degrees are
# precomputed once and persisted. No dangling nodes: the co-purchase
# graph is symmetric, so every node has out-degree >= 1.

PR_ITERS = 5
PR_DAMP = 0.85
PR_TELEPORT = 0.15  # NOT computed as 1 - PR_DAMP (that double differs)
PR_BASKET_CAP = 64  # mirrors engine.operators.recsys.BASKET_CAP
_Q9 = "CAST(1000000000.0 AS DOUBLE)"


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-purchase item pairs (lo < hi, distinct), baskets
    capped at PR_BASKET_CAP — the shared edge-list builder for the
    graph operators (PageRank / triangles / k-core). The federated
    ``graph_analytics`` registry query builds this ONCE, persists it,
    and fans out to all three cores.

    Built as ONE user-keyed aggregation (map-side-combined
    ``collect_set`` → sorted slice → in-plan pair explode) plus the
    final pair ``distinct`` — 2 shuffles total. The previous
    distinct → row_number window → self-join formulation was
    result-identical but paid 4 shuffles (measured 6.8 s → 1.2 s at
    sf0.1 for the same 4,950 output rows). The per-user set matches
    the oracle CTE exactly: ``collect_set`` keeps distinct non-NULL
    items, and ``slice(sort_array(..), 1, CAP)`` is the CAP smallest —
    identical to ``row_number() ORDER BY item <= CAP`` over distinct
    items (the oracle ranks NULLs last and NULL pairs never survive
    ``a.item < b.item``, so NULL handling agrees too). Scale note: the
    per-user array is bounded by the user's DISTINCT item count (≤ the
    item catalog, not their event count); collect_set runs as
    ObjectHashAggregate with sort-based spill fallback, and the
    explode fan-out is capped at CAP² rows per user before the
    pair-level distinct."""
    ev = load_table(spark, sf_dir, "events")
    ui = ev.filter("event_type = 'purchase'").selectExpr(
        "user_id",
        "CAST(get_json_object(props, '$.k') AS BIGINT) AS item",
    )
    baskets = ui.groupBy("user_id").agg(
        F.expr(
            f"slice(sort_array(collect_set(item)), 1, {PR_BASKET_CAP})"
            " AS items"
        )
    )
    return (
        baskets.selectExpr("explode(items) AS lo", "items")
        .selectExpr("lo", "explode(items) AS hi")
        .filter("lo < hi")
        .distinct()
    )


def _duck_pagerank() -> str:
    from engine.functions.rounding import duck_round_he

    parts = [
        f"""ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract(props, '$.k') AS BIGINT) AS item
  FROM events WHERE event_type = 'purchase'
),
capped AS (
  SELECT user_id, item FROM (
    SELECT user_id, item,
           row_number() OVER (PARTITION BY user_id ORDER BY item) AS rn
    FROM ui) t
  WHERE rn <= {PR_BASKET_CAP}
),
edges AS (
  SELECT DISTINCT a.item AS src, b.item AS dst
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.item <> b.item
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
r0 AS (
  SELECT src AS item, d, {duck_round_he("1.0 / CAST(n AS DOUBLE)", 9)} AS pr
  FROM deg CROSS JOIN nn
)"""
    ]
    for t in range(PR_ITERS):
        inner = (
            "SELECT e.dst, CAST(sum(CAST(floor("
            f"r.pr / CAST(r.d AS DOUBLE) * {_Q9} + 0.5) AS BIGINT)) AS BIGINT) AS s"
            f" FROM edges e JOIN r{t} r ON e.src = r.item GROUP BY e.dst"
        )
        newpr = duck_round_he(
            f"CAST({PR_TELEPORT!r} AS DOUBLE) / CAST(n AS DOUBLE)"
            f" + CAST({PR_DAMP!r} AS DOUBLE)"
            f" * (CAST(coalesce(s.s, 0) AS DOUBLE) / {_Q9})",
            9,
        )
        parts.append(
            f"r{t + 1} AS (SELECT d.src AS item, d.d, {newpr} AS pr"
            f" FROM deg d CROSS JOIN nn LEFT JOIN ({inner}) s ON s.dst = d.src)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT item, d AS out_deg, pr AS pr9 FROM r{PR_ITERS}"
    )


@query(
    "pagerank_items",
    oracle=_duck_pagerank(),
    tags=("analytics", "graph", "iterative", "events"),
    exported=False,
)
def pagerank_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the co-purchase item graph (see section comment
    for the exactness and scale contract). Returns every node with its
    out-degree and its rank after PR_ITERS damped rounds."""
    return pagerank_core(copurchase_pairs(spark, sf_dir))


def pagerank_core(
    pairs: DataFrame, pinned_width: int | None = None
) -> DataFrame:
    """PageRank from a prebuilt undirected (lo < hi) pair list. The
    symmetric closure of the pairs is exactly the reference edge set
    (src <> dst both directions), so results are unchanged vs building
    edges directly.

    ``pinned_width``: when the caller already holds a static-planning
    context pinned to the measured width (graph_analytics runs the
    three cores concurrently under ONE context), pass it and no conf
    is touched here — session conf is process-global, so nested
    contexts from parallel threads would race."""
    import contextlib
    import math

    from pyspark import StorageLevel

    from engine.functions.rounding import sql_round_he
    from engine.session import static_planning

    # m comes from the caller-persisted pair cache (one cheap cached
    # count); n falls out of deg.count() below — the previous separate
    # stats job and pre-repartition edge materialization are gone
    # (three sequential driver actions → one).
    m = 2 * pairs.count()
    # Size the iteration cache to the MEASURED graph, not the session
    # default: an iterative chain pays per-stage task overhead
    # PR_ITERS times over, so a 10k-edge graph spread across 32
    # partitions spends seconds scheduling near-empty tasks (observed
    # 4s of a 5s run), while at 100 TB the same formula saturates the
    # configured parallelism. ~1M 16-byte edge rows per partition keeps
    # partitions well under executor memory. Hash-clustered on src so
    # the per-round contribution join adds no edge-side exchange — only
    # the |nodes|-row rank vector moves each round.
    conf_parts = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    nparts = (
        pinned_width
        if pinned_width is not None
        else max(1, min(conf_parts, -(-m // 1_000_000)))
    )
    # The whole chain — degree build, PR_ITERS rounds, and the single
    # eager materialization — plans under (a) static planning (measured
    # 3.3 s AQE vs 1.3 s static for five 10k-row rounds: per-round
    # cardinality is degree-bounded, so adaptive re-planning only adds
    # driver round trips) and (b) a shuffle width pinned to the
    # MEASURED nparts. The width matters twice: tiny graphs stop
    # launching 32 near-empty tasks per stage, and deg's groupBy lands
    # hash-partitioned (src, nparts) — identical to edges' clustering —
    # so the per-round contribution join needs NO edge-side exchange;
    # the only exchange per round is the |nodes|-row contribution sum.
    ctx = (
        contextlib.nullcontext()
        if pinned_width is not None
        else static_planning(pairs.sparkSession, shuffle_partitions=nparts)
    )
    with ctx:
        edges = (
            pairs.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
            .unionAll(
                pairs.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))
            )
            .repartition(nparts, "src")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        deg = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n = deg.count()  # ONE action fills edges AND deg; n = node count
        if n == 0:
            # Empty graph (no purchase events / no items): return the
            # empty result with the output schema instead of dividing
            # by zero in pr0. Unpersist first (recomputing an empty
            # plan is free; a pinned dead cache entry is not).
            edges.unpersist(False)
            deg.unpersist(False)
            return deg.select(
                F.col("src").alias("item"),
                F.col("d").alias("out_deg"),
                F.lit(0.0).alias("pr9"),
            )
        pr0 = math.floor(1.0 / n * 1e9 + 0.5) / 1e9  # same IEEE ops as oracle
        pr = deg.selectExpr("src AS item", "d", f"{pr0!r}D AS pr")
        newpr = sql_round_he(
            f"{PR_TELEPORT!r}D / {float(n)!r}D + {PR_DAMP!r}D"
            " * (CAST(coalesce(s, 0) AS DOUBLE) / 1e9)",
            9,
        )
        for _i in range(PR_ITERS):
            contrib = edges.join(
                pr.selectExpr("item AS src", "d", "pr"), "src"
            ).selectExpr(
                "dst",
                "CAST(floor(pr / CAST(d AS DOUBLE) * 1e9 + 0.5D)"
                " AS BIGINT) AS c",
            )
            s = contrib.groupBy("dst").agg(
                F.expr("CAST(sum(c) AS BIGINT) AS s")
            )
            pr = deg.join(s, F.expr("src = dst"), "left").selectExpr(
                "src AS item", "d", f"{newpr} AS pr"
            )
            # No per-round localCheckpoint: each round's rank vector
            # has exactly ONE consumer (the next round's contribution
            # join), so the lineage is linear — the whole PR_ITERS
            # chain runs as one job over the cached edges/deg tables.
            if _i == 0:
                # Pre-checkpoint auditability (armed-only no-op): the
                # round-1 plan = setup + one round; the chain capture
                # below lets the audit derive exchanges-per-round.
                record_iteration_plan("pagerank_round1", pr)
        out = pr.select(
            "item", F.col("d").alias("out_deg"), F.col("pr").alias("pr9")
        )
        out = audited_checkpoint("pagerank_chain", out)
    # The checkpoint is the only live result: drop the iteration
    # caches so long-lived sessions (the 145-query oracle gate) don't
    # accumulate dead edge-list-sized blocks per invocation.
    edges.unpersist(False)
    deg.unpersist(False)
    return out


# -- Fuzzy string matching (SymSpell-style deletion blocking) ---------------

FUZZY_MIN_LEN = 4  # typo-meaningful tokens only; also kills '' keys


@query(
    "fuzzy_token_pairs",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
),
vocab AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq FROM tok
  WHERE token <> '' AND length(token) >= {FUZZY_MIN_LEN} GROUP BY token
),
keys AS (
  SELECT token,
         unnest(list_transform(range(0, length(token) + 1),
           i -> CASE WHEN i = 0 THEN token
                     ELSE substr(token, 1, i - 1) || substr(token, i + 1)
                END)) AS k
  FROM vocab
),
cand AS (
  SELECT DISTINCT a.token AS tok_a, b.token AS tok_b
  FROM keys a JOIN keys b ON a.k = b.k AND a.token < b.token
)
SELECT c.tok_a, c.tok_b, fa.freq AS freq_a, fb.freq AS freq_b
FROM cand c
JOIN vocab fa ON fa.token = c.tok_a
JOIN vocab fb ON fb.token = c.tok_b
WHERE levenshtein(c.tok_a, c.tok_b) <= 1
""",
    tags=("analytics", "fuzzy", "text", "documents"),
    exported=False,
)
def fuzzy_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-≤1 vocabulary pairs via SymSpell-style deletion
    blocking: each token's key set is itself plus its single-character
    deletions; any pair within edit distance 1 must share a key
    (equality → the token itself; substitution → a common deletion;
    insert/delete → one is the other's deletion), so candidates come
    from a plain equi-join on key — never an all-pairs comparison.
    Exact ``levenshtein`` verifies candidates (both engines implement
    the same Wagner–Fischer distance).

    100 TB shape: runs on the VOCABULARY (one corpus-sized count
    shuffle, then token-cardinality data), expansion is O(token
    length) keys per token, and the candidate join is hash-bucketed on
    the key. FUZZY_MIN_LEN keeps degenerate short-token buckets (and
    the '' key) out of the join — the documented skew guard.

    The fixture corpus is machine-generated with NO near-typos, so
    this query legitimately returns 0 rows at every SF; the blocking's
    completeness (all ed≤1 pairs found) is therefore pinned separately
    against brute-force all-pairs on a typo-seeded vocabulary in
    tests/test_analytics.py."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter((F.col("token") != "") & (F.length("token") >= FUZZY_MIN_LEN))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    return fuzzy_pairs_from_vocab(vocab)


def fuzzy_pairs_from_vocab(vocab: DataFrame) -> DataFrame:
    """Core deletion-neighborhood matcher over a ``(token, freq)``
    vocabulary — see :func:`fuzzy_token_pairs` for the contract."""
    keys = vocab.select(
        "token",
        F.explode(
            F.expr(
                "transform(sequence(0, length(token)), i -> CASE WHEN i = 0"
                " THEN token ELSE concat(substring(token, 1, i - 1),"
                " substring(token, i + 1)) END)"
            )
        ).alias("k"),
    )
    ka = keys.select(F.col("token").alias("tok_a"), "k")
    kb = keys.select(F.col("token").alias("tok_b"), "k")
    cand = (
        ka.join(kb, "k")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .select("tok_a", "tok_b")
        .distinct()
        .filter(F.levenshtein("tok_a", "tok_b") <= 1)
    )
    fa = vocab.select(F.col("token").alias("tok_a"), F.col("freq").alias("freq_a"))
    fb = vocab.select(F.col("token").alias("tok_b"), F.col("freq").alias("freq_b"))
    return cand.join(fa, "tok_a").join(fb, "tok_b").select(
        "tok_a", "tok_b", "freq_a", "freq_b"
    )


# -- Triangle counting (degree-oriented enumeration) ------------------------


@query(
    "triangle_counts",
    oracle=f"""
WITH ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract(props, '$.k') AS BIGINT) AS item
  FROM events WHERE event_type = 'purchase'
),
capped AS (
  SELECT user_id, item FROM (
    SELECT user_id, item,
           row_number() OVER (PARTITION BY user_id ORDER BY item) AS rn
    FROM ui) t
  WHERE rn <= {PR_BASKET_CAP}
),
pairs AS (
  SELECT DISTINCT a.item AS lo, b.item AS hi
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.item < b.item
),
deg AS (
  SELECT item, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT lo AS item FROM pairs UNION ALL SELECT hi FROM pairs
  ) GROUP BY item
),
o AS (
  SELECT CASE WHEN (dl.d, p.lo) < (dh.d, p.hi) THEN p.lo ELSE p.hi END AS src,
         CASE WHEN (dl.d, p.lo) < (dh.d, p.hi) THEN p.hi ELSE p.lo END AS dst,
         CASE WHEN (dl.d, p.lo) < (dh.d, p.hi) THEN dh.d ELSE dl.d END AS dd
  FROM pairs p
  JOIN deg dl ON dl.item = p.lo
  JOIN deg dh ON dh.item = p.hi
),
tri AS (
  SELECT w.a, w.b, w.c FROM (
    SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
    FROM o o1 JOIN o o2 ON o1.src = o2.src
    WHERE (o1.dd, o1.dst) < (o2.dd, o2.dst)
  ) w JOIN o o3 ON o3.src = w.b AND o3.dst = w.c
),
pern AS (
  SELECT item, CAST(count(*) AS BIGINT) AS n_tri FROM (
    SELECT a AS item FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY item
)
SELECT d.item, d.d AS degree,
       CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.d >= 2 THEN
         floor(2.0 * coalesce(p.n_tri, 0)
               / (CAST(d.d AS DOUBLE) * CAST(d.d - 1 AS DOUBLE))
               * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE)
       ELSE CAST(0.0 AS DOUBLE) END AS clustering6
FROM deg d LEFT JOIN pern p ON p.item = d.item
""",
    tags=("analytics", "graph", "events"),
    exported=False,
)
def triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over
    the co-purchase graph, via DEGREE ORIENTATION: each undirected
    edge is directed from its (degree, id)-smaller endpoint, so every
    triangle is enumerated exactly once from its smallest vertex and
    wedge fan-out is bounded by oriented out-degree ≤ O(√m) — the
    classic O(m^1.5) bound, robust to power-law hubs (a hub's edges
    all point INTO it, so it fans out nothing). Candidate wedges close
    via one equi-join against the oriented edge list. All counts are
    integers; the coefficient 2T/(d(d-1)) guards d<2 (the engines
    diverge on 0/0) and rounds with the shared IEEE sequence."""
    from pyspark import StorageLevel

    pairs = copurchase_pairs(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    out = triangle_core(pairs)  # eager: checkpointed before returning
    pairs.unpersist(False)
    return out


def triangle_core(
    pairs: DataFrame, pinned_width: int | None = None
) -> DataFrame:
    """Triangle counting from a prebuilt (and persisted) undirected
    pair list — consumers: degree count (x2 via union), orientation
    join; the caller persists so basket expansion runs once.

    Materialized eagerly under static planning with the shuffle width
    sized to the measured edge count (the pagerank_core/kcore_core
    discipline): the DAG is 6 shuffles deep, and per-stage AQE round
    trips + 32-way near-empty tasks dominated wall time on small
    graphs (measured 1.0 s adaptive → 0.8 s static-pinned at sf0.1,
    identical rows). Wedge fan-out is degree-orientation-bounded
    (O(m^1.5) worst case), so sizing off the edge count holds.

    ``pinned_width``: see pagerank_core — set by a caller that already
    holds the shared static-planning context (parallel facet runs)."""
    import contextlib

    from engine.session import static_planning

    conf_parts = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    m2 = pairs.count()  # one map pass over the caller-persisted cache
    nparts = (
        pinned_width
        if pinned_width is not None
        else max(1, min(conf_parts, -(-(2 * m2) // 1_000_000)))
    )
    ctx = (
        contextlib.nullcontext()
        if pinned_width is not None
        else static_planning(pairs.sparkSession, shuffle_partitions=nparts)
    )
    with ctx:
        plan, caches = _triangle_core_plan(pairs)
        out = audited_checkpoint("triangle_chain", plan)
    # The checkpoint is the only live result: drop the internal
    # deg/orientation caches so repeated invocations in a long-lived
    # session don't accumulate dead blocks.
    for c in caches:
        c.unpersist(False)
    return out


def _triangle_core_plan(pairs: DataFrame):
    from pyspark import StorageLevel

    from engine.functions.rounding import sql_round_he

    deg = (
        pairs.selectExpr("lo AS item")
        .unionAll(pairs.selectExpr("hi AS item"))
        .groupBy("item")
        .agg(F.expr("CAST(count(1) AS BIGINT) AS d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e = pairs.join(deg.selectExpr("item AS lo", "d AS dl"), "lo").join(
        deg.selectExpr("item AS hi", "d AS dh"), "hi"
    )
    fwd = "(dl < dh OR (dl = dh AND lo < hi))"
    o = e.selectExpr(
        f"IF({fwd}, lo, hi) AS src",
        f"IF({fwd}, hi, lo) AS dst",
        f"IF({fwd}, dh, dl) AS dd",
        # three consumers (both wedge legs + the closing join):
        # orient once, not 3x
    ).persist(StorageLevel.MEMORY_AND_DISK)
    o1 = o.selectExpr("src", "dst AS b", "dd AS db")
    o2 = o.selectExpr("src", "dst AS c", "dd AS dc")
    wedges = o1.join(o2, "src").filter("db < dc OR (db = dc AND b < c)")
    o3 = o.selectExpr("src AS b", "dst AS c")
    tri = wedges.join(o3, ["b", "c"]).selectExpr("src AS a", "b", "c")
    pern = (
        tri.selectExpr("explode(array(a, b, c)) AS item")
        .groupBy("item")
        .agg(F.expr("CAST(count(1) AS BIGINT) AS n_tri"))
    )
    coeff = (
        "CASE WHEN degree >= 2 THEN "
        + sql_round_he(
            "2.0D * CAST(n_triangles AS DOUBLE)"
            " / (CAST(degree AS DOUBLE) * CAST(degree - 1 AS DOUBLE))",
            6,
        )
        + " ELSE 0.0D END"
    )
    plan = (
        deg.join(pern, deg.item == pern.item, "left")
        .select(
            deg.item,
            F.col("d").alias("degree"),
            F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_triangles"),
        )
        .selectExpr("item", "degree", "n_triangles", f"{coeff} AS clustering6")
    )
    return plan, [deg, o]


# -- SCD Type-2 dimension build --------------------------------------------


_TIER = """CASE WHEN value < 25 THEN 'bronze'
     WHEN value < 100 THEN 'silver'
     ELSE 'gold' END"""


@query(
    "scd2_user_tiers",
    oracle=f"""
WITH p AS (
  SELECT user_id, ts, event_id, {_TIER} AS tier
  FROM events WHERE event_type = 'purchase'
),
marked AS (
  SELECT user_id, ts, event_id, tier,
         CASE WHEN lag(tier) OVER w IS DISTINCT FROM tier THEN 1 ELSE 0 END
           AS is_change
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (SELECT user_id, ts, event_id, tier FROM marked WHERE is_change = 1)
SELECT user_id, tier,
       CAST(row_number() OVER w2 AS BIGINT) AS version,
       CAST(ts AS TIMESTAMP) AS valid_from,
       CAST(lead(ts) OVER w2 AS TIMESTAMP) AS valid_to,
       CAST(CASE WHEN lead(ts) OVER w2 IS NULL THEN 1 ELSE 0 END AS BOOLEAN)
         AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("analytics", "scd", "warehouse", "events"),
    exported=False,
)
def scd2_user_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (Type 2) history build: each user's
    purchase-derived spend tier collapses into validity intervals —
    one row per tier RUN with [valid_from, valid_to) bounds, a version
    number, and an is_current flag (open interval). Change detection
    is ``tier IS DISTINCT FROM lag(tier)`` over the deterministic
    (ts, event_id) order; the run's interval closes at the next
    change's start. The standard warehouse dimension-versioning
    operator the reference cannot express.

    100 TB shape: both window passes share one user_id shuffle
    (Spark plans consecutive same-key windows in a single exchange);
    no self-join, no driver state. Output is bounded by the number of
    tier CHANGES, not events."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.expr(_TIER).alias("tier")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        p.withColumn("_prev", F.lag("tier").over(w))
        .filter(~F.col("tier").eqNullSafe(F.col("_prev")))
        .drop("_prev")
    )
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "tier",
        F.row_number().over(w2).cast("bigint").alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


# -- Markov transition matrix over event sequences --------------------------


@query(
    "event_transition_matrix",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
),
pairs AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
),
totals AS (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM pairs GROUP BY 1
)
SELECT p.from_type, p.to_type, p.n, t.n_from,
       {{p6}} AS p6
FROM pairs p JOIN totals t USING (from_type)
""".format(
        p6=__import__("engine.functions.rounding", fromlist=["duck_round_he"])
        .duck_round_he("CAST(p.n AS DOUBLE) / CAST(t.n_from AS DOUBLE)", 6)
    ),
    tags=("analytics", "sequence", "markov", "events"),
    exported=False,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next = to | current = from) as exact integer-count
    ratios (BIGINT / BIGINT division is bit-identical across engines,
    then the shared IEEE rounding). One user-keyed window shuffle for
    the lead() pass, one |event_types|²-row aggregate; row totals join
    back broadcast-sized."""
    from engine.functions.rounding import round_he

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n").cast("bigint").alias("n_from")
    )
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        "n_from",
        round_he(F.col("n").cast("double") / F.col("n_from").cast("double"), 6)
        .alias("p6"),
    )


# -- Trending items (day-over-day movers) -----------------------------------

TREND_K = 10


@query(
    "trending_items",
    oracle=f"""
WITH counts AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(json_extract(props, '$.k') AS BIGINT) AS item,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE json_extract(props, '$.k') IS NOT NULL
  GROUP BY 1, 2
),
ranked AS (
  SELECT day, item, n,
         CAST(row_number() OVER (PARTITION BY day ORDER BY n DESC, item)
              AS BIGINT) AS rank
  FROM counts
)
SELECT r.day, r.rank, r.item, r.n,
       CAST(coalesce(p.n, 0) AS BIGINT) AS n_prev
FROM ranked r
LEFT JOIN counts p
  ON p.item = r.item AND p.day = r.day - INTERVAL 1 DAY
WHERE r.rank <= {TREND_K}
""",
    tags=("analytics", "trending", "events"),
    exported=False,
)
def trending_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day trending items: per day the top-K items by event
    count, each with its previous-day count. Top-K per day goes
    through the two-phase ``topk_per_group`` (a day's item catalog is
    never sorted in one task); the prior-day lookup is an equi-join on
    (item, day-1) — no cross-day window over the whole catalog."""
    ev = load_table(spark, sf_dir, "events")
    item = F.get_json_object("props", "$.k").cast("bigint")
    counts = (
        ev.filter(item.isNotNull())
        .select(F.date_trunc("day", "ts").alias("day"), item.alias("item"))
        .groupBy("day", "item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    top = topk_per_group(
        counts, ["day"], [F.col("n").desc(), F.col("item")], TREND_K, out_col="rank"
    )
    prev = counts.select(
        "item",
        (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("day"),
        F.col("n").alias("n_prev"),
    )
    return top.join(prev, ["day", "item"], "left").select(
        "day",
        "rank",
        "item",
        "n",
        F.coalesce("n_prev", F.lit(0)).cast("bigint").alias("n_prev"),
    )


# -- Time-series gap filling (dense calendar + LOCF) ------------------------


@query(
    "events_daily_gapfill",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n,
         {duck_qsum_rounded("value", 2)} AS sum2
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1
),
spine AS (
  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
  FROM bounds
)
SELECT s.event_type, s.day,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n,
       CAST(d.n IS NULL AS BOOLEAN) AS is_gap,
       last_value(d.sum2 IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf2
FROM spine s LEFT JOIN daily d ON d.event_type = s.event_type AND d.day = s.day
""",
    tags=("analytics", "timeseries", "events"),
    exported=False,
)
def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time-series materialization: per event type, every
    calendar day between that type's first and last activity — missing
    days filled with zero counts, flagged, and the daily value sum
    carried forward (last-observation-carried-forward via
    ``last(..., ignorenulls)``). The calendar spine comes from
    ``sequence()`` over per-type min/max bounds, so the LOCF window
    partition is bounded by #days — calendar-sized, never
    corpus-sized; the corpus is touched once by the daily aggregate.
    Value sums ride the integer-grid qsum (order-independent)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        qsum_rounded("value", 2).alias("sum2"),
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("day"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.col("n").isNull().alias("is_gap"),
            F.last("sum2", ignorenulls=True).over(w).alias("locf2"),
        )
    )


# -- Per-group OLS trend (closed-form simple regression) --------------------


@query(
    "value_trend_ols",
    oracle="""
WITH pts AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS x,
         value AS y
  FROM events
),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sx2,
         CAST(sum(CAST(floor(y * CAST(10000.0 AS DOUBLE) + 0.5) AS BIGINT))
              AS BIGINT) AS sy4,
         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * y * CAST(10000.0 AS DOUBLE)
                             + 0.5) AS BIGINT)) AS BIGINT) AS sxy4
  FROM pts GROUP BY event_type
),
sl AS (
  SELECT event_type, n, sx, sy4,
         CASE WHEN CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
              THEN CAST(0.0 AS DOUBLE)
              ELSE floor((CAST(n AS DOUBLE) * (CAST(sxy4 AS DOUBLE) / CAST(10000.0 AS DOUBLE))
                          - CAST(sx AS DOUBLE) * (CAST(sy4 AS DOUBLE) / CAST(10000.0 AS DOUBLE)))
                         / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE)
         END AS slope6
  FROM s
)
SELECT event_type, n, slope6,
       floor(((CAST(sy4 AS DOUBLE) / CAST(10000.0 AS DOUBLE))
              / CAST(n AS DOUBLE)
              - slope6 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
             * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE)
         AS intercept6
FROM sl
""",
    tags=("analytics", "regression", "events"),
    exported=False,
)
def value_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form per-group simple regression (value vs days since
    the fixture epoch): slope and intercept from the five sufficient
    statistics, each an order-independent integer sum — x/x² are exact
    BIGINTs, y and x·y ride the 1e-4 integer grid — so the normal
    equations start from bit-identical numbers on both engines and the
    remaining arithmetic is a fixed IEEE op sequence. The distributed-
    ML primitive: one partial-aggregated shuffle to |groups| rows, no
    iteration, no driver math. Intercept quantizes the slope FIRST
    (mirroring its output rounding) so both outputs derive from the
    same published slope."""
    ev = load_table(spark, sf_dir, "events")
    x = F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("2024-01-01"))).cast(
        "bigint"
    )
    pts = ev.select("event_type", x.alias("x"), F.col("value").alias("y"))
    grid = F.lit(10000.0)
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sx2"),
        F.sum(F.floor(F.col("y") * grid + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("sy4"),
        F.sum(
            F.floor(F.col("x").cast("double") * F.col("y") * grid + F.lit(0.5)).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("sxy4"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sx2d = F.col("sx2").cast("double")
    syd = F.col("sy4").cast("double") / grid
    sxyd = F.col("sxy4").cast("double") / grid
    # Zero-variance guard: a group whose points all share one x (all
    # events on a single day) has denominator 0 — slope degenerates to
    # Inf/NaN, a cross-engine hash hazard. Define slope = 0 there (the
    # intercept then falls back to the group mean).
    denom = nd * sx2d - sxd * sxd
    slope_q = F.when(denom == F.lit(0.0), F.lit(0.0)).otherwise(
        F.floor((nd * sxyd - sxd * syd) / denom * F.lit(1e6) + F.lit(0.5))
        / F.lit(1e6)
    )
    intercept_q = F.floor(
        (syd / nd - slope_q * (sxd / nd)) * F.lit(1e6) + F.lit(0.5)
    ) / F.lit(1e6)
    return s.select(
        "event_type",
        "n",
        slope_q.alias("slope6"),
        intercept_q.alias("intercept6"),
    )


# -- k-core decomposition (iterative peeling) -------------------------------

KCORE_K = 18
KCORE_ROUNDS = 4


def _duck_kcore() -> str:
    parts = [
        f"""ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract(props, '$.k') AS BIGINT) AS item
  FROM events WHERE event_type = 'purchase'
),
capped AS (
  SELECT user_id, item FROM (
    SELECT user_id, item,
           row_number() OVER (PARTITION BY user_id ORDER BY item) AS rn
    FROM ui) t
  WHERE rn <= {PR_BASKET_CAP}
),
e0 AS MATERIALIZED (
  SELECT DISTINCT a.item AS lo, b.item AS hi
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.item < b.item
)"""
    ]
    for t in range(KCORE_ROUNDS):
        parts.append(
            f"""d{t} AS MATERIALIZED (
  SELECT item, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT lo AS item FROM e{t} UNION ALL SELECT hi FROM e{t}
  ) GROUP BY item
),
k{t} AS MATERIALIZED (SELECT item FROM d{t} WHERE d >= {KCORE_K}),
e{t + 1} AS MATERIALIZED (
  SELECT e.lo, e.hi FROM e{t} e
  JOIN k{t} a ON a.item = e.lo
  JOIN k{t} b ON b.item = e.hi
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT item, CAST(count(*) AS BIGINT) AS core_deg,
       CAST((SELECT count(*) FROM e{KCORE_ROUNDS})
            = (SELECT count(*) FROM e{KCORE_ROUNDS - 1}) AS BOOLEAN)
         AS converged
FROM (
  SELECT lo AS item FROM e{KCORE_ROUNDS}
  UNION ALL SELECT hi FROM e{KCORE_ROUNDS}
) GROUP BY item
HAVING count(*) >= {KCORE_K}"""
    )


@query(
    "kcore_items",
    oracle=_duck_kcore(),
    tags=("analytics", "graph", "iterative", "events"),
    exported=False,
)
def kcore_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition by iterative peeling: each round drops
    nodes with degree < k and the edges touching them; survivors of
    KCORE_ROUNDS rounds (with a final degree>=k filter, so a not-yet-
    converged frontier can't leak sub-k nodes) approximate the k-core
    from above — exactly the k-core once peeling stabilizes, which on
    a dense co-purchase graph takes 1-2 rounds. All-integer degrees,
    so the round-replaying CTE oracle matches bit-for-bit.

    100 TB shape: per round one degree aggregate + one semi-join pair
    of the edge list against the bounded survivor set; each round's
    survivor edges are cut with localCheckpoint per round (multiple
    consumers: the next round's degree + both semi-joins)."""
    pairs = copurchase_pairs(spark, sf_dir)
    return kcore_core(audited_checkpoint("copurchase_pairs_pre", pairs))


def kcore_core(
    pairs: DataFrame, pinned_width: int | None = None
) -> DataFrame:
    """k-core peeling from a prebuilt undirected pair list. Emits a
    ``converged`` flag: peeling only ever REMOVES edges, so equal edge
    counts in the last two rounds is an exact fixpoint test — on data
    where KCORE_ROUNDS doesn't converge, the flag is false instead of
    silently returning a non-fixpoint core. The two counts are 1-row
    scalar aggregates over the last two CHECKPOINTED rounds, broadcast
    into the output — exactly how the oracle's CTE computes the same
    flag, and no eager count job per round.

    Eager localCheckpoint cuts are load-bearing, not just lineage
    hygiene: a fully lazy persist-chain alternative planned ~90s at
    ANY scale factor (AQE re-planning nested cached subtrees per
    consumer), vs ~2s with eager cuts. Round 12 fuses TWO peel rounds
    per cut (see the loop comment) — same values, half the
    materializations. Like pagerank_core, the whole
    peel runs under static planning with the shuffle width pinned to
    the MEASURED edge count: an earlier adaptive variant leaned on
    AQE's runtime broadcast conversion (1.9 s adaptive vs 5.5 s
    static-at-32-partitions at sf0.1), but pinning the width removes
    the near-empty tasks that made static lose — 4.2 s adaptive →
    1.6 s static-pinned on the same data, identical rows. The
    round-N degree groupBy lands hash-partitioned like the
    lo-clustered edge list, so each round pays one edge exchange (the
    hi-side semi-join), not three.

    ``pinned_width``: see pagerank_core — set by a caller that already
    holds the shared static-planning context (parallel facet runs)."""
    import contextlib

    from engine.session import static_planning

    conf_parts = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    m2 = pairs.count()  # one map pass over the caller-persisted cache
    nparts = (
        pinned_width
        if pinned_width is not None
        else max(1, min(conf_parts, -(-(2 * m2) // 1_000_000)))
    )
    ctx = (
        contextlib.nullcontext()
        if pinned_width is not None
        else static_planning(pairs.sparkSession, shuffle_partitions=nparts)
    )
    def _peel(edges: DataFrame) -> DataFrame:
        """One lazy peel round: degree filter + two semi-joins."""
        deg = (
            edges.selectExpr("lo AS item")
            .unionAll(edges.selectExpr("hi AS item"))
            .groupBy("item")
            .agg(F.expr("CAST(count(1) AS BIGINT) AS d"))
        )
        keep = deg.filter(f"d >= {KCORE_K}").select("item")
        return (
            edges.join(keep.withColumnRenamed("item", "lo"), "lo", "left_semi")
            .join(keep.withColumnRenamed("item", "hi"), "hi", "left_semi")
            .select("lo", "hi")
        )

    with ctx:
        edges = audited_checkpoint(
            "kcore_edges_pre", pairs.repartition(nparts, "lo")
        )
        # FUSED peel (round 12, guide §2.4/§5): TWO rounds per
        # localCheckpoint instead of one. The per-round checkpoint
        # existed because a round's output has three consumers (both
        # degree projections + the join source); fusing keeps the
        # eager cut but halves the materializations — each of which
        # is a full write of the edge set plus a serialized driver
        # job dispatch. The price is that the fused plan re-executes
        # the inner round's semi-joins per consumer — map-side-only
        # work over the (already checkpointed, monotonically
        # shrinking) previous edge set, with the inner degree
        # exchange and broadcast build shared via exchange reuse —
        # while each saved checkpoint was a full pass + storage of
        # the same data AND a driver round trip that no cluster size
        # can shrink. Values are unchanged: the peel sequence is
        # identical, only the materialization cadence moved.
        rounds_left = KCORE_ROUNDS
        prev_ckpt = edges  # checkpoint from which e_{K-1} is derivable
        last_step_fused = False
        while rounds_left >= 2:
            prev_ckpt = edges
            edges = audited_checkpoint("kcore_round2", _peel(_peel(edges)))
            last_step_fused = True
            rounds_left -= 2
        if rounds_left == 1:
            prev_ckpt = edges
            edges = audited_checkpoint("kcore_round2", _peel(edges))
            last_step_fused = False
        cnt_last = edges.agg(F.expr("count(1) AS _c_last"))
        # Convergence test needs |e_{K-1}|. Under fusion e_{K-1} is
        # not materialized; replay ONE round lazily from the previous
        # checkpoint inside the output job (a bounded degree shuffle +
        # map pass) instead of paying a whole extra checkpoint for it.
        prev = _peel(prev_ckpt) if last_step_fused else prev_ckpt
        cnt_prev = prev.agg(F.expr("count(1) AS _c_prev"))
        out = (
            edges.selectExpr("lo AS item")
            .unionAll(edges.selectExpr("hi AS item"))
            .groupBy("item")
            .agg(F.expr("CAST(count(1) AS BIGINT) AS core_deg"))
            .filter(f"core_deg >= {KCORE_K}")
            .crossJoin(F.broadcast(cnt_last))  # 1-row scalar
            .crossJoin(F.broadcast(cnt_prev))  # 1-row scalar
            .selectExpr("item", "core_deg", "_c_last = _c_prev AS converged")
        )
        # The return cut is the leaf every CONSUMER plan scans — it
        # must carry its own capture tag (id-matched, round 7), the
        # per-round tags live below it.
        return audited_checkpoint("kcore_out_pre", out)
