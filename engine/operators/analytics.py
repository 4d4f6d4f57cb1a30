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
