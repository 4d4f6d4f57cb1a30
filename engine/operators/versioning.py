"""Corpus snapshot versioning — the diff between two PUBLISHED corpus
versions on disk (composition #3, after the capstone build and the
incremental refresh).

A production corpus is rebuilt or refreshed on a cadence; before a new
version is promoted to training, the operator every data team runs is
the VERSION DIFF: which documents appeared, disappeared, or changed
between snapshot v1 and snapshot v2, per source, and by how many
tokens did the corpus move. This module makes that a first-class,
oracled operator that runs THROUGH the sink:

    documents ──v1 slice──────────────→ WRITE v1 (staged + atomic rename)
    documents ──v2 slice + revisions──→ WRITE v2 (staged + atomic rename)
    re-read BOTH published snapshots  → snapshot_diff → per-source
    (added / removed / changed / unchanged, token delta, diff hash)

The returned summary is computed from the RE-READ files of both
versions, so the driver's value hash pins two sink round-trips AND the
diff logic; the DuckDB oracle replays the identical v1/v2 definitions
from the raw parquet and diffs them relationally.

100 TB shape — the part that matters at scale:

* Snapshots store a ROW HASH column (`h`, the shared 60-bit md5
  construction over doc_id + text) computed once at write time. The
  diff then never touches document bodies: its scans read exactly
  (source, doc_id, n_tokens, h) — `text` is pruned at the parquet
  footer (asserted by test_versioning.py against ReadSchema) — so a
  100 TB corpus pair diffs by scanning a few hundred GB of narrow
  columns.
* The only shuffle is the full-outer hash join on doc_id carrying
  ~24 bytes/row (id + hash + token count). No all-pairs, no sort.
* Both sides are partitioned by source; a diff scoped to one source
  (the common "did books change?" question) partition-prunes both
  scans. The aggregate after the join is a partial-agg groupBy on the
  low-cardinality source key.

Reference parity note: the reference engine (485-p4-mapreduce) has no
versioning layer — this is Layer-B capability motivated by SURVEY.md
§6's training-data pipeline mandate, same as dedup/ANN.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.functions.hashing import DUCK_H60, SPARK_H60
from engine.io import load_table
from engine.operators.corpus_build import corpus_out_dir
from engine.registry import query

# -- deterministic snapshot definitions (both engines) -----------------------
#
# v1 = the 90% h60('v1:'-keyed) slice of documents, text as-is.
# v2 = the (different) 90% h60('v2:'-keyed) slice; docs in the
#      h60('rev:'-keyed) 1-in-7 slice carry a deterministic revision
#      (text + ' [rev2]'). The three independent keyed slices make all
#      four diff classes non-empty: added (in v2 only), removed (in v1
#      only), changed (in both, revised), unchanged (in both, as-is).

_IN_V1_SPARK = SPARK_H60.format(x="concat('v1:', cast(doc_id as string))") + " % 10 <> 0"
_IN_V1_DUCK = DUCK_H60.format(x="'v1:' || CAST(doc_id AS VARCHAR)") + " % 10 <> 0"
_IN_V2_SPARK = SPARK_H60.format(x="concat('v2:', cast(doc_id as string))") + " % 10 <> 0"
_IN_V2_DUCK = DUCK_H60.format(x="'v2:' || CAST(doc_id AS VARCHAR)") + " % 10 <> 0"
_IS_REV_SPARK = SPARK_H60.format(x="concat('rev:', cast(doc_id as string))") + " % 7 = 0"
_IS_REV_DUCK = DUCK_H60.format(x="'rev:' || CAST(doc_id AS VARCHAR)") + " % 7 = 0"

# Row hash stored IN the snapshot at write time ({t} = text expression).
_ROW_H_SPARK = SPARK_H60.format(x="concat('row:', cast(doc_id as string), ':', text)")
_ROW_H_DUCK = DUCK_H60.format(x="'row:' || CAST(doc_id AS VARCHAR) || ':' || text")

# Per-diff-row hash term, xor-combined per source (order-independent;
# (status, doc_id) pairs are unique so xor self-cancellation cannot
# occur). Unchanged rows contribute nothing — the diff hash pins the
# DELTA, not the corpus.
_DIFF_H_SPARK = SPARK_H60.format(
    x="concat('diff:', status, ':', cast(doc_id as string))"
)
_DIFF_H_DUCK = DUCK_H60.format(
    x="'diff:' || status || ':' || CAST(doc_id AS VARCHAR)"
)


def _publish_snapshot(spark: SparkSession, rows: DataFrame, out: str) -> str:
    """Write a snapshot (schema: source, doc_id, n_tokens, h, text) to
    ``out``, partitioned by source, via staging + atomic rename — a
    reader only ever sees a complete version."""
    from engine.sinks import _publish_via_rename

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    staging = tempfile.mkdtemp(prefix="snap-", dir=os.path.dirname(out) or ".")
    try:
        rows.write.mode("overwrite").partitionBy("source").parquet(staging)
        _publish_via_rename(staging, out, "snap")
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return out


def _snapshot_rows(docs: DataFrame) -> DataFrame:
    """The stored snapshot schema, with the row hash and token count
    computed ONCE at write time so every later diff scans only narrow
    columns."""
    return docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.expr(_ROW_H_SPARK).cast("bigint").alias("h"),
        "text",
    )


def snapshot_diff(spark: SparkSession, path_a: str, path_b: str) -> DataFrame:
    """Diff two stored snapshots (schema of `_snapshot_rows`): one row
    per source with added/removed/changed/unchanged counts, the signed
    token delta, and the xor-combined delta hash. Reads ONLY
    (source, doc_id, n_tokens, h) from each side — document bodies are
    pruned at the scan — and shuffles one full-outer hash join on
    doc_id."""
    a = (
        spark.read.parquet(path_a)
        .select(
            F.col("doc_id"),
            F.col("source").alias("a_src"),
            F.col("n_tokens").alias("a_tok"),
            F.col("h").alias("a_h"),
        )
    )
    b = (
        spark.read.parquet(path_b)
        .select(
            F.col("doc_id"),
            F.col("source").alias("b_src"),
            F.col("n_tokens").alias("b_tok"),
            F.col("h").alias("b_h"),
        )
    )
    j = a.join(b, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("a_src", "b_src").alias("source"),
        "a_tok",
        "b_tok",
        F.when(F.col("a_h").isNull(), "added")
        .when(F.col("b_h").isNull(), "removed")
        .when(F.col("a_h") != F.col("b_h"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    zero = F.lit(0).cast("bigint")
    return j.groupBy("source").agg(
        F.sum(F.when(F.col("status") == "added", 1).otherwise(0))
        .cast("bigint")
        .alias("n_added"),
        F.sum(F.when(F.col("status") == "removed", 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        F.sum(F.when(F.col("status") == "changed", 1).otherwise(0))
        .cast("bigint")
        .alias("n_changed"),
        F.sum(F.when(F.col("status") == "unchanged", 1).otherwise(0))
        .cast("bigint")
        .alias("n_unchanged"),
        F.sum(F.coalesce("b_tok", zero) - F.coalesce("a_tok", zero))
        .cast("bigint")
        .alias("tok_delta"),
        F.coalesce(
            F.expr(
                "bit_xor(CASE WHEN status <> 'unchanged' THEN "
                + _DIFF_H_SPARK
                + " END)"
            ),
            zero,
        )
        .cast("bigint")
        .alias("diff_h"),
    )


_DIFF_ORACLE = f"""
WITH v1 AS (
  SELECT source, doc_id, text FROM documents WHERE {_IN_V1_DUCK}
),
v2 AS (
  SELECT source, doc_id,
         CASE WHEN {_IS_REV_DUCK} THEN text || ' [rev2]' ELSE text END AS text
  FROM documents WHERE {_IN_V2_DUCK}
),
a AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS a_tok,
         {_ROW_H_DUCK} AS a_h
  FROM v1
),
b AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS b_tok,
         {_ROW_H_DUCK} AS b_h
  FROM v2
),
j AS (
  SELECT COALESCE(a.source, b.source) AS source,
         COALESCE(a.doc_id, b.doc_id) AS doc_id,
         a.a_tok, b.b_tok,
         CASE WHEN a.a_h IS NULL THEN 'added'
              WHEN b.b_h IS NULL THEN 'removed'
              WHEN a.a_h <> b.b_h THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM a FULL JOIN b ON a.doc_id = b.doc_id
)
SELECT source,
       CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_added,
       CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unchanged,
       CAST(sum(COALESCE(b_tok, 0) - COALESCE(a_tok, 0)) AS BIGINT)
         AS tok_delta,
       CAST(COALESCE(bit_xor(CASE WHEN status <> 'unchanged'
                             THEN {_DIFF_H_DUCK} END), 0) AS BIGINT)
         AS diff_h
FROM j GROUP BY source
"""


@query(
    "corpus_snapshot_diff",
    oracle=_DIFF_ORACLE,
    tags=("pipeline", "capstone", "versioning", "sink", "documents"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition #3 (module docstring): publish corpus snapshots v1
    and v2 (each staged + atomically renamed, partitioned by source,
    row hash stored at write time), RE-READ both published versions,
    and diff them — per source: docs added / removed / changed /
    unchanged, the signed token delta, and the xor-combined h60 hash
    over the delta rows. The summary is computed from the re-read
    files of BOTH versions, so the driver's value hash pins two sink
    round-trips plus the diff join against the oracle's raw-table
    replay. Side-effecting by design; re-runs republish both versions
    atomically."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "text"
    )
    v1 = docs.filter(F.expr(_IN_V1_SPARK))
    v2 = docs.filter(F.expr(_IN_V2_SPARK)).select(
        "source",
        "doc_id",
        F.when(F.expr(_IS_REV_SPARK), F.concat("text", F.lit(" [rev2]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    base = corpus_out_dir(sf_dir)
    out1 = _publish_snapshot(spark, _snapshot_rows(v1), base + "_v1")
    out2 = _publish_snapshot(spark, _snapshot_rows(v2), base + "_v2")
    return snapshot_diff(spark, out1, out2)
