"""Retrieve-then-rerank: ANN candidates re-scored by an Arrow-batched
cross-encoder (model stubbed deterministically).

The two-stage retrieval shape every production RAG / retrieval
pipeline runs: a cheap recall stage (here the oracled brute-force
cosine top-k; at scale `sign_lsh_near_dups` / IVF-PQ) hands a BOUNDED
candidate set (|queries| × k rows) to an expensive pointwise scorer.
The scorer is the canonical GPU-batch-inference slot: ``mapInPandas``
feeds Arrow record batches of (query_text, candidate_text) pairs to
Python — a real cross-encoder forward pass drops into ``_score``
unchanged. No such model ships in this container, so the stub scores
with the engine's shared md5-derived 60-bit hash, which the DuckDB
oracle recomputes exactly — checking the whole Python/Arrow round
trip, the candidate plumbing, and the rerank window.

Scale shape: stage 1 is the documented ANN path; stage 2 touches only
|queries| × k rows (candidates broadcast to join text, never a corpus
shuffle), so the expensive model runs on a set whose size the
retriever controls. vec_id ↔ doc_id is the fixtures' workload-defined
join (FIXTURES.md join graph).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from engine.functions.hashing import DUCK_H60, h60_py
from engine.io import load_table
from engine.registry import query
from engine.operators.similarity import (
    _DUCK_DOT,
    _DUCK_EMB,
    N_QUERIES,
    TOPK,
    ann_cosine_topk,
)

RERANK_K = 3  # final results per query after rerank
_SEP = "\x1f"
_PPM = 1000000

_RERANK_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
        T.StructField("model_score_ppm", T.LongType()),
    ]
)

# Candidate stage composed from similarity.py's SHARED constants
# (_DUCK_EMB embedding CTE + _DUCK_DOT) — the Spark side consumes
# ann_cosine_topk directly, so the oracle must define candidates with
# the same arithmetic; a hand-copied CTE here drifted independently
# of the definitions it mirrors.
_DUCK_CAND = f"""
{_DUCK_EMB},
q AS (SELECT vec_id AS query_id, emb AS qe, nrm AS qn
      FROM e WHERE vec_id < {N_QUERIES}),
s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             round({_DUCK_DOT.format(a='q.qe', b='e.emb')} / (q.qn * e.nrm), 6)
               AS cos_sim
      FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
cand AS (SELECT query_id, neighbor_id, cos_sim FROM (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
             ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM s) t WHERE rn <= {TOPK})
"""


def _score(q_text: str, d_text: str) -> int:
    """Stub cross-encoder: deterministic 60-bit hash of the pair,
    folded to parts-per-million. A real model replaces this body."""
    return h60_py(q_text + _SEP + d_text) % _PPM


@query(
    "rerank_cross_encoder",
    oracle=f"""
WITH {_DUCK_CAND}
SELECT query_id, neighbor_id, cos_sim, model_score_ppm,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT p.*, row_number() OVER (PARTITION BY query_id
             ORDER BY model_score_ppm DESC, neighbor_id) AS rnk
  FROM (
    SELECT c.query_id, c.neighbor_id, c.cos_sim,
           {DUCK_H60.format(x="qd.text || chr(31) || nd.text")} % {_PPM}
             AS model_score_ppm
    FROM cand c
    JOIN documents qd ON qd.doc_id = c.query_id
    JOIN documents nd ON nd.doc_id = c.neighbor_id
  ) p
) t WHERE rnk <= {RERANK_K}
""",
    tags=("similarity", "rerank", "inference"),
    exported=False,
)
def rerank_cross_encoder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval (see module docstring): brute cosine top-k
    candidates → Arrow-batched stub cross-encoder → per-query rerank,
    keep RERANK_K."""
    cands = ann_cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", "cos_sim"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    q_docs = docs.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("q_text")
    )
    # Candidates are |queries| × k rows — broadcast them against the
    # corpus text; the corpus is never shuffled for stage 2.
    pairs = F.broadcast(
        F.broadcast(cands).join(q_docs, "query_id")
    ).join(docs.withColumnRenamed("text", "d_text"), docs.doc_id == cands.neighbor_id)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "cos_sim": pdf["cos_sim"],
                    "model_score_ppm": [
                        _score(q, d)
                        for q, d in zip(pdf["q_text"], pdf["d_text"])
                    ],
                }
            )

    scored = pairs.select(
        "query_id", "neighbor_id", "cos_sim", "q_text", "d_text"
    ).mapInPandas(batches, _RERANK_SCHEMA)
    w = W.partitionBy("query_id").orderBy(
        F.col("model_score_ppm").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= RERANK_K)
        .select("query_id", "neighbor_id", "cos_sim", "model_score_ppm", "rnk")
    )
