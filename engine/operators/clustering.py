"""Embedding clustering (Lloyd k-means) and SemDeDup semantic dedup.

The reference has no vector operators at all (SURVEY.md §2.3 — its
surface is map/reduce over text lines, ``worker/__main__.py:55-58``);
this is Layer-B capability for the LLM-data-pipeline mandate: cluster
the corpus embedding space, then deduplicate semantically *within*
clusters (Abbas et al., "SemDeDup", arXiv:2303.09540 — k-means makes
the pairwise stage tractable by turning corpus² comparisons into
sum-over-clusters |cluster|²).

Cross-engine determinism (the oracle hash-checks every row):
- init centroids are the first KM_K vectors by vec_id (no RNG);
- distances are the same in-order IEEE fold on both engines
  (``aggregate(zip_with(...))`` ⇔ ``list_dot_product`` of the diff);
- argmin ties break on centroid id;
- each Lloyd update aggregates dimension values on a 1e-6 integer
  grid as BIGINT (order-free, exact) and ROUNDS the new centroid to 6
  dp with the shared identical-IEEE rounding, so both engines feed
  bit-identical centroids into the next iteration.

100 TB shape: per iteration, one broadcast of K centroids against the
corpus (narrow, no shuffle) + one (cluster, dim) shuffle bounded by
K × dim groups. The SemDeDup pair stage self-joins on cluster — skew
is governed by cluster granularity, so at scale K grows with the
corpus (the paper uses K ≈ 10k for 5B docs) keeping |cluster| bounded;
here K is small because the fixture is.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from engine.functions.rounding import duck_round_he, round_he, sql_round_he
from engine.registry import query
from engine.operators.similarity import _DUCK_EMB, _SPARK_DOT, _spark_emb

# Cluster count. The fixture default is 8; the documented scale
# contract is "K grows with the corpus so clusters stay bounded"
# (SCALE_PROBE.md measures the difference: 27.8 s vs 8.5 s at 10x
# data). SPARK_GRAFT_KM_K makes that contract operational — it is
# read ONCE at import, before the oracle SQL strings are formatted,
# so the Spark plan and its DuckDB oracle always agree on K.
import itertools as _itertools
import os as _os

KM_K = int(_os.environ.get("SPARK_GRAFT_KM_K", "8"))
KM_UPDATES = 2  # Lloyd centroid updates (assign → update, twice)
KM_Q = 1000000.0  # 1e-6 integer grid for centroid-mean aggregation
SEM_COS = 0.4  # within-cluster cosine threshold for semantic dups

# -- DuckDB oracle chain ---------------------------------------------------

_DUCK_D2 = (
    "list_dot_product("
    "list_transform(range(1, len(e.emb) + 1), i -> e.emb[i] - c.cvec[i]),"
    "list_transform(range(1, len(e.emb) + 1), i -> e.emb[i] - c.cvec[i]))"
)

_MEAN6 = duck_round_he(
    f"CAST(sq AS DOUBLE) / n / CAST({KM_Q!r} AS DOUBLE)", 6
)


def _duck_assign(cents: str, aname: str, base: str = "e") -> str:
    return f"""{aname} AS (
  SELECT vec_id, emb, nrm, cid AS cluster, d2 FROM (
    SELECT vec_id, emb, nrm, cid, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid) AS rn
    FROM (
      SELECT e.vec_id, e.emb, e.nrm, c.cid, {_DUCK_D2} AS d2
      FROM {base} e CROSS JOIN {cents} c
    ) s
  ) t WHERE rn = 1
)"""


def _duck_dims(a: str, dname: str) -> str:
    return f"""{dname} AS (
  SELECT cluster, CAST(i - 1 AS BIGINT) AS dim_i,
         CAST(sum(CAST(floor(emb[i] * CAST({KM_Q!r} AS DOUBLE)) AS BIGINT))
              AS BIGINT) AS sq,
         count(*) AS n
  FROM {a} CROSS JOIN unnest(range(1, len(emb) + 1)) AS r(i)
  GROUP BY 1, 2
)"""


def _duck_cents(dname: str, cname: str) -> str:
    return f"""{cname} AS (
  SELECT cluster AS cid, list({_MEAN6} ORDER BY dim_i) AS cvec
  FROM {dname} GROUP BY cluster
)"""


def _duck_chain() -> str:
    """WITH-chain producing a{{0..KM_UPDATES}} and the final dim stats
    ``cf_dims`` (one update past the last assignment)."""
    parts = [
        _DUCK_EMB,
        f"c0 AS (SELECT vec_id AS cid, emb AS cvec FROM e WHERE vec_id < {KM_K})",
    ]
    for t in range(KM_UPDATES):
        parts.append(_duck_assign(f"c{t}", f"a{t}"))
        parts.append(_duck_dims(f"a{t}", f"d{t + 1}"))
        parts.append(_duck_cents(f"d{t + 1}", f"c{t + 1}"))
    parts.append(_duck_assign(f"c{KM_UPDATES}", f"a{KM_UPDATES}"))
    parts.append(_duck_dims(f"a{KM_UPDATES}", "cf_dims"))
    return "WITH " + ",\n".join(parts)


_AF = f"a{KM_UPDATES}"  # final assignment CTE name

# -- Spark side ------------------------------------------------------------

_SPARK_D2 = (
    "aggregate(zip_with(emb, cvec, (x, c) -> (x - c) * (x - c)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)


def _update_dims(assign: DataFrame) -> DataFrame:
    return (
        assign.selectExpr("cluster", "posexplode(emb) AS (dim_i, val)")
        .selectExpr(
            "cluster",
            "CAST(dim_i AS BIGINT) AS dim_i",
            f"CAST(floor(val * {KM_Q!r}D) AS BIGINT) AS q",
        )
        .groupBy("cluster", "dim_i")
        .agg(
            F.expr("CAST(sum(q) AS BIGINT) AS sq"),
            F.expr("CAST(count(1) AS BIGINT) AS n"),
        )
    )


# One temp-view name per _lloyd* call — the name never affects results
# (canonicalized plans strip aliases), it only avoids cross-talk if two
# chains are ever built concurrently in one session.
_LLOYD_VIEW_SEQ = _itertools.count()


def _lloyd_sql_texts(base: str, k: int, updates: int, extras: list[str]) -> tuple[str, str]:
    """The Lloyd chain as two Spark-SQL texts over nested INLINE
    subqueries (the engine twin of ``_duck_chain``): returns
    ``(assignment_sql, centroids_sql)`` for the final round.

    Assignment is a min_by aggregate: broadcast the K centroids, score
    each (vector, centroid) map-side with the same in-order IEEE fold
    as the oracle, and take per-vector ``min_by(payload, (d2, cid))`` —
    the lexicographic ordering struct reproduces the oracle's
    row_number tie-break exactly (cid is unique per vector, so the min
    is unique). Shuffle shape: each vector's K scored rows are
    co-located (they come from one input row via the broadcast), so
    the partial aggregate collapses them map-side and the exchange
    carries n rows. A fully row-local array-expression argmin would
    shuffle nothing, but interpreted higher-order functions measured
    ~70% slower than this codegen'd aggregate at bench scale.

    SQL text, not Column chains (round 12, guide §4 at plan-build
    time): the chain resolves in ONE parse per output instead of ~80
    structural py4j round trips per subspace — same analyzed plan,
    same values (oracle hash-exact). Inline subqueries rather than a
    WITH clause, deliberately: CTEs analyze to WithCTE/CTERelationRef
    nodes whose ids defeat CacheManager's sameResult matching, so the
    persisted centroids/assignment in ann_pq_adc_topk would stop being
    substituted into sibling plans (measured: the armed plan audit saw
    the centroid chain's exchanges DOUBLE under the WITH form). Plain
    nested subqueries canonicalize exactly like the old Column-chain
    plans, keeping both the within-query reuse and the
    embedding_pq ↔ ann_pq_adc_topk facet cache-share."""
    cols = ["emb"] + extras
    payload = ", ".join(cols + ["cid", "_d2"])
    unpack = ", ".join(
        ["vec_id"]
        + [f"_b.{c} AS {c}" for c in cols]
        + ["_b.cid AS cluster", "_b._d2 AS d2"]
    )
    ecols = ", ".join(["e.vec_id"] + [f"e.{c}" for c in cols])
    mean6 = sql_round_he(f"CAST(sq AS DOUBLE) / n / {KM_Q!r}D", 6)

    def assign(c_sql: str) -> str:
        return f"""(
  SELECT {unpack}
  FROM (
    SELECT vec_id, min_by(struct({payload}), struct(_d2, cid)) AS _b
    FROM (
      SELECT /*+ BROADCAST(c) */ {ecols}, c.cid, {_SPARK_D2} AS _d2
      FROM {base} e CROSS JOIN {c_sql} c
    ) GROUP BY vec_id
  )
)"""

    def cents_of(a_sql: str) -> str:
        dims = f"""(
  SELECT cluster, dim_i, CAST(sum(q) AS BIGINT) AS sq,
         CAST(count(1) AS BIGINT) AS n
  FROM (
    SELECT cluster, CAST(dim_i AS BIGINT) AS dim_i,
           CAST(floor(val * {KM_Q!r}D) AS BIGINT) AS q
    FROM (SELECT cluster, posexplode(emb) AS (dim_i, val) FROM {a_sql})
  ) GROUP BY cluster, dim_i
)"""
        return f"""(
  SELECT cid, transform(array_sort(collect_list(struct(dim_i, cval))),
              s -> s.cval) AS cvec
  FROM (SELECT cluster AS cid, dim_i, {mean6} AS cval FROM {dims})
  GROUP BY cid
)"""

    c_sql = (
        f"(SELECT vec_id AS cid, emb AS cvec FROM {base}"
        f" WHERE vec_id < {k})"
    )
    a_sql = assign(c_sql)
    for _ in range(updates):
        c_sql = cents_of(a_sql)
        a_sql = assign(c_sql)
    return f"SELECT * FROM {a_sql}", f"SELECT * FROM {c_sql}"


def _lloyd_full(e: DataFrame, k: int, updates: int) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd chain over any (vec_id, emb[, ...]) frame:
    init = first k vectors by id, then ``updates`` assign→update
    rounds. Returns (final assignment, final centroids) — the final
    assignment is computed against the final centroids. Both outputs
    are single-parse SQL texts sharing the same nested-subquery chain;
    a caller that persists one (ann_pq_adc_topk persists the centroids
    and the assignment) still shares it with the other via
    CacheManager subtree substitution, exactly as the Column-chain
    form did (see _lloyd_sql_texts on why NOT a WITH clause)."""
    spark = e.sparkSession
    view = f"_lloyd_src_{next(_LLOYD_VIEW_SEQ)}"
    e.createOrReplaceTempView(view)
    extras = [c for c in e.columns if c not in ("vec_id", "emb")]
    a_sql, c_sql = _lloyd_sql_texts(view, k, updates, extras)
    return spark.sql(a_sql), spark.sql(c_sql)


def _lloyd(e: DataFrame, k: int, updates: int) -> DataFrame:
    return _lloyd_full(e, k, updates)[0]


def kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final Lloyd assignment: (vec_id, emb, nrm, cluster, d2).

    Deliberately LAZY — the opposite call from the graph cores'
    eager static-pinned materialization, and a measured one: Lloyd's
    per-stage data is the CORPUS (every round re-scores n vectors),
    not a tiny iteration state, so consumers lean on AQE's runtime
    stats (broadcast conversion of the downstream cluster self-join,
    coalescing) and on inheriting a well-partitioned cache. An eager
    localCheckpoint variant (static planning, measured-width pin) made
    the chain itself faster (2.7 s → 1.5 s at sf0.1) but starved every
    downstream consumer of map-side parallelism — semantic_dedup
    regressed 2.8 s → 4.7 s in a same-session A/B, with repartitioned-
    checkpoint variants no better. Consumers that fan out persist the
    result themselves (semantic_dedup's three-consumer persist)."""
    e = _spark_emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    return _lloyd(e, KM_K, KM_UPDATES)


@query(
    "embedding_kmeans",
    oracle=f"""{_duck_chain()}
SELECT cluster, dim_i, CAST(n AS BIGINT) AS n_vecs, {_MEAN6} AS centroid
FROM cf_dims
""",
    tags=("clustering", "embedding", "kmeans"),
    exported=False,
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means over the embeddings table: KM_UPDATES deterministic
    iterations, output = final per-cluster per-dimension centroid stats
    (K × dim rows — bounded at any corpus size)."""
    dims = _update_dims(kmeans_assignments(spark, sf_dir))
    mean6 = sql_round_he(f"CAST(sq AS DOUBLE) / n / {KM_Q!r}D", 6)
    return dims.selectExpr(
        "cluster",
        "dim_i",
        "CAST(n AS BIGINT) AS n_vecs",
        f"{mean6} AS centroid",
    )


@query(
    "semantic_dedup",
    oracle=f"""{_duck_chain()},
dup AS (
  SELECT DISTINCT b.vec_id
  FROM {_AF} a JOIN {_AF} b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= {SEM_COS!r}
)
SELECT a.vec_id, a.cluster, {duck_round_he('a.d2', 6)} AS dist2,
       CAST(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
         AS is_dup
FROM {_AF} a LEFT JOIN dup d ON a.vec_id = d.vec_id
""",
    tags=("clustering", "dedup", "embedding", "semdedup", "headline"),
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-cluster the embedding space, then flag as
    duplicate any vector with a same-cluster neighbor of smaller
    vec_id at cosine ≥ SEM_COS (the kept copy is the smallest id of
    each semantic group, matching the paper's keep-one policy).
    Output: (vec_id, cluster, dist2-to-centroid, is_dup).

    The pair stage is an equi-join on cluster — work is
    sum-over-clusters |cluster|², the whole point of clustering first;
    at scale K grows so clusters stay bounded. The assignment result
    feeds three consumers (both join sides + the output anchor), so it
    is persisted — without it Spark re-runs all Lloyd iterations per
    consumer."""
    a = kmeans_assignments(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    pa = a.selectExpr(
        "vec_id AS va", "cluster AS ca", "emb AS ea", "nrm AS na"
    )
    pb = a.selectExpr(
        "vec_id AS vb", "cluster AS cb", "emb AS eb", "nrm AS nb"
    )
    cos = _SPARK_DOT.format(a="ea", b="eb") + " / (na * nb)"
    dups = (
        pa.join(pb, F.expr("ca = cb AND va < vb"))
        .selectExpr("vb", f"{cos} AS _cos")
        .filter(f"_cos >= {SEM_COS!r}D")
        .selectExpr("vb AS dup_id")
        .distinct()
    )
    return a.join(dups, F.expr("vec_id = dup_id"), "left").selectExpr(
        "vec_id",
        "cluster",
        sql_round_he("d2", 6) + " AS dist2",
        "CAST(CASE WHEN dup_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_dup",
    )


# -- Product quantization ---------------------------------------------------

PQ_M = 4  # subspaces
PQ_SUBDIM = 16  # EMB_DIM // PQ_M dims per subspace
PQ_K = 8  # codebook size per subspace (3-bit codes here; 256 at scale)
PQ_UPDATES = 2  # Lloyd updates per subspace codebook


def _duck_pq_parts() -> list[str]:
    """CTE parts producing, per subspace s: sliced base ``e{s}``, the
    codebook chain ``pc{s}{0..PQ_UPDATES}``, and the final assignment
    ``pa{s}F`` (computed against the final codebook)."""
    parts = [_DUCK_EMB]
    for s in range(PQ_M):
        lo, hi = s * PQ_SUBDIM + 1, (s + 1) * PQ_SUBDIM
        parts.append(
            f"e{s} AS (SELECT vec_id, emb[{lo}:{hi}] AS emb,"
            f" 0.0 AS nrm FROM e)"
        )
        parts.append(
            f"pc{s}0 AS (SELECT vec_id AS cid, emb AS cvec"
            f" FROM e{s} WHERE vec_id < {PQ_K})"
        )
        for t in range(PQ_UPDATES):
            parts.append(_duck_assign(f"pc{s}{t}", f"pa{s}{t}", base=f"e{s}"))
            parts.append(_duck_dims(f"pa{s}{t}", f"pd{s}{t + 1}"))
            parts.append(_duck_cents(f"pd{s}{t + 1}", f"pc{s}{t + 1}"))
        parts.append(
            _duck_assign(f"pc{s}{PQ_UPDATES}", f"pa{s}F", base=f"e{s}")
        )
    return parts


def _duck_pq_chain() -> str:
    """Per-subspace replay of the Lloyd chain over sliced embeddings,
    UNION ALL of the four final assignments as (vec_id, sub_i, code,
    err6)."""
    selects = [
        f"SELECT vec_id, CAST({s} AS BIGINT) AS sub_i,"
        f" CAST(cluster AS BIGINT) AS code,"
        f" {duck_round_he('d2', 6)} AS err6 FROM pa{s}F"
        for s in range(PQ_M)
    ]
    return (
        "WITH " + ",\n".join(_duck_pq_parts()) + "\n"
        + "\nUNION ALL\n".join(selects)
    )


@query(
    "embedding_pq",
    oracle=_duck_pq_chain(),
    tags=("embedding", "pq", "ann", "compression"),
    exported=False,
)
def embedding_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al., TPAMI 2011): split each
    embedding into PQ_M contiguous subvectors and learn an independent
    deterministic-Lloyd codebook per subspace; each vector compresses
    to PQ_M small codes (here 4×3 bits vs 64×8 bytes — the memory step
    that makes billion-vector ANN feasible; IVF-PQ = `ann_ivf_topk`'s
    coarse cells + these codes for in-cell approximate distances).

    Output: (vec_id, sub_i, code, err6) — one row per vector per
    subspace; err6 = rounded squared distance to the chosen codeword
    (the per-subspace quantization error).

    100 TB shape: per subspace and iteration, one PQ_K-row centroid
    broadcast against the corpus (no shuffle) plus one (cluster,
    dim) shuffle bounded by PQ_K × PQ_SUBDIM groups; subspaces are
    independent pipelines over the same persisted scan. Determinism
    follows the `embedding_kmeans` contract (id-ordered init,
    in-order IEEE distance folds, integer-grid centroid updates,
    argmin ties on code id) so the DuckDB replay hash-matches.
    """
    e = _spark_emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    outs = []
    for s in range(PQ_M):
        es = e.selectExpr(
            "vec_id", f"slice(emb, {s * PQ_SUBDIM + 1}, {PQ_SUBDIM}) AS emb"
        )
        a = _lloyd(es, PQ_K, PQ_UPDATES)
        outs.append(
            a.selectExpr(
                "vec_id",
                f"CAST({s} AS BIGINT) AS sub_i",
                "CAST(cluster AS BIGINT) AS code",
                sql_round_he("d2", 6) + " AS err6",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def _duck_adc_sql() -> str:
    from engine.operators.similarity import N_QUERIES, TOPK

    parts = _duck_pq_parts()
    for s in range(PQ_M):
        lo, hi = s * PQ_SUBDIM + 1, (s + 1) * PQ_SUBDIM
        parts.append(
            f"q{s} AS (SELECT vec_id AS qid, emb[{lo}:{hi}] AS qe"
            f" FROM e WHERE vec_id < {N_QUERIES})"
        )
        parts.append(
            f"""adc{s} AS (
  SELECT q.qid, c.cid AS code,
         list_dot_product(
           list_transform(range(1, len(q.qe) + 1), i -> q.qe[i] - c.cvec[i]),
           list_transform(range(1, len(q.qe) + 1), i -> q.qe[i] - c.cvec[i]))
           AS pd2
  FROM q{s} q CROSS JOIN pc{s}{PQ_UPDATES} c
)"""
        )
        parts.append(
            f"codes{s} AS (SELECT vec_id, cluster AS code FROM pa{s}F)"
        )
    joins = "\n".join(
        f"  JOIN codes{s} v{s} ON v{s}.vec_id = v0.vec_id\n"
        f"  JOIN adc{s} a{s} ON a{s}.code = v{s}.code AND a{s}.qid = a0.qid"
        for s in range(1, PQ_M)
    )
    total = "(((a0.pd2 + a1.pd2) + a2.pd2) + a3.pd2)"
    parts.append(
        f"""scored AS (
  SELECT a0.qid AS query_id, v0.vec_id AS neighbor_id, {total} AS adc_d2
  FROM codes0 v0
  JOIN adc0 a0 ON a0.code = v0.code
{joins}
  WHERE v0.vec_id <> a0.qid
)"""
    )
    with_parts = ",\n".join(parts)
    return f"""WITH {with_parts}
SELECT query_id, neighbor_id, {duck_round_he("adc_d2", 6)} AS adc_d2, rn
FROM (
  SELECT query_id, neighbor_id, adc_d2,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY adc_d2 ASC, neighbor_id) AS BIGINT) AS rn
  FROM scored
) t WHERE rn <= {TOPK}
"""


@query(
    "ann_pq_adc_topk",
    oracle=_duck_adc_sql(),
    tags=("embedding", "pq", "ann"),
    exported=False,
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k (the search half of IVF-PQ): each
    query precomputes a PQ_M × PQ_K table of exact subvector→codeword
    distances, and every corpus vector is scored by summing the four
    looked-up entries for its codes — the corpus embeddings are never
    touched at query time, only the 4-code compressed form.

    100 TB shape: the ADC tables are |queries| × M × K rows (broadcast
    to every executor); scoring is M broadcast hash joins on code ids
    over the compressed corpus, then a per-query bounded top-k window.
    Partial distances sum in fixed left-to-right subspace order on
    both engines, so the oracle hash-matches."""
    from engine.operators.similarity import N_QUERIES, TOPK

    e = _spark_emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    parts = []
    for s in range(PQ_M):
        es = e.selectExpr(
            "vec_id", f"slice(emb, {s * PQ_SUBDIM + 1}, {PQ_SUBDIM}) AS emb"
        )
        a, cents = _lloyd_full(es, PQ_K, PQ_UPDATES)
        # Both the final assignment and the ADC table consume the
        # codebook; cache its K rows so the Lloyd chain runs once per
        # subspace instead of twice. The final assignment is cached
        # too: `embedding_pq` builds the IDENTICAL plan, so inside the
        # federated `embedding_suite` its facet cache-hits this one
        # instead of re-scoring the corpus per subspace.
        cents = cents.persist(StorageLevel.MEMORY_AND_DISK)
        a = a.persist(StorageLevel.MEMORY_AND_DISK)
        qs = es.filter(f"vec_id < {N_QUERIES}").selectExpr(
            "vec_id AS qid", "emb"
        )
        adc = qs.join(F.broadcast(cents)).selectExpr(  # Q × K rows — tiny
            "qid", "cid AS code", f"{_SPARK_D2} AS _pd"
        )
        codes = a.selectExpr("vec_id", "cluster AS code")
        parts.append(
            codes.join(F.broadcast(adc), "code").selectExpr(
                "vec_id", "qid", f"{s} AS _sub", "_pd"
            )
        )
    # Assemble per-(vector, query) scores with ONE shuffle: union the
    # tagged subspace frames (narrow — each is a map-side broadcast
    # join) and pivot the M partial distances out with conditional
    # sums. Each (vec, qid, sub) appears exactly once, so every
    # conditional sum folds a single value — exact regardless of
    # aggregation order — and the M partials are then added in the
    # same fixed left-to-right subspace order as the oracle. The
    # previous form joined the four frames pairwise on (vec_id, qid):
    # three shuffle joins where one grouped aggregate suffices.
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionAll(p)
    scored = allp.groupBy("vec_id", "qid").agg(
        *[
            F.expr(f"sum(CASE WHEN _sub = {s} THEN _pd END) AS pd{s}")
            for s in range(PQ_M)
        ]
    )
    return (
        scored.filter("vec_id <> qid")
        .selectExpr(
            "vec_id", "qid", "((pd0 + pd1) + pd2) + pd3 AS _adc"
        )
        .selectExpr(
            "vec_id",
            "qid",
            "_adc",
            "CAST(row_number() OVER (PARTITION BY qid"
            " ORDER BY _adc ASC, vec_id) AS BIGINT) AS rn",
        )
        .filter(f"rn <= {TOPK}")
        .selectExpr(
            "qid AS query_id",
            "vec_id AS neighbor_id",
            sql_round_he("_adc", 6) + " AS adc_d2",
            "rn",
        )
    )
