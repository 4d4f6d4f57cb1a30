"""Empirical scale probe: build a derived ~sf1 fixture (10x sf0.1) and
run the headline suite once at each scale, recording per-query scaling.

The driver ships fixtures only up to sf0.1, so the 10x fixture is
DERIVED deterministically from sf0.1 — 10 key-shifted copies with the
referential structure preserved per copy and cross-copy similarity
deliberately broken, so similarity/dedup/graph workloads scale in
problem size rather than degenerating into 10x-duplicate pathologies:

- fact/dim entity keys shift by copy*OFFSET, consistently across
  referencing tables (orders.o_custkey shifts with customer.c_custkey,
  lineitem with orders/part/supplier), so joins behave like a bigger
  TPC-H instance, not a 10-way cross-wiring;
- nation/region (bounded dims referenced by unshifted nationkeys) stay
  single-copy;
- events shift event/user ids AND the item id inside props, so the
  co-purchase graph gains 10x nodes and edges instead of 10x edge
  multiplicity on the same nodes;
- document text is letter-rotated per copy (word lengths, counts and
  whitespace structure preserved — text-stats costs stay honest) so
  shingle spaces are disjoint across copies and near-dup neighborhoods
  stay copy-local;
- embeddings roll the vector by copy index (norm-preserving) so
  cosine neighborhoods don't collapse into 10x duplicates.

Usage:
  python tools/scale_probe.py build   # write the sf1 fixture (once)
  python tools/scale_probe.py run     # time headliners at sf0.1 + sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.io import load_table
from engine.registry import all_queries_including_library
from engine.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scale_probe_sf1"
)
N_COPIES = 10
OFFSET = 100_000_000

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _rot_alpha(i: int) -> str:
    return _ALPHA[i:] + _ALPHA[:i]


def _copies(df: DataFrame, fn) -> DataFrame:
    out = None
    for i in range(N_COPIES):
        c = fn(df, i, i * OFFSET)
        out = c if out is None else out.unionAll(c)
    return out


def _shift(df: DataFrame, cols: list[str]):
    def fn(d, i, off):
        for c in cols:
            d = d.withColumn(c, (F.col(c) + F.lit(off)).cast("bigint"))
        return d

    return _copies(df, fn)


def build(spark: SparkSession) -> None:
    os.makedirs(DST, exist_ok=True)

    def write(name: str, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(os.path.join(DST, f"{name}.parquet"))
        print(f"built {name}")

    # bounded dims referenced by unshifted nationkey: single copy
    for t in ("region", "nation"):
        write(t, load_table(spark, SRC, t))
    write("customer", _shift(load_table(spark, SRC, "customer"), ["c_custkey"]))
    write("supplier", _shift(load_table(spark, SRC, "supplier"), ["s_suppkey"]))
    write("part", _shift(load_table(spark, SRC, "part"), ["p_partkey"]))
    write(
        "orders",
        _shift(load_table(spark, SRC, "orders"), ["o_orderkey", "o_custkey"]),
    )
    write(
        "lineitem",
        _shift(
            load_table(spark, SRC, "lineitem"),
            ["l_orderkey", "l_partkey", "l_suppkey"],
        ),
    )

    def ev_fn(d, i, off):
        k = F.get_json_object("props", "$.k").cast("bigint")
        return d.select(
            (F.col("event_id") + F.lit(off)).cast("bigint").alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(off)).cast("bigint").alias("user_id"),
            "event_type",
            "value",
            F.when(
                k.isNotNull(),
                F.concat(
                    F.lit('{"k": '),
                    (k + F.lit(off)).cast("string"),
                    F.lit("}"),
                ),
            )
            .otherwise(F.col("props"))
            .alias("props"),
        )

    write("events", _copies(load_table(spark, SRC, "events"), ev_fn))

    def doc_fn(d, i, off):
        rot = _rot_alpha(i)
        return d.select(
            (F.col("doc_id") + F.lit(off)).cast("bigint").alias("doc_id"),
            F.translate("text", _ALPHA, rot).alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    write("documents", _copies(load_table(spark, SRC, "documents"), doc_fn))

    def emb_fn(d, i, off):
        if i == 0:
            rolled = F.col("embedding")
        else:
            rolled = F.expr(
                f"concat(slice(embedding, {i + 1}, size(embedding) - {i}),"
                f" slice(embedding, 1, {i}))"
            )
        return d.select(
            (F.col("vec_id") + F.lit(off)).cast("bigint").alias("vec_id"),
            rolled.cast("array<float>").alias("embedding"),
            "label",
        )

    write("embeddings", _copies(load_table(spark, SRC, "embeddings"), emb_fn))


# Heaviest non-headliner plans (PLANS.md X=44/25/19) — probed alongside
# the headline set per VERDICT r3 #4: a fat federation whose exchanges
# sum across facets still has to scale ~linearly per facet.
EXTRA_PROBE = (
    "embedding_suite",
    "events_lifecycle_analytics",
    "corpus_mining",
)


def run(spark: SparkSession, only: list[str] | None = None) -> dict:
    # including library: round-5 probes cover the new library
    # operators (substring spans, temperature mix, stream-stream
    # join) via the `only` subset path.
    specs = all_queries_including_library()
    names = sorted(n for n, s in specs.items() if "headline" in s.tags)
    names += [n for n in EXTRA_PROBE if n in specs and n not in names]
    if only:
        unknown = set(only) - set(specs)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        names = [n for n in names if n in only] + [
            n for n in only if n not in names
        ]
    # Warm codegen/Arrow/broadcast paths at the tiny sf first (the
    # bench.py discipline) — without this the first few sf0.1 numbers
    # absorb JVM warmup and the ratios read sub-linear.
    for name in names:
        try:
            specs[name].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass
    spark.catalog.clearCache()
    result: dict[str, dict[str, float]] = {}
    # Median of 3 per (query, scale): the probe's product is the
    # RATIO, and on a shared host a single contended run corrupts
    # numerator or denominator by 5-10x (observed). Same rationale as
    # bench.py's median-of-5; 3 keeps the two-scale probe tractable.
    n_runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "sf1")):
        # warm the footers
        load_table(spark, sf_dir, "lineitem").count()
        for name in names:
            # Per-query isolation: one query failing at the derived
            # sf1 scale must record an error, not abort the whole
            # multi-minute probe and discard every timing collected.
            times = []
            try:
                for _ in range(n_runs):
                    t0 = time.time()
                    specs[name].fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    times.append(time.time() - t0)
                    spark.catalog.clearCache()
                dt = round(sorted(times)[len(times) // 2], 3)
                result.setdefault(name, {})[tag] = dt
                runs = "/".join(f"{t:.3f}" for t in times)
                print(f"# {tag} {name}: median {dt}s of {runs}", file=sys.stderr)
            except Exception as exc:  # pragma: no cover - probe resilience
                result.setdefault(name, {})[f"{tag}_error"] = (
                    f"{type(exc).__name__}: {exc}"[:200]
                )
                print(f"# {tag} {name}: FAILED {exc}", file=sys.stderr)
            spark.catalog.clearCache()
    for name, r in result.items():
        if "sf1" in r and "sf0.1" in r:
            r["ratio"] = round(r["sf1"] / max(r["sf0.1"], 1e-9), 2)
    if "semantic_dedup" in names:
        # The documented scale contract for semantic_dedup is "K grows
        # with the corpus so clusters stay bounded" — holding K fixed
        # at 10x data makes within-cluster pair work grow
        # ~quadratically (the probe's one superlinear row). Demonstrate
        # the contract: rerun at sf1 with K scaled 10x and record the
        # K-scaled time.
        from engine.operators import clustering

        km_k0 = clustering.KM_K
        try:
            clustering.KM_K = km_k0 * N_COPIES
            ktimes = []
            for _ in range(n_runs):
                t0 = time.time()
                specs["semantic_dedup"].fn(spark, DST).write.format(
                    "noop"
                ).mode("overwrite").save()
                ktimes.append(time.time() - t0)
                spark.catalog.clearCache()
            result["semantic_dedup"]["sf1_k_scaled"] = round(
                sorted(ktimes)[len(ktimes) // 2], 3
            )
            result["semantic_dedup"]["ratio_k_scaled"] = round(
                result["semantic_dedup"]["sf1_k_scaled"]
                / max(result["semantic_dedup"]["sf0.1"], 1e-9),
                2,
            )
        finally:
            clustering.KM_K = km_k0
            spark.catalog.clearCache()
    if "embedding_suite" in names:
        # Same contract for sign-LSH band width: fixed 4-bit bands make
        # candidate work Σ bucket² ≈ bands × n²/16 (quadratic at fixed
        # geometry); width grown by log2(corpus growth) — 4×4 bits →
        # 4×8 bits at 10× data — keeps expected bucket size flat.
        # (SPARK_GRAFT_LSH_BITS is the production knob; the probe
        # patches the module constant the Spark plan reads.)
        from engine.operators import similarity

        bits0 = similarity.LSH_BITS
        try:
            similarity.LSH_BITS = bits0 * 2
            wtimes = []
            for _ in range(n_runs):
                t0 = time.time()
                specs["embedding_suite"].fn(spark, DST).write.format(
                    "noop"
                ).mode("overwrite").save()
                wtimes.append(time.time() - t0)
                spark.catalog.clearCache()
            result["embedding_suite"]["sf1_lsh_scaled"] = round(
                sorted(wtimes)[len(wtimes) // 2], 3
            )
            result["embedding_suite"]["ratio_lsh_scaled"] = round(
                result["embedding_suite"]["sf1_lsh_scaled"]
                / max(result["embedding_suite"].get("sf0.1", 0), 1e-9),
                2,
            )
        finally:
            similarity.LSH_BITS = bits0
            spark.catalog.clearCache()
    return result


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    spark = get_spark("scale-probe")
    if mode == "build":
        build(spark)
        return
    if not os.path.isdir(DST):
        build(spark)
    only = sys.argv[2:] or None  # `run name1 name2` probes a subset
    res = run(spark, only)
    print(json.dumps({"n_copies": N_COPIES, "queries": res}, indent=1))


if __name__ == "__main__":
    main()
