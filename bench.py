"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from engine.registry import all_queries_including_library
from engine.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Executor-side signal (VERDICT r11 #7): at sf0.1 every headliner is
# driver-latency-bound (8-core wall ≈ 32-core wall), so an executor-
# side regression is invisible in the wall-time numbers. Enable the UI
# status store for the bench session (measured overhead: within run-
# to-run noise — the listener bus is on in every default Spark deploy)
# and record, per query, the total executor run time of its measured
# runs' stages from the REST API. Purely additive: the timed loop, the
# one-line JSON contract and $SPARK_GRAFT_CPUS handling are unchanged;
# set SPARK_GRAFT_UI=0 to drop the signal.
os.environ.setdefault("SPARK_GRAFT_UI", "1")


def _executor_run_ms(spark, t_start: float, t_end: float) -> float | None:
    """Sum executorRunTime (ms) over the COMPLETE stages of every job
    submitted in [t_start, t_end) (epoch seconds), via the UI REST
    API. Time-window matching rather than job groups: facet jobs
    submitted from checkpoint_concurrently's pool threads don't
    inherit the main thread's group, and the bench loop is serial so
    the window owns its jobs. None when the UI is off or any lookup
    fails — the signal is best-effort and must never fail the bench."""
    import datetime as _dt
    import json as _json
    import urllib.request

    try:
        base = spark.sparkContext.uiWebUrl
        if not base:
            return None
        app = spark.sparkContext.applicationId

        def get(path: str):
            with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}{path}", timeout=10
            ) as r:
                return _json.load(r)

        stage_ids = set()
        for job in get("/jobs"):
            sub = job.get("submissionTime")
            if not sub:
                continue
            # "2031-03-01T12:00:00.123GMT" → epoch
            ts = (
                _dt.datetime.strptime(
                    sub.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
                ).timestamp()
            )
            if t_start <= ts < t_end:
                stage_ids.update(job.get("stageIds", ()))
        total = 0.0
        for sid in sorted(stage_ids):
            for att in get(f"/stages/{sid}"):
                if att.get("status") == "COMPLETE":
                    total += att.get("executorRunTime", 0)
        return round(total, 1)
    except Exception:
        return None


def _calibration(spark) -> dict:
    """Hardware anchor (VERDICT r6 #2): two fixed-work probes recorded
    alongside every bench run so cross-round deltas can be read as
    query_time ÷ calibration instead of re-litigating "regression or
    host?" per round (r6's driver bench ran a uniform 1.44× r5 on
    byte-unchanged binaries — pure host drift).

    (a) cpu_md5_sec — 200k chained MD5 digests on ONE core, pure
        deterministic CPU work, no allocation growth, no I/O. Tracks
        effective single-core speed (clock + steal + thermal state).
    (b) spark_fixed_job_sec — a canonical tiny Spark job: 2M-row
        range → modulo-keyed groupBy sum (one shuffle) → noop sink,
        fixed partitioning, zero data dependence. Tracks the whole
        JVM/scheduler/shuffle path at the bench's parallelism.

    Median of 5 each, run AFTER the JVM warm-up loop for the same
    reason the headliners are."""
    import hashlib

    def med(times: list[float]) -> float:
        return round(sorted(times)[len(times) // 2], 4)

    cpu = []
    for _ in range(5):
        t0 = time.perf_counter()
        h = b"spark-graft-calibration-seed"
        for _ in range(200_000):
            h = hashlib.md5(h).digest()
        cpu.append(time.perf_counter() - t0)

    job = []
    for _ in range(5):
        t0 = time.perf_counter()
        (
            spark.range(0, 2_000_000, 1, 32)
            .selectExpr("id % 1000 AS k", "id AS v")
            .groupBy("k")
            .sum("v")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        job.append(time.perf_counter() - t0)
    return {"cpu_md5_sec": med(cpu), "spark_fixed_job_sec": med(job)}


def _store_microbench(spark) -> dict:
    """Versioned-store metadata-plane microbench (VERDICT r10 #5):
    the 13 headliners contain no store row, so a commit-path or
    stream-planning regression was invisible to BENCH round-over-
    round (round 10's checkpointing speedup lived only in
    SCALE_PROBE prose). Fixed synthetic store — 20 partitions × 4
    range files — then medians of the three operations a production
    refresh loop runs continuously: a one-key upsert commit (stage +
    plan + claim), head resolution (checkpoint/delta-chain read), and
    one batch-CDF window read. Everything in a temp dir, removed
    after."""
    import shutil
    import tempfile

    import engine.versioned_store as vs
    from pyspark.sql import functions as F

    def med(times: list[float]) -> float:
        return round(sorted(times)[len(times) // 2], 4)

    root = tempfile.mkdtemp(prefix="bench-store-")
    try:
        store = os.path.join(root, "s")
        df = (
            spark.range(20 * 4 * 50)
            .select(
                (F.col("id") % 20).cast("string").alias("part"),
                F.col("id").alias("k"),
                F.sha2(F.col("id").cast("string"), 256).alias("v"),
            )
            .repartitionByRange(4, "k")
        )
        vs.commit_overwrite(df, store, "part")
        commit_s, resolve_s, cdf_s = [], [], []
        for i in range(5):
            chg = spark.createDataFrame(
                [(str(i % 20), 4000 + i, f"new:{i}")],
                "part string, k long, v string",
            )
            t0 = time.perf_counter()
            v = vs.commit_upsert(spark, store, chg, ["part", "k"])
            commit_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            vs._read_manifest(store, v)
            resolve_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            vs.table_changes(spark, store, v - 1, v, ["part", "k"]).count()
            cdf_s.append(time.perf_counter() - t0)
        return {
            "upsert_commit_sec": med(commit_s),
            "head_resolve_sec": med(resolve_s),
            "cdf_window_sec": med(cdf_s),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    # Headliners come from the FULL registry (library included): the
    # round-8 driver-cap consolidation demoted dedup_ngram_jaccard to a
    # library entry (driver-visible as dedup_minhash_prefix's `ngram`
    # facet), and the bench set must stay the identical 13 queries so
    # cross-round numbers compare like for like.
    specs = all_queries_including_library()
    names = sys.argv[1:] or [n for n, s in specs.items() if "headline" in s.tags]
    spark = get_spark("bench")
    # Warm the JVM once so per-query numbers measure the query, not
    # session startup: run every benched query at the tiny sf first
    # (exercises codegen, Arrow, broadcast, and window codepaths), then
    # touch the target-sf parquet footers.
    from engine.io import load_table

    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != SF_DIR:
        for name in names:
            try:
                specs[name].fn(spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
    load_table(spark, SF_DIR, "lineitem").count()
    calibration = _calibration(spark)
    print(f"# calibration: {calibration}", file=sys.stderr)

    # Median of 5 runs per query: single-sample walltimes swing ±20%
    # with machine load, which reads as phantom regressions across
    # rounds (whole-invocation drift of that size was measured between
    # back-to-back identical runs). Each run rebuilds the DataFrame
    # (no cross-run cache; any .persist() inside a query is scoped to
    # that build) and fully materializes via the noop sink — a bare
    # .count() would let Catalyst prune projections and under-measure
    # map-heavy queries.
    N_RUNS = 5
    per_query: dict[str, float] = {}
    per_query_exec_ms: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench:{name}")
        t_q0 = time.time()
        times = []
        for _ in range(N_RUNS):
            t0 = time.time()
            df = specs[name].fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            spark.catalog.clearCache()
        per_query[name] = round(sorted(times)[N_RUNS // 2], 3)
        exec_ms = _executor_run_ms(spark, t_q0, time.time())
        if exec_ms is not None:
            # total over N_RUNS → per-run mean (stages don't repeat
            # identically enough across runs for a median to be
            # meaningful at stage granularity)
            per_query_exec_ms[name] = round(exec_ms / N_RUNS, 1)
        print(
            f"# {name}: median {per_query[name]}s of "
            + "/".join(f"{t:.3f}" for t in times)
            + (
                f" exec_ms/run={per_query_exec_ms[name]}"
                if name in per_query_exec_ms
                else ""
            ),
            file=sys.stderr,
        )

    total = round(sum(per_query.values()), 3)
    # Anchor-normalized suite time (VERDICT r9 #8): raw seconds swing
    # ~2× with host load (spark_fixed_job_sec measured 0.395 → 0.936
    # across rounds with headliner code byte-identical), so round-over-
    # round comparisons need the suite time projected onto a REFERENCE
    # host. The reference anchor is round 7's recorded
    # spark_fixed_job_sec; value_normalized = value × (ref / measured).
    # Spark job overhead (not raw CPU) dominates the suite's variance,
    # so the Spark anchor is the scaling basis; cpu_md5_sec is recorded
    # alongside for cross-checking a claimed normalization.
    # A single anchor over-corrects when a host is slow at fixed-job
    # dispatch but fast at throughput or vice versa (VERDICT r10
    # wrongness #1: r9 normalized to 8.4 s, r10 to 11.4 s, while raw +
    # per-query said r10 was the best round). Emit BOTH anchors plus
    # per-query normalized medians, so the honest cross-round read is
    # in the JSON instead of prose: when the anchors disagree, host
    # state — not code — moved, and per-query ratios name any real
    # regression directly.
    _REF_SPARK_ANCHOR = 0.3949  # BENCH_r07 (driver) spark_fixed_job_sec
    _REF_CPU_ANCHOR = 0.1405  # BENCH_r07 (driver) cpu_md5_sec
    spark_scale = _REF_SPARK_ANCHOR / calibration["spark_fixed_job_sec"]
    cpu_scale = _REF_CPU_ANCHOR / calibration["cpu_md5_sec"]
    normalized = round(total * spark_scale, 3)
    store_bench = _store_microbench(spark)
    print(f"# store: {store_bench}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "value_normalized": normalized,
                "value_normalized_cpu": round(total * cpu_scale, 3),
                "normalized_to": {
                    "spark_fixed_job_sec": _REF_SPARK_ANCHOR,
                    "cpu_md5_sec": _REF_CPU_ANCHOR,
                    "reference": "BENCH_r07",
                },
                "unit": "sec",
                "queries": per_query,
                "queries_normalized": {
                    n: round(t * spark_scale, 3)
                    for n, t in per_query.items()
                },
                "store": store_bench,
                # mean executor run time per measured run (ms) — the
                # executor-side signal; absent when the UI is disabled
                **(
                    {"queries_executor_run_ms": per_query_exec_ms}
                    if per_query_exec_ms
                    else {}
                ),
                "runs_per_query": N_RUNS,
                "agg": "median",
                "calibration": calibration,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
