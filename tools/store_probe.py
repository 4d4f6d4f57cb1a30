"""Versioned-store scale probe: manifests at 10k files (VERDICT r7 #5).

versioned_store.py documents its manifests as O(files) driver-side
JSON — the honest caveat Delta chunks into its log and Iceberg into
avro manifests. This probe replaces the documented limit with a
MEASURED one: build a store whose CURRENT version lists N files
(default 10,000) across P partitions, then time every store operation
a production refresh loop touches —

  * manifest write + read (json size, parse time)
  * read_version: full snapshot (plan build + count)
  * read_version with partition pruning (catalog-side file pruning)
  * version_diff between two versions sharing all but one partition
  * rollback (one JSON write, zero data movement)
  * vacuum retention scan (live-set build over all manifests)

The store is synthesized honestly for the manifest plane: ONE real
parquet file is written by Spark, then hard-linked under N
version-unique names — every manifest entry points at a real,
readable parquet file, so read paths execute their true plans; only
the bytes are shared (a 10k-task write would measure the write
cluster, not the metadata plane this probe is about).

Usage:
  python tools/store_probe.py [N_FILES] [N_PARTITIONS]

Prints one human-readable table and one JSON line; paste the numbers
into SCALE_PROBE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from engine import versioned_store as vs  # noqa: E402
from engine.session import get_spark  # noqa: E402

ROWS_PER_FILE = 100


class _SeedPool:
    """Hard-link factory around one real parquet file: filesystems cap
    links per inode (~65k on ext4), so past 30k links per copy a fresh
    byte-copy of the seed becomes the new link target — 100k+ file
    stores stay cheap to synthesize (4 copies, not 100k writes)."""

    def __init__(self, seed: str, per_copy: int = 30_000):
        self.current = seed
        self.per_copy = per_copy
        self.n = 0
        self.copies = 0

    def link(self, dst: str) -> None:
        import shutil

        if self.n >= self.per_copy:
            self.copies += 1
            nxt = f"{self.current}.copy{self.copies}"
            shutil.copy(self.current.split(".copy")[0], nxt)
            self.current, self.n = nxt, 0
        os.link(self.current, dst)
        self.n += 1

    def getsize(self) -> int:
        return os.path.getsize(self.current)


def _build_store(spark, root: str, n_files: int, n_parts: int) -> str:
    """A store whose v1 lists ``n_files`` entries over ``n_parts``
    partitions, plus a v2 that rewrites exactly one partition (the
    shape a daily refresh leaves behind)."""
    store = os.path.join(root, f"store_{n_files}")
    data = os.path.join(store, vs._DATA)
    os.makedirs(data, exist_ok=True)
    # one real file, linked n_files times
    seed_dir = os.path.join(root, "seed")
    (
        spark.range(ROWS_PER_FILE)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 97).cast("long").alias("n_tokens"),
            F.xxhash64("id").alias("h"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(seed_dir)
    )
    seed = _SeedPool(
        next(
            os.path.join(seed_dir, f)
            for f in os.listdir(seed_dir)
            if f.endswith(".parquet")
        )
    )
    per_part = n_files // n_parts

    def _entries(version: int) -> list[dict]:
        entries = []
        for p in range(n_parts):
            for i in range(per_part):
                name = f"v{version:05d}-{p:04d}-{i:05d}.parquet"
                seed.link(os.path.join(data, name))
                entries.append(
                    {
                        "file": name,
                        "partition": f"src{p:04d}",
                        "n_rows": ROWS_PER_FILE,
                        "bytes": seed.getsize(),
                    }
                )
        return entries

    ddl = "doc_id bigint, n_tokens bigint, h bigint"
    v1_files = _entries(1)
    vs._write_manifest_and_current(
        store,
        {"version": 1, "partition_col": "source", "columns": ddl,
         "files": v1_files},
    )
    # v2: copy-on-write rewrite of partition src0000 only
    touched = [e for e in v1_files if e["partition"] == "src0000"]
    keep = [e for e in v1_files if e["partition"] != "src0000"]
    new = []
    for i in range(len(touched)):
        name = f"v00002-0000-{i:05d}.parquet"
        seed.link(os.path.join(data, name))
        new.append({"file": name, "partition": "src0000",
                    "n_rows": ROWS_PER_FILE,
                    "bytes": seed.getsize()})
    vs._write_manifest_and_current(
        store,
        {"version": 2, "partition_col": "source", "columns": ddl,
         "files": keep + new},
    )
    return store, seed


def _probe(spark, root: str, n_files: int, n_parts: int) -> dict:
    t0 = time.monotonic()
    store, seed = _build_store(spark, root, n_files, n_parts)
    build_s = time.monotonic() - t0
    out: dict = {"n_files": n_files, "n_partitions": n_parts,
                 "build_s": round(build_s, 3)}

    mpath = vs._manifest_path(store, 1)
    out["manifest_bytes"] = os.path.getsize(mpath)
    t0 = time.monotonic()
    man = vs._read_manifest(store, 1)
    out["manifest_parse_s"] = round(time.monotonic() - t0, 4)
    assert len(man["files"]) == n_files

    t0 = time.monotonic()
    n = vs.read_version(spark, store, 1).count()
    out["read_full_s"] = round(time.monotonic() - t0, 3)
    assert n == n_files * ROWS_PER_FILE

    t0 = time.monotonic()
    n = vs.read_version(
        spark, store, 1, partition_values=["src0001"]
    ).count()
    out["read_pruned_s"] = round(time.monotonic() - t0, 3)
    assert n == (n_files // n_parts) * ROWS_PER_FILE

    t0 = time.monotonic()
    d = vs.version_diff(spark, store, 2, 1).collect()
    out["diff_s"] = round(time.monotonic() - t0, 3)
    assert len(d) == n_parts

    # round-10 checkpointed commit plane: a chain of one-partition
    # refreshes through the REAL incremental publish path — each
    # commit re-reads the head (checkpoint + delta tail), rewrites one
    # partition, and writes a DELTA manifest. The claim the format
    # makes: per-commit manifest I/O is O(touched partition), NOT
    # O(table), so commit bytes/time stay flat as n_files grows 10×
    # (pre-round-10, every commit re-serialized all n_files entries —
    # the v1 manifest_bytes above is that cost for comparison).
    data = os.path.join(store, vs._DATA)
    ddl = "doc_id bigint, n_tokens bigint, h bigint"
    n_chain = vs._CHECKPOINT_INTERVAL + 2  # cross one ckpt boundary
    commit_s, delta_bytes, resolve_s = [], [], []
    for j in range(n_chain):
        t0 = time.monotonic()
        head_v = vs.current_version(store)
        head = vs._read_manifest(store, head_v)  # a commit's read side
        resolve_s.append(time.monotonic() - t0)
        part = f"src{j % n_parts:04d}"
        new = []
        for i in range(3):
            name = f"v{head_v + 1:05d}-chain-{i:05d}.parquet"
            seed.link(os.path.join(data, name))
            new.append({"file": name, "partition": part,
                        "n_rows": ROWS_PER_FILE,
                        "bytes": seed.getsize()})
        t0 = time.monotonic()
        v = vs._publish_incremental(
            spark, store, head_v, head, {(part,)}, new, ddl, {}, 0
        )
        commit_s.append(time.monotonic() - t0)
        delta_bytes.append(os.path.getsize(vs._manifest_path(store, v)))
    commit_s.sort()
    out["chain_commits"] = n_chain
    out["commit_median_s"] = round(commit_s[len(commit_s) // 2], 4)
    out["commit_max_s"] = round(commit_s[-1], 4)  # the ckpt commit
    out["delta_manifest_bytes"] = max(delta_bytes)
    out["head_resolve_s"] = round(
        sorted(resolve_s)[len(resolve_s) // 2], 4
    )
    ck = vs._ckpt_path(
        store,
        (vs.current_version(store) // vs._CHECKPOINT_INTERVAL)
        * vs._CHECKPOINT_INTERVAL,
    )
    out["ckpt_bytes"] = os.path.getsize(ck) if os.path.exists(ck) else 0

    t0 = time.monotonic()
    vs.rollback(store, 1)
    out["rollback_s"] = round(time.monotonic() - t0, 4)

    t0 = time.monotonic()
    removed = vs.vacuum(store, keep_latest=2)
    out["vacuum_s"] = round(time.monotonic() - t0, 3)
    out["vacuum_removed"] = len(removed)
    return out


def _probe_file_granular(spark, root: str, n_files: int = 64,
                         rows_per: int = 20_000) -> dict:
    """Round-11 write-path pruning: rewritten bytes for a one-key
    DELETE on a multi-file partition must be ∝ files admitting the
    key (here: 1 of ``n_files``, ranges disjoint), never ∝ partition
    size. REAL files this time — the planner reads their footer
    stats, so hard-linked seeds would all share one range."""
    store = os.path.join(root, "store_granular")
    df = (
        spark.range(n_files * rows_per)
        .select(
            F.lit("p").alias("part"),
            F.col("id").alias("doc_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .repartitionByRange(n_files, "doc_id")
    )
    vs.commit_overwrite(df, store, "part")
    man = vs._read_manifest(store, 1)
    part_bytes = sum(e["bytes"] for e in man["files"])
    out = {
        "n_files": len(man["files"]),
        "partition_bytes": part_bytes,
    }

    t0 = time.monotonic()
    v2 = vs.commit_delete(
        spark,
        store,
        spark.createDataFrame(
            [("p", n_files * rows_per // 2)], "part string, doc_id long"
        ),
        ["part", "doc_id"],
    )
    out["delete_1key_s"] = round(time.monotonic() - t0, 3)
    adds, removes = vs._step_delta(store, v2)
    by_file = {e["file"]: e for e in man["files"]}
    out["rewritten_files"] = len(removes)
    out["rewritten_bytes"] = sum(
        by_file[r["file"]]["bytes"] for r in removes
    )
    out["rewrite_fraction"] = round(
        out["rewritten_bytes"] / part_bytes, 4
    )

    # a 10-key upsert clustered in one range file: same contract
    mid = n_files * rows_per // 4
    chg = spark.createDataFrame(
        [("p", mid + i, "UPDATED") for i in range(10)],
        "part string, doc_id long, payload string",
    )
    t0 = time.monotonic()
    v3 = vs.commit_upsert(spark, store, chg, ["part", "doc_id"])
    out["upsert_10key_s"] = round(time.monotonic() - t0, 3)
    _, removes3 = vs._step_delta(store, v3)
    out["upsert_rewritten_files"] = len(removes3)
    return out


def _probe_bloom_plane(spark, root: str, n_files: int = 512,
                       rows_per: int = 200) -> dict:
    """Round-11 bloom sidecar plane: per-commit sidecar bytes on a
    bloomed store. Pre-round-11 every commit re-wrote the WHOLE
    table's blooms as hex JSON; now a commit writes a delta (its new
    files only) and checkpoint-cadence versions write binary parquet.
    Reported: the delta bytes an upsert commit writes, what the old
    full-JSON form would have been, and the parquet checkpoint size."""
    store = os.path.join(root, "store_bloom")
    df = (
        spark.range(n_files * rows_per)
        .select(
            F.lit("p").alias("part"),
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("v"),
        )
        .repartitionByRange(n_files, "k")
    )
    vs.commit_overwrite(df, store, "part", bloom_cols=["k", "v"])
    chg = spark.createDataFrame(
        [("p", 10**9, "upd")], "part string, k long, v string"
    )
    t0 = time.monotonic()
    v2 = vs.commit_upsert(spark, store, chg, ["part", "k"])
    commit_s = time.monotonic() - t0
    delta_bytes = os.path.getsize(vs._bloom_path(store, v2))
    resolved = vs._read_bloom_sidecar(store, v2)
    full_json_bytes = len(json.dumps(resolved))
    vs._write_bloom_checkpoint(store, v2, resolved)
    ckpt_bytes = os.path.getsize(vs._bloom_ckpt_path(store, v2))
    os.remove(vs._bloom_ckpt_path(store, v2))
    return {
        "n_files": n_files,
        "bloom_cols": 2,
        "delta_sidecar_bytes": delta_bytes,
        "pre_r11_full_json_bytes": full_json_bytes,
        "ckpt_parquet_bytes": ckpt_bytes,
        "upsert_commit_s": round(commit_s, 3),
    }


def _probe_concurrent(spark, root: str, n_files: int, n_parts: int,
                      n_writers: int = 8) -> dict:
    """Round-11 (VERDICT r10 #7): N writers racing commit_upsert on
    disjoint partitions of a checkpointed ``n_files``-file store —
    the retry-storm shape that breaks table formats once OCC meets a
    long metadata plane. Every writer must land (disjoint partitions
    rebase cleanly); recorded: commit latency distribution, claim
    attempts vs commits (the surplus is lost races → rebases), and
    the wall time for the whole convoy."""
    import threading

    store, seed = _build_store(
        spark, os.path.join(root, "conc"), n_files, n_parts
    )
    attempts = [0]
    lock = threading.Lock()
    real = vs._claim_manifest

    def counting(store_, manifest):
        with lock:
            attempts[0] += 1
        return real(store_, manifest)

    lat: list[float] = []
    errs: list[str] = []

    def writer(i: int) -> None:
        part = f"src{i % n_parts:04d}"
        chg = spark.createDataFrame(
            [(part, 10**9 + i, 5, 123)],
            "source string, doc_id bigint, n_tokens bigint, h bigint",
        )
        t0 = time.monotonic()
        try:
            vs.commit_upsert(
                spark, store, chg, ["source", "doc_id"],
                max_retries=n_writers * 2,
            )
            with lock:
                lat.append(time.monotonic() - t0)
        except Exception as exc:  # noqa: BLE001 - probe records all
            with lock:
                errs.append(f"{type(exc).__name__}: {exc}")

    vs._claim_manifest = counting
    t0 = time.monotonic()
    try:
        threads = [
            threading.Thread(target=writer, args=(i,))
            for i in range(n_writers)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        vs._claim_manifest = real
    wall = time.monotonic() - t0
    lat.sort()
    return {
        "n_files": n_files,
        "n_writers": n_writers,
        "committed": len(lat),
        "errors": errs,
        "claim_attempts": attempts[0],
        "rebases": attempts[0] - len(lat),
        "commit_p50_s": round(lat[len(lat) // 2], 3) if lat else None,
        "commit_max_s": round(lat[-1], 3) if lat else None,
        "wall_s": round(wall, 3),
    }


def main() -> None:
    import shutil
    import tempfile

    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="store-probe-")
    try:
        results = [
            _probe(spark, root, nf, max(1, min(n_parts, nf)))
            for nf in (1_000, n_files)
        ]
        granular = _probe_file_granular(spark, root)
        bloom = _probe_bloom_plane(spark, root)
        concurrent = _probe_concurrent(
            spark, root, n_files, max(1, min(n_parts, n_files))
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    hdr = list(results[0])
    print("\t".join(hdr))
    for r in results:
        print("\t".join(str(r[k]) for k in hdr))
    print("file-granular rewrite:", granular)
    print("bloom plane:", bloom)
    print("concurrent writers:", concurrent)
    print(json.dumps({"store_probe": results,
                      "file_granular": granular,
                      "bloom_plane": bloom,
                      "concurrent": concurrent}))


if __name__ == "__main__":
    main()
