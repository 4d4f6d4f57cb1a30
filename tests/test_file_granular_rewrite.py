"""Round-11 file-granular copy-on-write (VERDICT r10 #1): DELETE /
UPSERT / MERGE rewrite only the files whose footer stats or bloom
sidecar ADMIT a changed key — every provably key-free file inside a
touched partition carries forward verbatim, so a one-key GDPR delete
on a many-file partition rewrites one file, not the partition.

The planner (``_plan_file_rewrite``) is conservative by construction:
a file with no stats, an incomparable type, or a bloom false positive
is rewritten (the old whole-partition behavior), never skipped — so
every test here checks BOTH the pruning (carried files stay) and the
results (reads are byte-equal to the pre-round-11 semantics).
"""

import pytest

import engine.versioned_store as vs
from pyspark.sql import functions as F


def _ranged_store(spark, store, n_files=4, rows_per=8):
    """One partition 'p', ``n_files`` files with disjoint k ranges
    (range-repartitioned before the commit, so the footer stats carve
    the key space)."""
    n = n_files * rows_per
    df = spark.createDataFrame(
        [("p", k, f"v:{k}") for k in range(n)],
        "part string, k long, v string",
    ).repartitionByRange(n_files, "k")
    vs.commit_overwrite(df, store, "part")
    man = vs._read_manifest(store, 1)
    assert len(man["files"]) == n_files
    return man


def _admitting(man, key):
    return {
        e["file"]
        for e in man["files"]
        if e["stats"]["k"][0] <= key <= e["stats"]["k"][1]
    }


def test_delete_rewrites_only_admitting_files(spark, tmp_path):
    store = str(tmp_path / "s")
    man = _ranged_store(spark, store)
    doomed = _admitting(man, 5)
    assert len(doomed) == 1  # disjoint ranges: exactly one file holds 5

    v2 = vs.commit_delete(
        spark,
        store,
        spark.createDataFrame([("p", 5)], "part string, k long"),
        ["part", "k"],
    )
    step = vs._step_delta(store, v2)
    assert step is not None
    adds, removes = step
    assert {r["file"] for r in removes} == doomed
    # the rewritten bytes are the one admitting file's, not the
    # partition's (the probe's contract, pinned here at small scale)
    man2 = vs._read_manifest(store, v2)
    carried = {e["file"] for e in man["files"]} - doomed
    assert carried < {e["file"] for e in man2["files"]}
    got = sorted(
        r.k for r in vs.read_version(spark, store, v2).collect()
    )
    assert got == [k for k in range(32) if k != 5]


def test_upsert_carries_key_free_files(spark, tmp_path):
    store = str(tmp_path / "s")
    man = _ranged_store(spark, store)
    chg = spark.createDataFrame(
        [("p", 5, "NEW"), ("p", 99, "INS")],
        "part string, k long, v string",
    )
    v2 = vs.commit_upsert(spark, store, chg, ["part", "k"])
    adds, removes = vs._step_delta(store, v2)
    assert {r["file"] for r in removes} == _admitting(man, 5)
    got = {
        r.k: r.v for r in vs.read_version(spark, store, v2).collect()
    }
    assert got[5] == "NEW" and got[99] == "INS" and len(got) == 33


def test_merge_carries_key_free_files(spark, tmp_path):
    store = str(tmp_path / "s")
    man = _ranged_store(spark, store)
    src = spark.createDataFrame(
        [("p", 5, "UPD"), ("p", 12, "TOMB"), ("p", 99, "INS")],
        "part string, k long, v string",
    )
    v2 = vs.commit_merge(
        spark,
        store,
        src,
        ["part", "k"],
        matched_delete_condition="v = 'TOMB'",
    )
    adds, removes = vs._step_delta(store, v2)
    assert {r["file"] for r in removes} == (
        _admitting(man, 5) | _admitting(man, 12)
    )
    got = {
        r.k: r.v for r in vs.read_version(spark, store, v2).collect()
    }
    assert got[5] == "UPD" and got[99] == "INS" and 12 not in got
    assert len(got) == 32  # 32 - deleted 12 + inserted 99


def test_noop_delete_changes_no_files(spark, tmp_path):
    """A delete whose key provably misses every file commits a
    version with EMPTY churn — the commuting no-op the OCC model test
    relies on — and never runs a Spark job over the table."""
    store = str(tmp_path / "s")
    _ranged_store(spark, store)
    v2 = vs.commit_delete(
        spark,
        store,
        spark.createDataFrame([("p", 10_000)], "part string, k long"),
        ["part", "k"],
    )
    adds, removes = vs._step_delta(store, v2)
    assert adds == [] and removes == []
    assert vs.read_version(spark, store, v2).count() == 32


def test_bloom_refines_range_admission(spark, tmp_path):
    """Files whose ranges OVERLAP (range stats admit everything) are
    still carried when the bloom sidecar proves the key absent."""
    store = str(tmp_path / "s")
    # interleaved keys: both files span [0, 31], ranges prune nothing
    df = spark.createDataFrame(
        [("p", k, f"v:{k}") for k in range(32)],
        "part string, k long, v string",
    ).repartition(2, "k")
    vs.commit_overwrite(df, store, "part", bloom_cols=["k"])
    man = vs._read_manifest(store, 1)
    spans = [e["stats"]["k"] for e in man["files"]]
    assert all(hi - lo > 16 for lo, hi in spans)  # truly interleaved

    v2 = vs.commit_delete(
        spark,
        store,
        spark.createDataFrame([("p", 7)], "part string, k long"),
        ["part", "k"],
    )
    adds, removes = vs._step_delta(store, v2)
    # bloom admission: the file(s) actually holding k=7, typically 1
    # of 2 (false positives can only grow the set, never to wrong
    # results)
    sidecar = vs._read_bloom_sidecar(store, 1)
    bloom_admitted = {
        e["file"]
        for e in man["files"]
        if vs._bloom_words_admit(
            sidecar["files"][e["file"]].get("k"),
            vs._bloom_positions_py(7, sidecar["bits"]),
        )
    }
    assert {r["file"] for r in removes} == bloom_admitted
    got = sorted(r.k for r in vs.read_version(spark, store, v2).collect())
    assert got == [k for k in range(32) if k != 7]


def test_range_fallback_tier_above_key_cap(spark, tmp_path, monkeypatch):
    """Past ``_REWRITE_KEY_CAP`` distinct keys the planner falls back
    to per-partition key-range overlap — coarser, still correct, and
    still carries files outside the changeset's range."""
    monkeypatch.setattr(vs, "_REWRITE_KEY_CAP", 2)
    store = str(tmp_path / "s")
    man = _ranged_store(spark, store)  # 4 files, ranges ~[0..7]..[24..31]
    keys = spark.createDataFrame(
        [("p", k) for k in (1, 3, 5, 6)], "part string, k long"
    )
    v2 = vs.commit_delete(spark, store, keys, ["part", "k"])
    adds, removes = vs._step_delta(store, v2)
    removed = {r["file"] for r in removes}
    # fallback admits every file overlapping [1, 6] — at least the
    # true holder, and never the top-range files
    assert removed >= _admitting(man, 5)
    top = _admitting(man, 30)
    assert not (removed & top)
    got = sorted(r.k for r in vs.read_version(spark, store, v2).collect())
    assert got == [k for k in range(32) if k not in (1, 3, 5, 6)]


def test_null_key_component_admits_nothing(spark, tmp_path):
    """A changeset row with a NULL key component matches no base row
    (SQL equality): it deletes nothing, and an upsert inserts it
    without rewriting any file."""
    store = str(tmp_path / "s")
    _ranged_store(spark, store)
    chg = spark.createDataFrame(
        [("p", None, "NULLKEY")], "part string, k long, v string"
    )
    v2 = vs.commit_upsert(spark, store, chg, ["part", "k"])
    adds, removes = vs._step_delta(store, v2)
    assert removes == [] and len(adds) == 1
    got = vs.read_version(spark, store, v2)
    assert got.count() == 33
    assert got.filter(F.col("k").isNull()).collect()[0].v == "NULLKEY"


def test_same_partition_commits_still_conflict(spark, tmp_path):
    """The OCC conflict check stays PARTITION-granular on purpose:
    two commits rewriting disjoint files of one partition still
    conflict (a rebase is only provably exact across disjoint
    partitions)."""
    store = str(tmp_path / "s")
    _ranged_store(spark, store)
    real = vs._claim_manifest
    fired = []

    def hooked(store_, manifest):
        if not fired:
            fired.append(1)
            vs.commit_delete(
                spark,
                store,
                spark.createDataFrame([("p", 30)], "part string, k long"),
                ["part", "k"],
            )
        return real(store_, manifest)

    vs._claim_manifest = hooked
    try:
        with pytest.raises(vs.CommitConflict):
            vs.commit_delete(
                spark,
                store,
                spark.createDataFrame([("p", 5)], "part string, k long"),
                ["part", "k"],
                max_retries=3,
            )
    finally:
        vs._claim_manifest = real
