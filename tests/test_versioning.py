"""Snapshot-versioning tests: both versions must be real published
artifacts, the diff must be recomputable by an independent engine from
the written files, every diff class must actually occur, and the diff
scan must never read document bodies."""

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from engine.operators.versioning import (
    _DIFF_H_DUCK,
    corpus_snapshot_diff,
    snapshot_diff,
)
from engine.plans.inspect import formatted_plan
from tests.conftest import SF_SMOKE


def _vs_man(store, v):
    """Manifest with its file list resolved (delta manifests replay
    through _read_manifest — the round-10 checkpointed format)."""
    from engine.versioned_store import _read_manifest

    return _read_manifest(store, v)


def _diff_from_files_duckdb(v1: str, v2: str):
    """The per-source diff recomputed by DuckDB straight from the two
    published snapshots' files — using only the STORED (doc_id, h,
    n_tokens) columns, i.e. the same narrow contract the Spark diff
    relies on."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH a AS (SELECT source, doc_id, n_tokens AS a_tok, h AS a_h
                   FROM read_parquet('{v1}/source=*/*.parquet',
                                     hive_partitioning=1)),
        b AS (SELECT source, doc_id, n_tokens AS b_tok, h AS b_h
              FROM read_parquet('{v2}/source=*/*.parquet',
                                hive_partitioning=1)),
        j AS (
          SELECT COALESCE(a.source, b.source) AS source,
                 COALESCE(a.doc_id, b.doc_id) AS doc_id, a_tok, b_tok,
                 CASE WHEN a_h IS NULL THEN 'added'
                      WHEN b_h IS NULL THEN 'removed'
                      WHEN a_h <> b_h THEN 'changed'
                      ELSE 'unchanged' END AS status
          FROM a FULL JOIN b ON a.doc_id = b.doc_id
        )
        SELECT source,
               CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(COALESCE(b_tok, 0) - COALESCE(a_tok, 0)) AS BIGINT),
               CAST(COALESCE(bit_xor(CASE WHEN status <> 'unchanged'
                                     THEN {_DIFF_H_DUCK} END), 0) AS BIGINT)
        FROM j GROUP BY source
        """
    ).fetchall()
    return {r[0]: tuple(r[1:]) for r in rows}


def test_snapshot_diff_publishes_both_versions_and_files_pin_the_diff(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_CORPUS_OUT", str(tmp_path / "corpus"))
    got = {
        r.source: (r.n1, r.n2, r.n3, r.n4, r.tok_delta, r.h)
        for r in corpus_snapshot_diff(spark, SF_SMOKE).collect()
        if r.facet == "diff"
    }
    base = str(
        tmp_path / "corpus" / os.path.basename(SF_SMOKE.rstrip("/"))
    )
    # both versions exist as real source-partitioned artifacts
    for v in ("_v1", "_v2"):
        assert glob.glob(f"{base}{v}/source=*/*.parquet")
    # an independent engine reproduces the diff from the files alone
    assert _diff_from_files_duckdb(base + "_v1", base + "_v2") == got
    # every diff class occurs somewhere (the keyed slices guarantee it)
    tot = [sum(v[i] for v in got.values()) for i in range(4)]
    assert all(t > 0 for t in tot), tot


def test_snapshot_diff_scan_prunes_text_and_republish_is_idempotent(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_CORPUS_OUT", str(tmp_path / "corpus"))
    first = corpus_snapshot_diff(spark, SF_SMOKE)
    rows1 = {tuple(r) for r in first.collect()}

    base = str(
        tmp_path / "corpus" / os.path.basename(SF_SMOKE.rstrip("/"))
    )
    diff = snapshot_diff(spark, base + "_v1", base + "_v2")
    plan = formatted_plan(diff)
    # the diff's parquet scans read only the narrow columns — document
    # bodies never leave the footer (the 100 TB contract)
    read_schemas = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    ]
    assert read_schemas and all("text" not in ln for ln in read_schemas)
    # full-outer diff join present, no cartesian anywhere
    assert "SortMergeJoin FullOuter" in plan or "ShuffledHashJoin FullOuter" in plan
    assert "CartesianProduct" not in plan

    # second run republishes both versions atomically over the first —
    # byte-stable summary
    rows2 = {tuple(r) for r in corpus_snapshot_diff(spark, SF_SMOKE).collect()}
    assert rows1 == rows2


def test_snapshot_diff_helper_classifies_all_four_statuses(spark, tmp_path):
    # a tiny hand-built pair of snapshots pins the classifier exactly
    a = spark.createDataFrame(
        [("s", 1, 3, 11, "x"), ("s", 2, 5, 22, "y"), ("s", 3, 7, 33, "z")],
        "source string, doc_id long, n_tokens long, h long, text string",
    )
    b = spark.createDataFrame(
        [("s", 1, 3, 11, "x"), ("s", 2, 6, 99, "y2"), ("s", 4, 2, 44, "w")],
        "source string, doc_id long, n_tokens long, h long, text string",
    )
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    a.write.partitionBy("source").parquet(pa)
    b.write.partitionBy("source").parquet(pb)
    row = snapshot_diff(spark, pa, pb).collect()[0]
    assert (row.n_added, row.n_removed, row.n_changed, row.n_unchanged) == (
        1, 1, 1, 1,
    )
    # doc 3 (7 tokens) left, doc 4 (2) arrived, doc 2 went 5 -> 6
    assert row.tok_delta == (2 - 7) + (6 - 5)
    assert row.diff_h != 0


def test_streaming_refresh_store_is_batch_equivalent(spark, tmp_path, monkeypatch):
    """The streamed store must be recomputable by an independent engine
    from the written files, the gate must actually drop duplicate
    arrivals, and a re-run (fresh checkpoint, republished base) must
    converge to the same store."""
    import duckdb as _duck

    from engine.operators.corpus_build import _IS_NEW_DUCK
    from engine.operators.versioning import streaming_refresh_upsert
    from tests.conftest import SF_SMOKE as _SF

    monkeypatch.setenv("SPARK_GRAFT_CORPUS_OUT", str(tmp_path / "corpus"))
    got = {
        r.source: (r.n_docs, r.corpus_h)
        for r in streaming_refresh_upsert(spark, _SF).collect()
        if r.facet == "merge"
    }
    store = str(
        tmp_path
        / "corpus"
        / (os.path.basename(_SF.rstrip("/")) + "_stream_refresh")
    )
    con = _duck.connect()
    from_files = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""SELECT source, CAST(count(*) AS BIGINT),
                       CAST(bit_xor(h) AS BIGINT)
                FROM read_parquet('{store}/source=*/*.parquet',
                                  hive_partitioning=1) GROUP BY source"""
        ).fetchall()
    }
    assert from_files == got
    # arrivals were appended: stored > base (the fixture has no exact
    # duplicate texts, so the drop path is pinned by the crafted-dup
    # test below and the gate's no-op here is the CORRECT gate result)
    n_base = con.execute(
        f"""SELECT CAST(count(*) AS BIGINT)
            FROM read_parquet('{_SF}/documents.parquet')
            WHERE NOT ({_IS_NEW_DUCK})"""
    ).fetchone()[0]
    assert sum(v[0] for v in got.values()) > n_base
    # convergent re-run
    got2 = {
        r.source: (r.n_docs, r.corpus_h)
        for r in streaming_refresh_upsert(spark, _SF).collect()
        if r.facet == "merge"
    }
    assert got2 == got


def test_stream_refresh_gate_drops_crafted_duplicates(spark, tmp_path):
    """Every gate path on crafted data: an arrival duplicating the BASE
    drops; two arrivals duplicating each other IN one batch keep the
    lowest doc_id; an arrival duplicating an earlier BATCH's survivor
    drops; fresh content appends. The final store is checked row-for-
    row, and must equal what a single-batch run produces (micro-batch
    cuts don't change the corpus)."""
    from engine.operators.versioning import run_stream_refresh

    base = spark.createDataFrame(
        [("s", 1, "alpha"), ("s", 2, "beta")],
        "source string, doc_id long, text string",
    )
    batch0 = spark.createDataFrame(
        [
            ("s", 10, "alpha"),   # dup of base        -> drop
            ("s", 12, "gamma"),   # intra-batch dup... -> keep (min id)
            ("s", 11, "gamma"),   # ...of this winner  -> keep 11, drop 12
            ("s", 13, "delta"),   # fresh              -> keep
        ],
        "source string, doc_id long, text string",
    )
    batch1 = spark.createDataFrame(
        [
            ("s", 20, "gamma"),   # dup of batch0 survivor -> drop
            ("s", 21, "epsilon"), # fresh                  -> keep
        ],
        "source string, doc_id long, text string",
    )
    store = str(tmp_path / "store2b")
    run_stream_refresh(spark, base, [batch0, batch1], store).collect()
    kept = sorted(
        (r.doc_id, r.content_hash is not None)
        for r in spark.read.parquet(store).collect()
    )
    assert [k for k, _ in kept] == [1, 2, 11, 13, 21]

    # cut-invariance: one batch holding all six arrivals ends the same
    store1 = str(tmp_path / "store1b")
    run_stream_refresh(
        spark, base, [batch0.unionByName(batch1)], store1
    ).collect()
    ids1 = sorted(r.doc_id for r in spark.read.parquet(store1).collect())
    assert ids1 == [k for k, _ in kept]


def test_term_drift_detects_injected_revision(spark, tmp_path, monkeypatch):
    """The drift must surface the deterministic revision marker as a
    pure gainer (n_v1 = 0) wherever revised docs exist, and respect the
    per-source top-K contract."""
    from collections import Counter

    from engine.operators.versioning import DRIFT_K, snapshot_term_drift

    monkeypatch.setenv("SPARK_GRAFT_CORPUS_OUT", str(tmp_path / "corpus"))
    rows = snapshot_term_drift(spark, SF_SMOKE).collect()
    assert rows
    per_source = Counter(r.source for r in rows)
    assert max(per_source.values()) <= DRIFT_K
    gains = [r for r in rows if r.term == "[rev2]"]
    assert gains  # the v2 revision marker is a top mover somewhere
    for r in gains:
        assert r.n_v1 == 0 and r.n_v2 > 0 and r.delta == r.n_v2
    assert all(1 <= r.rnk <= DRIFT_K for r in rows)


def test_versioned_store_time_travel_pruning_and_vacuum(spark, tmp_path):
    """The manifest store's lifecycle on crafted data: v1 stays
    byte-identical after v2's upsert lands (time travel); reads prune
    files catalog-side from the manifest; vacuum removes exactly the
    files only retired versions reference and v2 survives it."""
    import os as _os

    from engine.versioned_store import (
        commit_overwrite,
        commit_upsert,
        current_version,
        read_version,
        vacuum,
        versions,
    )

    store = str(tmp_path / "vstore")
    v1_rows = [("a", 1, "x"), ("a", 2, "y"), ("b", 3, "z")]
    df = spark.createDataFrame(v1_rows, "part string, k long, v string")
    v1 = commit_overwrite(df, store, "part")
    assert (v1, current_version(store)) == (1, 1)

    # upsert: update k=1, insert k=4, both in partition 'a'; 'b' untouched
    chg = spark.createDataFrame(
        [("a", 1, "x2"), ("a", 4, "w")], "part string, k long, v string"
    )
    v2 = commit_upsert(spark, store, chg, ["part", "k"])
    assert versions(store) == [1, 2]

    # time travel: v1 still reads its original contents AFTER v2
    got_v1 = sorted(tuple(r) for r in read_version(spark, store, v1).collect())
    assert got_v1 == sorted((k, v, p) for p, k, v in v1_rows)
    got_v2 = sorted(tuple(r) for r in read_version(spark, store, v2).collect())
    assert got_v2 == sorted(
        [(1, "x2", "a"), (2, "y", "a"), (4, "w", "a"), (3, "z", "b")]
    )

    # copy-on-write: partition 'b' carries the SAME file forward
    import json as _json

    m1 = _vs_man(store, 1)
    m2 = _vs_man(store, 2)
    b1 = {e["file"] for e in m1["files"] if e["partition"] == "b"}
    b2 = {e["file"] for e in m2["files"] if e["partition"] == "b"}
    assert b1 == b2 and b1
    # file-granular copy-on-write (round 11): within touched
    # partition 'a', the file holding k=1 is rewritten, but a file
    # whose stats prove it holds neither changed key (k=2 only)
    # carries forward verbatim
    a1 = {
        e["file"]: e for e in m1["files"] if e["partition"] == "a"
    }
    a2 = {e["file"] for e in m2["files"] if e["partition"] == "a"}
    shared_a = a2 & set(a1)
    for f in shared_a:  # every carried 'a' file provably lacks 1 and 4
        lo, hi = a1[f]["stats"]["k"]
        assert not (lo <= 1 <= hi) and not (lo <= 4 <= hi)
    rewritten_a = set(a1) - a2
    assert rewritten_a  # the k=1 file was rewritten
    assert a2 - set(a1)  # and new files hold the merged rows

    # catalog-side pruning: only partition-b files reach the reader
    only_b = read_version(spark, store, v2, partition_values=["b"])
    assert sorted(tuple(r) for r in only_b.collect()) == [(3, "z", "b")]

    # vacuum keeps v2 only: v1's manifest and its unshared files go
    removed = vacuum(store, keep_latest=1)
    assert versions(store) == [2]
    live = {e["file"] for e in m2["files"]}
    assert set(removed).isdisjoint(live) and removed
    on_disk = set(_os.listdir(f"{store}/data"))
    assert live <= on_disk and not (set(removed) & on_disk)
    # and v2 still reads completely
    assert (
        sorted(tuple(r) for r in read_version(spark, store, 2).collect())
        == got_v2
    )


def test_versioned_store_rollback_is_a_zero_copy_commit(spark, tmp_path):
    """Rolling back promotes the old file set as a NEW version: same
    contents as the target, no data files written, history intact."""
    import json as _json
    import os as _os

    from engine.versioned_store import (
        commit_overwrite,
        commit_upsert,
        read_version,
        rollback,
        versions,
    )

    store = str(tmp_path / "vstore_rb")
    df = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y")], "part string, k long, v string"
    )
    commit_overwrite(df, store, "part")
    bad = spark.createDataFrame([("a", 1, "CORRUPT")], "part string, k long, v string")
    commit_upsert(spark, store, bad, ["part", "k"])

    files_before = set(_os.listdir(f"{store}/data"))
    v3 = rollback(store, 1)
    assert v3 == 3 and versions(store) == [1, 2, 3]
    assert set(_os.listdir(f"{store}/data")) == files_before  # zero-copy
    m1 = _vs_man(store, 1)
    m3 = _vs_man(store, 3)
    assert {e["file"] for e in m3["files"]} == {e["file"] for e in m1["files"]}
    assert m3["rolled_back_from"] == 1
    # latest now reads the pre-corruption contents
    got = sorted(tuple(r) for r in read_version(spark, store).collect())
    assert got == [(1, "x", "a"), (2, "y", "b")]


def test_versioned_store_handles_escaped_partition_values(spark, tmp_path):
    """Hive-escaped partition directory names (space -> %20) must round
    back to RAW values in the manifest, or upsert's touched-set match
    and read_version's column restoration silently miss."""
    from engine.versioned_store import (
        commit_overwrite,
        commit_upsert,
        read_version,
    )

    store = str(tmp_path / "vstore_esc")
    df = spark.createDataFrame(
        [("web crawl", 1, "x"), ("books", 2, "y")],
        "part string, k long, v string",
    )
    commit_overwrite(df, store, "part")
    got = sorted(tuple(r) for r in read_version(spark, store).collect())
    assert got == [(1, "x", "web crawl"), (2, "y", "books")]
    # upsert into the escaped partition must match it as touched
    chg = spark.createDataFrame(
        [("web crawl", 1, "x2")], "part string, k long, v string"
    )
    v2 = commit_upsert(spark, store, chg, ["part", "k"])
    got2 = sorted(tuple(r) for r in read_version(spark, store, v2).collect())
    assert got2 == [(1, "x2", "web crawl"), (2, "y", "books")]
    pruned = read_version(spark, store, v2, partition_values=["web crawl"])
    assert [tuple(r) for r in pruned.collect()] == [(1, "x2", "web crawl")]
    # ADVICE r7: the manifest's per-file n_rows must be REAL for
    # escaped partitions too — input_file_name() URIs re-encode the
    # on-disk Hive-escaped name, and the old raw-name lookup silently
    # recorded n_rows=0, under-reporting version_diff's n_unchanged
    from engine.versioned_store import _read_manifest

    for v in (1, 2):
        by_part: dict[str, int] = {}
        for e in _read_manifest(store, v)["files"]:
            by_part[e["partition"]] = by_part.get(e["partition"], 0) + e["n_rows"]
        assert by_part == {"web crawl": 1, "books": 1}, (v, by_part)


def test_vstore_cli_versions_rollback_vacuum(spark, tmp_path, capsys):
    """The admin CLI drives the same store functions end-to-end."""
    from engine.__main__ import main as cli
    from engine.versioned_store import commit_overwrite, commit_upsert

    store = str(tmp_path / "vstore_cli")
    df = spark.createDataFrame([("a", 1, "x")], "part string, k long, v string")
    commit_overwrite(df, store, "part")
    commit_upsert(
        spark,
        store,
        spark.createDataFrame([("a", 1, "y")], "part string, k long, v string"),
        ["part", "k"],
    )
    assert cli(["vstore", "versions", store]) == 0
    out = capsys.readouterr().out
    assert "v00001" in out and "v00002: " in out and "(current)" in out
    # filtered reads through the CLI: partition + range + point
    assert cli(
        ["vstore", "read", store, "--partitions", "a",
         "--range", "k:1:", "--point", "v:y"]
    ) == 0
    out = capsys.readouterr().out
    assert "|y " in out and "|x " not in out
    # commit lineage through the CLI
    assert cli(["vstore", "history", store]) == 0
    out = capsys.readouterr().out
    assert "v00001: commit" in out and "v00002: commit" in out
    # the change feed through the CLI: v1->v2 was one update of k=1
    assert cli(
        ["vstore", "changes", store, "--from-version", "1",
         "--version", "2", "--keys", "part,k"]
    ) == 0
    out = capsys.readouterr().out
    assert "update_preimage" in out and "update_postimage" in out
    # compaction through the CLI (same rows, explicit file target)
    assert cli(
        ["vstore", "compact", store, "--files-per-partition", "1"]
    ) == 0
    out = capsys.readouterr().out
    assert "compacted as v00003" in out
    assert cli(["vstore", "rollback", store, "--version", "1"]) == 0
    assert cli(["vstore", "vacuum", store, "--keep", "1"]) == 0
    out = capsys.readouterr().out
    assert "kept latest 1" in out


def test_version_diff_reads_only_unshared_files_and_matches_naive(
    spark, tmp_path
):
    """The manifest-aware diff must equal the naive full diff AND its
    scan must touch only the files the two versions do not share (the
    copy-on-write dividend: diffing a refresh reads the touched
    partitions, never the table)."""
    import json as _json

    from engine.operators.versioning import diff_frames
    from engine.versioned_store import (
        commit_overwrite,
        commit_upsert,
        read_version,
        version_diff,
    )

    store = str(tmp_path / "vstore_diff")
    base = spark.createDataFrame(
        [("a", 1, 3, 11), ("b", 2, 5, 22), ("c", 3, 7, 33)],
        "source string, doc_id long, n_tokens long, h long",
    )
    commit_overwrite(base, store, "source")
    chg = spark.createDataFrame(
        [("a", 1, 4, 99), ("a", 9, 2, 44)],  # update doc 1, insert doc 9
        "source string, doc_id long, n_tokens long, h long",
    )
    commit_upsert(spark, store, chg, ["source", "doc_id"])

    fast = version_diff(spark, store, 1, 2)
    naive = diff_frames(
        read_version(spark, store, 1), read_version(spark, store, 2)
    )
    as_map = lambda df: {r.source: tuple(r)[1:] for r in df.collect()}  # noqa: E731
    assert as_map(fast) == as_map(naive)
    # partitions b and c were untouched -> all-unchanged via manifest
    m = as_map(fast)
    assert m["b"] == (0, 0, 0, 1, 0, 0) and m["c"] == (0, 0, 0, 1, 0, 0)
    assert m["a"][:4] == (1, 0, 1, 0)  # doc 9 added, doc 1 changed

    # the fast diff's scan set is exactly the unshared files
    m1 = _vs_man(store, 1)
    m2 = _vs_man(store, 2)
    shared = {e["file"] for e in m1["files"]} & {e["file"] for e in m2["files"]}
    unshared = (
        {e["file"] for e in m1["files"]} | {e["file"] for e in m2["files"]}
    ) - shared
    scanned = {f.rsplit("/", 1)[-1] for f in fast.inputFiles()}
    assert scanned == unshared
    assert shared  # and there genuinely was something to skip


def test_compact_version_shrinks_files_preserving_contents(spark, tmp_path):
    from engine.versioned_store import (
        commit_overwrite,
        compact_version,
        read_version,
        versions,
    )

    store = str(tmp_path / "vstore_cmp")
    df = spark.range(2000).selectExpr(
        "concat('p', id % 3) as part", "id as k", "md5(cast(id as string)) as v"
    )
    # a deliberately fragmented first commit (many tasks -> many files)
    commit_overwrite(df.repartition(16), store, "part")
    import json as _json

    m1 = _vs_man(store, 1)
    v2 = compact_version(spark, store)
    m2 = _vs_man(store, 2)
    assert len(m2["files"]) < len(m1["files"])
    assert m2["compacted_from"] == 1
    got = lambda v: sorted(  # noqa: E731
        tuple(r) for r in read_version(spark, store, v).collect()
    )
    assert got(1) == got(2)  # identical contents, fewer files
    assert versions(store) == [1, 2]


def test_versioned_store_additive_schema_evolution(spark, tmp_path):
    """A changeset introducing a new column must evolve the touched
    partitions (survivors null-filled), leave untouched partitions'
    files alone (their rows read as null in the new column), and keep
    the old version's schema old."""
    from engine.versioned_store import (
        commit_overwrite,
        commit_upsert,
        read_version,
    )

    store = str(tmp_path / "vstore_evo")
    v1_df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("b", 3, "z")],
        "part string, k long, v string",
    )
    commit_overwrite(v1_df, store, "part")
    chg = spark.createDataFrame(
        [("a", 1, "x2", 0.9)], "part string, k long, v string, score double"
    )
    v2 = commit_upsert(spark, store, chg, ["part", "k"])

    got = {
        r.k: (r.v, r.score, r.part)
        for r in read_version(spark, store, v2).collect()
    }
    assert got == {
        1: ("x2", 0.9, "a"),   # upserted, evolved
        2: ("y", None, "a"),   # survivor in the rewritten partition
        3: ("z", None, "b"),   # carried-forward old-schema partition
    }
    # time travel keeps the OLD schema old
    assert "score" not in read_version(spark, store, 1).columns


def test_streaming_versioned_ingest_keeps_history_readable(
    spark, tmp_path, monkeypatch
):
    """Each trigger must commit a NEW version (v1..v3 retained), doc
    counts must be monotonic (append-only ingest), v1 must equal the
    base slice AFTER both commits, and the version column must pin
    each snapshot distinctly."""
    from engine.operators.versioning import streaming_versioned_ingest
    from engine.versioned_store import versions

    monkeypatch.setenv("SPARK_GRAFT_CORPUS_OUT", str(tmp_path / "corpus"))
    rows = streaming_versioned_ingest(spark, SF_SMOKE).collect()
    by_v = {}
    for r in rows:
        by_v.setdefault(r.version, {})[r.source] = (r.n_docs, r.corpus_h)
    assert set(by_v) == {1, 2, 3}
    store = str(
        tmp_path / "corpus" / (os.path.basename(SF_SMOKE.rstrip("/")) + "_vingest")
    )
    assert versions(store) == [1, 2, 3]
    tot = {v: sum(n for n, _ in d.values()) for v, d in by_v.items()}
    assert tot[1] < tot[2] <= tot[3]  # monotone append-only ingest
    # v1 equals the base slice, verified from raw by DuckDB
    import duckdb as _duck

    from engine.operators.corpus_build import _IS_NEW_DUCK

    n_base = _duck.connect().execute(
        f"""SELECT count(*) FROM read_parquet('{SF_SMOKE}/documents.parquet')
            WHERE NOT ({_IS_NEW_DUCK})"""
    ).fetchone()[0]
    assert tot[1] == n_base


def test_commit_delete_and_purge_forget_a_key_on_disk(spark, tmp_path):
    """Copy-on-write delete: the new version lacks the key, time travel
    still sees it, and delete + vacuum PURGES it from disk entirely
    (an independent engine over every remaining data file finds no
    trace) while untouched partitions' shared files survive."""
    import duckdb as _duck
    import glob as _glob
    import json as _json

    from engine.versioned_store import (
        commit_delete,
        commit_overwrite,
        read_version,
        vacuum,
    )

    store = str(tmp_path / "vstore_del")
    df = spark.createDataFrame(
        [("a", 1, "keepme"), ("a", 2, "FORGET"), ("b", 3, "other")],
        "part string, k long, v string",
    )
    commit_overwrite(df, store, "part")
    doomed = spark.createDataFrame([("a", 2)], "part string, k long")
    v2 = commit_delete(spark, store, doomed, ["part", "k"])

    assert sorted(r.k for r in read_version(spark, store, v2).collect()) == [1, 3]
    assert sorted(r.k for r in read_version(spark, store, 1).collect()) == [1, 2, 3]
    m2 = _vs_man(store, 2)
    assert m2["deleted_keys"] == 1

    # purge: drop v1; the only files that ever held k=2 go with it
    b_files_before = {
        e["file"] for e in m2["files"] if e["partition"] == "b"
    }
    vacuum(store, keep_latest=1)
    remaining = _glob.glob(f"{store}/data/*.parquet")
    assert {f.rsplit("/", 1)[-1] for f in remaining} >= b_files_before
    con = _duck.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet({remaining!r}) WHERE v = 'FORGET'"
    ).fetchone()[0]
    assert n == 0  # no trace of the forgotten row anywhere on disk


def test_commit_conflict_on_racing_version_claim(spark, tmp_path):
    """Two writers claiming the same version number: the second claim
    must raise CommitConflict and leave the winner's manifest intact.
    A writer arriving AFTER the claim landed is not in a race at all:
    the claim is the commit point, so it builds on top (version =
    claimed head + 1) even while the winner's CURRENT hint lags."""
    import pytest as _pytest

    from engine.versioned_store import (
        CommitConflict,
        _claim_manifest,
        _manifest_path,
        _read_manifest,
        commit_overwrite,
        current_version,
        read_version,
    )

    store = str(tmp_path / "vstore_race")
    df = spark.createDataFrame([("a", 1, "x")], "part string, k long, v string")
    commit_overwrite(df, store, "part")
    # simulate the racing winner: v2's manifest claimed (CURRENT lags)
    import shutil as _shutil

    _shutil.copy(_manifest_path(store, 1), _manifest_path(store, 2))
    # the loser of the SAME version number conflicts at the claim
    with _pytest.raises(CommitConflict):
        _claim_manifest(store, {**_read_manifest(store, 1), "version": 2})
    # winner's v2 untouched; v1 still reads; claimed head is current
    assert _read_manifest(store, 2) == {**_read_manifest(store, 1)}
    assert [r.k for r in read_version(spark, store, 1).collect()] == [1]
    assert current_version(store) == 2
    # a LATER writer is unwedged: it commits on top of the claimed head
    v3 = commit_overwrite(df, store, "part")
    assert v3 == 3 and current_version(store) == 3


def test_store_guards_and_empty_snapshot_reads(spark, tmp_path):
    """The ADVICE r7 hardening pack: a fresh store rejects incremental
    commits with a clear error, key_cols must include the partition
    column (keys are immutable w.r.t. partition by contract), null
    partition values are rejected at commit time, a delete-everything
    snapshot stays readable as an EMPTY DataFrame (schema recorded in
    the manifest), and vacuum refuses keep_latest < 1 (which would
    delete the manifest CURRENT points to)."""
    import pytest as _pytest

    from engine.versioned_store import (
        commit_delete,
        commit_overwrite,
        commit_upsert,
        compact_version,
        read_version,
        vacuum,
    )

    store = str(tmp_path / "vstore_guards")
    df = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y")], "part string, k long, v string"
    )
    chg = spark.createDataFrame([("a", 1, "x2")], "part string, k long, v string")

    # incremental commits need a base version
    with _pytest.raises(ValueError, match="no committed version"):
        commit_upsert(spark, store, chg, ["part", "k"])
    with _pytest.raises(ValueError, match="no committed version"):
        commit_delete(spark, store, chg, ["part", "k"])

    # null partition values are rejected at commit, not round-tripped
    # as the __HIVE_DEFAULT_PARTITION__ literal
    with_null = spark.createDataFrame(
        [("a", 1, "x"), (None, 2, "y")], "part string, k long, v string"
    )
    with _pytest.raises(ValueError, match="null values in partition"):
        commit_overwrite(with_null, store + "_null", "part")

    commit_overwrite(df, store, "part")
    # key_cols must include the partition column
    with _pytest.raises(ValueError, match="must include the partition"):
        commit_upsert(spark, store, chg, ["k"])
    with _pytest.raises(ValueError, match="must include the partition"):
        commit_delete(spark, store, chg.select("part", "k"), ["k"])

    # delete EVERY row: the fileless snapshot is valid, reads empty
    # with the recorded schema, and compaction over it works
    v2 = commit_delete(spark, store, df.select("part", "k"), ["part", "k"])
    empty = read_version(spark, store, v2)
    assert empty.count() == 0
    assert sorted(empty.columns) == ["k", "part", "v"]
    v3 = compact_version(spark, store)
    assert read_version(spark, store, v3).count() == 0

    # vacuum guards: keep_latest < 1 refused; CURRENT stays readable
    with _pytest.raises(ValueError, match="keep_latest must be >= 1"):
        vacuum(store, keep_latest=0)
    vacuum(store, keep_latest=1)
    assert read_version(spark, store).count() == 0

    # a store whose only commit is an empty snapshot never creates
    # data/ — vacuum must not crash on the missing directory
    store2 = str(tmp_path / "vstore_empty_only")
    commit_overwrite(
        spark.createDataFrame([], "part string, k long"), store2, "part"
    )
    assert vacuum(store2, keep_latest=1) == []
    assert read_version(spark, store2).count() == 0


def test_read_version_is_one_scan_not_per_partition_unions(spark, tmp_path):
    """The 10k-file probe (tools/store_probe.py, SCALE_PROBE.md §store)
    pinned read_version's scale shape: a snapshot read must be ONE
    parquet scan plus a broadcast file→partition join, never the
    legacy per-partition union whose driver plan grew O(partitions).
    Pin the plan shape on a many-partition store, and pin that the
    single-scan path preserves the legacy semantics: additive schema
    evolution null-fills carried-forward files, and Hive-escaped
    partition values round-trip."""
    from engine.versioned_store import (
        commit_overwrite,
        commit_upsert,
        read_version,
    )

    store = str(tmp_path / "manyparts")
    df = spark.range(40).selectExpr(
        "concat('p ', id % 20) as part", "id as k", "id * 2 as v"
    )
    commit_overwrite(df, store, "part")
    snap = read_version(spark, store, 1)
    plan = snap._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan, plan
    assert plan.count("Relation") == 1, plan
    assert snap.count() == 40
    # escaped partition values ('p 0'..'p 19' contain a space) restore
    assert sorted(
        r.part for r in snap.select("part").distinct().collect()
    ) == sorted(f"p {i}" for i in range(20))

    # additive evolution: v2 rewrites ONE partition with a new column;
    # the other 19 partitions' carried-forward files lack it and must
    # read as null through the explicit-schema single scan
    chg = spark.createDataFrame(
        [("p 3", 3, 6, "new")], "part string, k long, v long, extra string"
    )
    commit_upsert(spark, store, chg, ["part", "k"])
    v2 = read_version(spark, store, 2)
    got = {r.k: r.extra for r in v2.collect()}
    assert got[3] == "new"
    assert sum(x is None for x in got.values()) == len(got) - 1


def test_zorder_compaction_clusters_files(spark, tmp_path):
    """compact_version(zorder_cols=…) must deliver the physical goods
    (round 8): on a store fragmented by upserts, the z-ordered
    compaction (a) preserves contents exactly, (b) shrinks the file
    count to files_per_partition, and (c) produces files whose REAL
    parquet footer rectangles on the z-dimensions are tight enough
    that a narrow range probe on either dimension skips most files —
    measured with pyarrow on the store's own data files, not
    simulated."""
    import os as _os

    import pyarrow.parquet as _pq

    from engine.versioned_store import (
        _DATA,
        _read_manifest,
        commit_overwrite,
        commit_upsert,
        compact_version,
        read_version,
    )

    store = str(tmp_path / "zstore")
    n = 4000
    df = spark.range(n).selectExpr(
        "'p0' as part",
        "id as x",
        # y decorrelated from x so single-key ordering can't serve both
        "(id * 2654435761) % 4096 as y",
    )
    commit_overwrite(df, store, "part")
    # fragment: 4 upserts, each touching the partition (task-count
    # files each, arrival order — the natural churn layout)
    for i in range(4):
        chg = spark.range(i * 50, i * 50 + 50).selectExpr(
            "'p0' as part", "id as x", "(id * 2654435761) % 4096 as y"
        )
        commit_upsert(spark, store, chg, ["part", "x"])
    before = read_version(spark, store)
    before_rows = sorted(map(tuple, before.collect()))

    # 16 output files: ideal z ranges align to the 16 sub-quadrants of
    # the (x, y) grid, so the +/-1-file straddle that repartitionByRange's
    # sampled boundaries can introduce (the sample seed is JVM-object
    # hashCode, nondeterministic) cannot flip the half-skipped assert
    # below — at 8 files one straddler sat exactly on the threshold
    fpp = 16
    v = compact_version(
        spark, store, files_per_partition=fpp, zorder_cols=["x", "y"]
    )
    man = _read_manifest(store, v)
    assert man["zorder"] == ["x", "y"]
    assert len(man["files"]) <= fpp
    after = read_version(spark, store, v)
    assert sorted(map(tuple, after.collect())) == before_rows

    # real footer rectangles on (x, y)
    rects = []
    for e in man["files"]:
        md = _pq.ParquetFile(
            _os.path.join(store, _DATA, e["file"])
        ).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo, hi = {}, {}
        for col in ("x", "y"):
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                lo[col] = min(lo.get(col, st.min), st.min)
                hi[col] = max(hi.get(col, st.max), st.max)
        rects.append((lo["x"], hi["x"], lo["y"], hi["y"]))
    assert len(rects) > 2
    # a narrow x probe (1/16 of the range) and a narrow y probe must
    # each skip at least half the files on their footer stats
    for dim, full in ((0, n), (2, 4096)):
        plo, phi = 0, full // 16
        hit = sum(
            1 for r in rects if r[dim] <= phi and r[dim + 1] >= plo
        )
        assert hit <= len(rects) // 2, (dim, hit, rects)


def test_stats_pruned_read_skips_files(spark, tmp_path):
    """Manifest-stats data skipping (round 8): commits record per-file
    numeric min/max from the staged footers, `_prune_entries` drops
    only provably empty files, and on a z-order-compacted store a
    narrow range read through read_version(range_filters=…) must (a)
    return exactly the predicate's rows and (b) prune most files
    catalog-side — counted from the manifest, before Spark lists
    anything. Conservative cases pinned too: a filter on a column
    with no stats keeps every file."""
    from engine.versioned_store import (
        _prune_entries,
        _read_manifest,
        commit_overwrite,
        compact_version,
        read_version,
    )

    store = str(tmp_path / "prstore")
    n = 4000
    df = spark.range(n).selectExpr(
        "'p0' as part",
        "id as x",
        "(id * 2654435761) % 4096 as y",
        "concat('s', lpad(cast(id as string), 6, '0')) as s",
    )
    commit_overwrite(df, store, "part")
    # 16 files for the same reason as test_zorder_compaction_clusters_files:
    # sub-quadrant-aligned ideal ranges make the half-pruned assert immune
    # to the one-file boundary straddle repartitionByRange sampling allows
    v = compact_version(
        spark, store, files_per_partition=16, zorder_cols=["x", "y"]
    )
    man = _read_manifest(store, v)
    assert all(
        set(e["stats"]) == {"x", "y", "s"} for e in man["files"]
    ), "numeric and string columns carry stats"

    # narrow x range: exact rows, most files pruned
    lo, hi = 100, 100 + n // 16
    kept = _prune_entries(man["files"], {"x": (lo, hi)})
    assert 0 < len(kept) <= len(man["files"]) // 2, (
        len(kept), len(man["files"])
    )
    got = sorted(
        r.x
        for r in read_version(
            spark, store, v, range_filters={"x": (lo, hi)}
        ).collect()
    )
    assert got == list(range(lo, hi + 1))

    # composed with the partition filter and half-open bounds
    top = read_version(
        spark, store, v,
        partition_values=["p0"],
        range_filters={"x": (n - 10, None)},
    )
    assert sorted(r.x for r in top.collect()) == list(range(n - 10, n))

    # string stats prune too: zero-padded s orders like x, so a point
    # probe keeps few files and rows come back exactly
    kept_s = _prune_entries(man["files"], {"s": ("s000100", "s000150")})
    assert 0 < len(kept_s) < len(man["files"])
    got_s = sorted(
        r.x
        for r in read_version(
            spark, store, v, range_filters={"s": ("s000100", "s000150")}
        ).collect()
    )
    assert got_s == list(range(100, 151))
    # a numeric bound against the string column's stats cannot be
    # compared — conservative keep, residual filter still exact
    kept_t = _prune_entries(man["files"], {"s": (0, 1)})
    assert len(kept_t) == len(man["files"])

    # an empty range reads as an empty frame, not a crash
    assert (
        read_version(
            spark, store, v, range_filters={"x": (n + 10, n + 20)}
        ).count()
        == 0
    )


def test_table_changes_feed(spark, tmp_path):
    """Change data feed (round 8): correct change typing with both
    update images, carried-forward files excluded from the read
    (counted via _unshared_entries), an empty feed across pure file
    movement (compaction), null-safe content comparison, and the
    guard rails (key must include the partition column; identical
    versions feed empty)."""
    from engine.versioned_store import (
        _read_manifest,
        _unshared_entries,
        commit_delete,
        commit_overwrite,
        commit_upsert,
        compact_version,
        table_changes,
    )

    store = str(tmp_path / "cdfstore")
    v1 = commit_overwrite(
        spark.createDataFrame(
            [("p0", 1, 10, None), ("p0", 2, 20, "x"), ("p1", 3, 30, "y")],
            "part string, k int, val int, tag string",
        ),
        store,
        "part",
    )
    # touch only p0: update k=1 (null tag -> 'new'), insert k=4,
    # carry k=2 through the rewrite unchanged
    v2 = commit_upsert(
        spark,
        store,
        spark.createDataFrame(
            [("p0", 1, 11, "new"), ("p0", 2, 20, "x"), ("p0", 4, 40, None)],
            "part string, k int, val int, tag string",
        ),
        ["part", "k"],
    )
    ma, mb = _read_manifest(store, v1), _read_manifest(store, v2)
    a_only, b_only = _unshared_entries(ma, mb)
    assert all(e["partition"] == "p0" for e in a_only + b_only), (
        "untouched partition p1 must stay shared (never read)"
    )
    feed = {
        (r.k, r._change_type): (r.val, r.tag)
        for r in table_changes(spark, store, v1, v2, ["part", "k"]).collect()
    }
    assert feed == {
        (1, "update_preimage"): (10, None),
        (1, "update_postimage"): (11, "new"),
        (4, "insert"): (40, None),
    }, feed  # k=2 rewritten identically: no row; k=3 shared: no row

    # deletes typed as deletes, with the deleted image
    v3 = commit_delete(
        spark,
        store,
        spark.createDataFrame([("p1", 3)], "part string, k int"),
        ["part", "k"],
    )
    d = table_changes(spark, store, v2, v3, ["part", "k"]).collect()
    assert [(r.k, r._change_type, r.val) for r in d] == [(3, "delete", 30)]

    # pure file movement emits nothing
    v4 = compact_version(spark, store, files_per_partition=1)
    assert table_changes(spark, store, v3, v4, ["part", "k"]).count() == 0

    # identical versions: empty frame, schema intact
    same = table_changes(spark, store, v4, v4, ["part", "k"])
    assert same.count() == 0
    assert "_change_type" in same.columns

    # key must include the partition column
    with pytest.raises(ValueError, match="partition column"):
        table_changes(spark, store, v1, v2, ["k"])


def test_cdf_rollup_maintained_equals_direct(spark, monkeypatch, tmp_path):
    """The feed-maintained rollup must byte-equal the direct recompute
    of the final version — per source, including the xor corpus hash
    (the oracle pins each facet against its own relational replay;
    this pins the two facets against EACH OTHER)."""
    from engine.operators.versioning import store_cdf_rollup
    from tests.conftest import SF_SMOKE

    monkeypatch.setenv("SPARK_GRAFT_CORPUS_OUT", str(tmp_path / "corpus"))
    rows = store_cdf_rollup(spark, SF_SMOKE).collect()
    facets = {"direct": {}, "maintained": {}}
    for r in rows:
        facets[r.facet][r.source] = (r.n_docs, r.n_tokens, r.corpus_h)
    assert facets["direct"] == facets["maintained"]
    assert facets["direct"], "empty rollup would vacuously pass"


def test_string_stats_truncation_rounds_up(spark, tmp_path):
    """Delta's 32-char rule: a recorded string max longer than the
    truncation width must round UP (rightmost incrementable char
    bumped, tail dropped), so a probe lexically above the stored
    PREFIX but below the true max never wrongly prunes the file; the
    min is prefix-cut (a valid lower bound). Pure round-up helper
    edges pinned too."""
    from engine.versioned_store import (
        _STAT_TRUNC,
        _prune_entries,
        _read_manifest,
        _round_up_string,
        commit_overwrite,
        read_version,
    )

    assert _round_up_string("abc") == "abc"  # short: exact
    long = "a" * _STAT_TRUNC + "zzz"
    assert _round_up_string(long) == "a" * (_STAT_TRUNC - 1) + "b"
    assert _round_up_string(chr(0x10FFFF) * 40) is None

    store = str(tmp_path / "trstore")
    pad = "m" * 40  # every value exceeds the truncation width
    df = spark.createDataFrame(
        [("p0", 1, pad + "aaa"), ("p0", 2, pad + "qqq")],
        "part string, k int, s string",
    ).coalesce(1)
    v = commit_overwrite(df, store, "part")
    (entry,) = _read_manifest(store, v)["files"]
    lo, hi = entry["stats"]["s"]
    assert lo == pad[:_STAT_TRUNC] and len(lo) == _STAT_TRUNC
    assert hi == "m" * (_STAT_TRUNC - 1) + "n", hi  # rounded UP past max
    # the probe sits above the stored PREFIX but inside the true data:
    # a rounded-DOWN max ('mmm…m') would wrongly prune this file
    probe = (pad + "q", pad + "r")
    assert len(_prune_entries([entry], {"s": probe})) == 1
    rows = read_version(spark, store, v, range_filters={"s": probe}).collect()
    assert [r.k for r in rows] == [2]
    # a probe provably above the rounded-up max still prunes
    assert _prune_entries([entry], {"s": ("n", None)}) == []


def test_streaming_cdf_rollup_maintains_across_triggers(
    spark, tmp_path, monkeypatch
):
    """The persisted rollup maintained per trigger from the change
    feed must equal the direct recompute of the final version, the
    second trigger's feed must contain real UPDATE images (the
    re-crawl path), and the per-version rollup files must exist for
    every committed version (state persisted BETWEEN micro-batches,
    not recomputed at the end)."""
    import os as _os

    from engine.operators.corpus_build import corpus_out_dir
    from engine.operators.versioning import streaming_cdf_rollup
    from engine.versioned_store import current_version, table_changes
    from tests.conftest import SF_SMOKE

    monkeypatch.setenv("SPARK_GRAFT_CORPUS_OUT", str(tmp_path / "corpus"))
    rows = streaming_cdf_rollup(spark, SF_SMOKE).collect()
    facets = {"direct": {}, "maintained": {}}
    for r in rows:
        facets[r.facet][r.source] = (r.n_docs, r.n_tokens, r.corpus_h)
    assert facets["direct"] == facets["maintained"]
    assert facets["direct"]

    store = corpus_out_dir(SF_SMOKE) + "_vcdfroll"
    assert current_version(store) == 3
    for v in (1, 2, 3):
        assert _os.path.isdir(f"{store}_rollup/v{v}")
    types = {
        r._change_type
        for r in table_changes(
            spark, store, 2, 3, ["source", "doc_id"]
        ).collect()
    }
    assert {"insert", "update_preimage", "update_postimage"} <= types


def test_bloom_point_lookup_skips_files(spark, tmp_path):
    """Bloom-sidecar point-lookup skipping (round 8): commits with
    bloom_cols write a per-file bloom sidecar; read_version(
    point_filters=...) prunes files whose bloom proves the value
    absent and returns exactly the equality's rows. No false
    negatives across EVERY stored key; upserts inherit the config and
    carry forward old files' blooms; rollback copies the sidecar;
    vacuum removes dropped versions' sidecars; null probes rejected."""
    import os as _os

    from engine.versioned_store import (
        _bloom_path,
        _bloom_prune,
        _read_bloom_sidecar,
        _read_manifest,
        commit_overwrite,
        commit_upsert,
        read_version,
        rollback,
        vacuum,
    )

    store = str(tmp_path / "blstore")
    n = 2000
    df = spark.range(n).selectExpr(
        "concat('p', id % 4) as part",
        "id as k",
        # high-cardinality unclustered string key (the content-hash shape)
        "md5(concat('key:', cast(id as string))) as ck",
    )
    v1 = commit_overwrite(df, store, "part", bloom_cols=["ck"])
    sc = _read_bloom_sidecar(store, v1)
    assert sc and sc["cols"] == ["ck"] and sc["bits"] == 8192
    man = _read_manifest(store, v1)
    assert set(sc["files"]) == {e["file"] for e in man["files"]}

    # point probe: most files pruned, exactly one row back
    import hashlib as _hl

    probe = _hl.md5(b"key:137").hexdigest()
    kept = _bloom_prune(man["files"], sc, {"ck": probe})
    assert 0 < len(kept) <= max(1, len(man["files"]) // 2), (
        len(kept), len(man["files"]),
    )
    rows = read_version(
        spark, store, v1, point_filters={"ck": probe}
    ).collect()
    assert [(r.k, r.part) for r in rows] == [(137, "p1")]

    # no false negatives: every stored key's bloom admits its own file
    by_file = {e["file"]: e for e in man["files"]}
    for r in spark.read.parquet(f"{store}/data").selectExpr("ck").collect():
        assert _bloom_prune(list(by_file.values()), sc, {"ck": r.ck})

    # absent key: everything pruned, empty frame (schema intact)
    miss = read_version(
        spark, store, v1, point_filters={"ck": "0" * 32}
    )
    assert miss.count() == 0 and "ck" in miss.columns

    # upsert INHERITS the bloom config; carried files keep their blooms
    v2 = commit_upsert(
        spark,
        store,
        spark.createDataFrame(
            [("p0", n + 1, _hl.md5(b"key:new").hexdigest())],
            "part string, k long, ck string",
        ),
        ["part", "k"],
    )
    sc2 = _read_bloom_sidecar(store, v2)
    assert sc2 and sc2["cols"] == ["ck"]
    man2 = _read_manifest(store, v2)
    assert set(sc2["files"]) == {e["file"] for e in man2["files"]}
    carried = {e["file"] for e in man2["files"]} & {
        e["file"] for e in man["files"]
    }
    assert carried and all(
        sc2["files"][f] == sc["files"][f] for f in carried
    )
    got = read_version(
        spark, store, v2,
        point_filters={"ck": _hl.md5(b"key:new").hexdigest()},
    ).collect()
    assert [r.k for r in got] == [n + 1]

    # rollback copies the sidecar; vacuum drops the losers' sidecars
    v3 = rollback(store, v1)
    assert _read_bloom_sidecar(store, v3) == sc
    vacuum(store, keep_latest=1)
    assert not _os.path.exists(_bloom_path(store, v1))
    assert _read_bloom_sidecar(store, v3) == sc

    # null probes rejected
    with pytest.raises(ValueError, match="non-null"):
        read_version(spark, store, v3, point_filters={"ck": None})


def test_cdf_minhash_index_maintained_equals_rebuild(
    spark, tmp_path, monkeypatch
):
    """The CDC-maintained LSH band index must equal the full rebuild
    per source (entries + xor'd entry hash), keep one stored index per
    version, and hold no entries for deleted documents."""
    from engine.operators.corpus_build import corpus_out_dir
    from engine.operators.versioning import store_cdf_minhash_index
    from tests.conftest import SF_SMOKE

    monkeypatch.setenv("SPARK_GRAFT_CORPUS_OUT", str(tmp_path / "corpus"))
    rows = store_cdf_minhash_index(spark, SF_SMOKE).collect()
    facets = {"direct": {}, "maintained": {}}
    for r in rows:
        facets[r.facet][r.source] = (r.n_entries, r.idx_h)
    assert facets["direct"] == facets["maintained"]
    assert facets["direct"]

    idx_dir = corpus_out_dir(SF_SMOKE) + "_mhidx_index"
    final = spark.read.parquet(f"{idx_dir}/v4")
    for v in (1, 2, 3):
        assert spark.read.parquet(f"{idx_dir}/v{v}").count() > 0
    assert final.filter("doc_id % 11 = 5").count() == 0
    # updated docs are indexed under their NEW bands only: entry count
    # per doc is exactly the band count (no stale duplicates)
    dup = (
        final.groupBy("doc_id", "band").count().filter("count > 1").count()
    )
    assert dup == 0


def test_multicolumn_partitioned_store(spark, tmp_path):
    """Composite partitioning (round 8): a (source, day) store runs
    the full lifecycle — overwrite, upsert touching ONE cell (other
    cells' files carry forward), tuple partition_values pruning,
    stats/point filters composing, the change feed, z-ordered
    compaction and vacuum — with single-column manifests unchanged
    (version_diff stays single-col and says so)."""
    from engine.versioned_store import (
        _read_manifest,
        commit_overwrite,
        commit_upsert,
        compact_version,
        read_version,
        table_changes,
        vacuum,
        version_diff,
    )

    store = str(tmp_path / "mcstore")
    n = 800
    df = spark.range(n).selectExpr(
        "concat('s', id % 2) as source",
        "concat('d', id % 3) as day",
        "id as k",
        "(id * 2654435761) % 4096 as y",
        "concat('v1:', id) as v",
    )
    v1 = commit_overwrite(df, store, ["source", "day"])
    man = _read_manifest(store, v1)
    assert man["partition_col"] == ["source", "day"]
    assert all(
        isinstance(e["partition"], list) and len(e["partition"]) == 2
        for e in man["files"]
    )
    assert read_version(spark, store, v1).count() == n

    # tuple partition pruning: one cell only
    cell = read_version(
        spark, store, v1, partition_values=[("s0", "d1")]
    )
    got = {r.k for r in cell.collect()}
    assert got == {i for i in range(n) if i % 2 == 0 and i % 3 == 1}

    # composed with a range filter on the stats
    narrow = read_version(
        spark, store, v1,
        partition_values=[("s0", "d1")],
        range_filters={"k": (0, 99)},
    )
    assert {r.k for r in narrow.collect()} == {
        i for i in range(100) if i % 2 == 0 and i % 3 == 1
    }

    # upsert touching only (s1, d2): every other cell's files carry
    chg = spark.createDataFrame(
        [("s1", "d2", 5, 999, "v2:5")],
        "source string, day string, k long, y long, v string",
    )
    v2 = commit_upsert(spark, store, chg, ["source", "day", "k"])
    man2 = _read_manifest(store, v2)
    carried = {e["file"] for e in man["files"]} & {
        e["file"] for e in man2["files"]
    }
    untouched = {
        tuple(e["partition"])
        for e in man["files"]
        if e["file"] in carried
    }
    # every other cell's files all carry; within (s1, d2) the
    # file-granular planner (round 11) rewrites exactly the files
    # whose stats admit k=5 and carries the rest verbatim
    assert len(untouched) >= 5
    for e in man["files"]:
        if tuple(e["partition"]) != ("s1", "d2"):
            assert e["file"] in carried
            continue
        lo, hi = e["stats"]["k"]
        assert (e["file"] in carried) == (not lo <= 5 <= hi)
    assert read_version(spark, store, v2).filter(
        "k = 5"
    ).collect()[0].v == "v2:5"

    # partition columns must all be in the upsert key
    with pytest.raises(ValueError, match="partition column"):
        commit_upsert(spark, store, chg, ["source", "k"])

    # the change feed types the update with both images
    feed = {
        (r.k, r._change_type): r.v
        for r in table_changes(
            spark, store, v1, v2, ["source", "day", "k"]
        ).collect()
    }
    assert feed == {
        (5, "update_preimage"): "v1:5",
        (5, "update_postimage"): "v2:5",
    }

    # version_diff is the single-column corpus shape: clear error
    with pytest.raises(ValueError, match="single partition column"):
        version_diff(spark, store, v1, v2)

    # z-ordered compaction preserves content across composite cells
    before = sorted(
        map(tuple, read_version(spark, store, v2).collect())
    )
    v3 = compact_version(
        spark, store, files_per_partition=1, zorder_cols=["k", "y"]
    )
    assert sorted(
        map(tuple, read_version(spark, store, v3).collect())
    ) == before
    assert vacuum(store, keep_latest=1) != []
    assert read_version(spark, store, v3).count() == n


# -- optimistic concurrency (round 8 continuation) -----------------------------


def _occ_base(spark, store, bloom=False):
    from engine.versioned_store import commit_overwrite

    df = spark.createDataFrame(
        [("a", 1, "a1"), ("a", 2, "a2"), ("b", 3, "b3"), ("c", 4, "c4")],
        "part string, k long, v string",
    )
    commit_overwrite(
        df, store, "part", bloom_cols=["v"] if bloom else None, bloom_bits=256
    )
    return df


def _interleave_claim(monkeypatch, winner):
    """Patch _claim_manifest so the WINNER's commit lands immediately
    before the patched caller's first claim attempt — a deterministic
    replay of the classic optimistic-concurrency race (both writers
    prepared against the same base; the winner publishes first)."""
    import engine.versioned_store as vs

    real = vs._claim_manifest
    fired = []

    def hooked(store_, manifest):
        if not fired:
            fired.append(1)
            winner()  # re-enters hooked with fired set -> real claim
        return real(store_, manifest)

    monkeypatch.setattr(vs, "_claim_manifest", hooked)


def test_disjoint_concurrent_upserts_rebase_and_land(
    spark, monkeypatch, tmp_path, capsys
):
    """Two writers prepared against v1: A upserts partition 'a', B
    upserts partition 'b'. A wins the v2 claim; B (max_retries=1)
    must REBASE — carrying A's new 'a' files forward — and land as v3
    with both changes applied, zero recompute. Blooms stay current
    through the rebase (point lookups find every key), and the change
    feed v1->v3 shows exactly both updates."""
    import json as _json

    import engine.versioned_store as vs

    store = str(tmp_path / "occ_disjoint")
    _occ_base(spark, store, bloom=True)
    chg_a = spark.createDataFrame(
        [("a", 1, "A1!")], "part string, k long, v string"
    )
    chg_b = spark.createDataFrame(
        [("b", 3, "B3!"), ("b", 5, "B5+")], "part string, k long, v string"
    )
    _interleave_claim(
        monkeypatch,
        lambda: vs.commit_upsert(spark, store, chg_a, ["part", "k"]),
    )
    v = vs.commit_upsert(spark, store, chg_b, ["part", "k"], max_retries=1)
    assert v == 3 and vs.current_version(store) == 3
    man = _vs_man(store, 3)
    assert man["rebased_from_base"] == 1
    got = sorted(
        tuple(r) for r in vs.read_version(spark, store, 3).collect()
    )
    assert got == [
        (1, "A1!", "a"),
        (2, "a2", "a"),
        (3, "B3!", "b"),
        (4, "c4", "c"),
        (5, "B5+", "b"),
    ]
    # serializability: the rebased history equals the serial order A;B
    # (and by disjointness B;A) applied to the base
    feed = vs.table_changes(spark, store, 1, 3, ["part", "k"])
    typed = sorted(
        (r.part, r.k, r.v, r._change_type) for r in feed.collect()
    )
    assert typed == [
        ("a", 1, "A1!", "update_postimage"),
        ("a", 1, "a1", "update_preimage"),
        ("b", 3, "B3!", "update_postimage"),
        ("b", 3, "b3", "update_preimage"),
        ("b", 5, "B5+", "insert"),
    ]
    # bloom sidecar carried/rebuilt correctly through the rebase:
    # every live value is findable via point pruning
    for val, k in (("A1!", 1), ("B3!", 3), ("B5+", 5), ("c4", 4)):
        rows = vs.read_version(
            spark, store, 3, point_filters={"v": val}
        ).collect()
        assert [(r.k, r.v) for r in rows] == [(k, val)]
    # rebase provenance surfaces in the admin CLI's lineage view
    from engine.__main__ import main as cli

    assert cli(["vstore", "history", store]) == 0
    out = capsys.readouterr().out
    assert "v00003: commit" in out and "rebased_from_base=v00001" in out


def test_overlapping_concurrent_upserts_conflict(
    spark, monkeypatch, tmp_path
):
    """Both writers touch partition 'a': the loser must raise
    CommitConflict no matter how many retries — rebasing would
    silently discard the winner's rewrite of the shared partition."""
    import pytest as _pytest

    import engine.versioned_store as vs

    store = str(tmp_path / "occ_overlap")
    _occ_base(spark, store)
    chg_a = spark.createDataFrame(
        [("a", 1, "A!")], "part string, k long, v string"
    )
    chg_b = spark.createDataFrame(
        [("a", 2, "B!"), ("b", 3, "B3")], "part string, k long, v string"
    )
    _interleave_claim(
        monkeypatch,
        lambda: vs.commit_upsert(spark, store, chg_a, ["part", "k"]),
    )
    with _pytest.raises(vs.CommitConflict, match="changed partition"):
        vs.commit_upsert(spark, store, chg_b, ["part", "k"], max_retries=5)
    # the winner's commit is intact and the loser left no manifest
    assert vs.versions(store) == [1, 2]
    got = sorted(
        (r.k, r.v) for r in vs.read_version(spark, store, 2).collect()
    )
    assert got == [(1, "A!"), (2, "a2"), (3, "b3"), (4, "c4")]


def test_concurrent_compaction_conflicts_with_rebase(
    spark, monkeypatch, tmp_path
):
    """An intervening compaction rewrites EVERY partition's file set,
    so any concurrent incremental commit must conflict (Delta's
    OPTIMIZE-vs-MERGE case) rather than resurrect pre-compaction
    files for its untouched partitions."""
    import pytest as _pytest

    import engine.versioned_store as vs

    store = str(tmp_path / "occ_compact")
    _occ_base(spark, store)
    chg_b = spark.createDataFrame(
        [("b", 5, "B5")], "part string, k long, v string"
    )
    _interleave_claim(monkeypatch, lambda: vs.compact_version(spark, store))
    with _pytest.raises(vs.CommitConflict, match="changed partition"):
        vs.commit_upsert(spark, store, chg_b, ["part", "k"], max_retries=3)


def test_concurrent_schema_evolution_conflicts_with_rebase(
    spark, monkeypatch, tmp_path
):
    """The winner evolves the schema (new column) on a DISJOINT
    partition: partition math alone would admit the rebase, but the
    loser's manifest would record the OLD column set and reads of the
    head would silently drop the new column — so it must conflict."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    import engine.versioned_store as vs

    store = str(tmp_path / "occ_schema")
    _occ_base(spark, store)
    chg_a = spark.createDataFrame(
        [("a", 1, "A!", 9)], "part string, k long, v string, extra long"
    )
    chg_b = spark.createDataFrame(
        [("b", 3, "B!")], "part string, k long, v string"
    )
    _interleave_claim(
        monkeypatch,
        lambda: vs.commit_upsert(spark, store, chg_a, ["part", "k"]),
    )
    with _pytest.raises(vs.CommitConflict, match="schema"):
        vs.commit_upsert(spark, store, chg_b, ["part", "k"], max_retries=2)
    # evolved column survives on the winner's head
    head = vs.read_version(spark, store, 2)
    assert [r.extra for r in head.filter(F.col("k") == 1).collect()] == [9]


def test_disjoint_concurrent_delete_rebases(spark, monkeypatch, tmp_path):
    """commit_delete shares the rebase path: a delete of partition 'c'
    racing an upsert of partition 'a' lands as v3 with both effects."""
    import engine.versioned_store as vs

    store = str(tmp_path / "occ_delete")
    _occ_base(spark, store)
    chg_a = spark.createDataFrame(
        [("a", 1, "A!")], "part string, k long, v string"
    )
    doomed = spark.createDataFrame([("c", 4)], "part string, k long")
    _interleave_claim(
        monkeypatch,
        lambda: vs.commit_upsert(spark, store, chg_a, ["part", "k"]),
    )
    v = vs.commit_delete(spark, store, doomed, ["part", "k"], max_retries=1)
    assert v == 3
    got = sorted(
        (r.k, r.v) for r in vs.read_version(spark, store, 3).collect()
    )
    assert got == [(1, "A!"), (2, "a2"), (3, "b3")]


def test_losing_racer_cannot_clobber_winner_bloom_sidecar(
    spark, monkeypatch, tmp_path
):
    """Commit order is claim -> sidecar -> CURRENT: a loser that never
    wins the claim must never write the version's bloom sidecar. Under
    the old sidecar-first order the loser's rename replaced the
    winner's bloom-v2.json with blooms for files the winner never
    committed — pruning against them silently drops rows. The winner
    (manifest + sentinel sidecar) lands between the loser computing
    its version number and attempting the claim."""
    import json as _json
    import shutil as _shutil

    import pytest as _pytest

    import engine.versioned_store as vs

    store = str(tmp_path / "occ_bloom_race")
    df = _occ_base(spark, store, bloom=True)
    sentinel = {"bits": 256, "k": 4, "cols": ["v"], "files": {"W": {}}}

    def winner():
        _shutil.copy(
            vs._manifest_path(store, 1), vs._manifest_path(store, 2)
        )
        with open(vs._bloom_path(store, 2), "w", encoding="utf-8") as f:
            f.write(_json.dumps(sentinel))

    _interleave_claim(monkeypatch, winner)
    with _pytest.raises(vs.CommitConflict):
        vs.commit_overwrite(df, store, "part", bloom_cols=["v"])
    assert _json.load(open(vs._bloom_path(store, 2))) == sentinel


def test_threaded_disjoint_upserts_both_land(spark, tmp_path):
    """A REAL race: two threads commit disjoint-partition upserts
    through the same SparkSession with max_retries. Whatever the
    interleaving, both must land (versions 2 and 3) and the final
    snapshot must equal the serial application of both changesets."""
    import threading

    import engine.versioned_store as vs

    store = str(tmp_path / "occ_threads")
    _occ_base(spark, store)
    chg = {
        "A": spark.createDataFrame(
            [("a", 1, "TA")], "part string, k long, v string"
        ),
        "B": spark.createDataFrame(
            [("b", 3, "TB")], "part string, k long, v string"
        ),
    }
    barrier = threading.Barrier(2)
    results: dict[str, int | Exception] = {}

    def run(name):
        try:
            barrier.wait(timeout=60)
            results[name] = vs.commit_upsert(
                spark, store, chg[name], ["part", "k"], max_retries=4
            )
        except Exception as exc:  # surface in the main thread
            results[name] = exc

    ts = [threading.Thread(target=run, args=(n,)) for n in ("A", "B")]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert sorted(
        v for v in results.values() if isinstance(v, int)
    ) == [2, 3], results
    got = sorted(
        (r.k, r.v) for r in vs.read_version(spark, store, 3).collect()
    )
    assert got == [(1, "TA"), (2, "a2"), (3, "TB"), (4, "c4")]


def test_type_widening_schema_evolution(spark, tmp_path):
    """Delta-style type widening: an int->bigint (and float->double)
    changeset widens the RECORDED schema; old narrow files upcast at
    read time (Spark 4 parquet widening — nothing is rewritten), time
    travel keeps v1 at its own width, and the change feed across the
    widening boundary aligns both sides to the wide type."""
    import engine.versioned_store as vs

    store = str(tmp_path / "widen")
    base = spark.createDataFrame(
        [("a", 1, 10, 1.5), ("b", 2, 20, 2.5)],
        "part string, k int, v int, x float",
    )
    vs.commit_overwrite(base, store, "part")
    assert vs._read_manifest(store, 1)["columns"] == "k int, v int, x float"

    chg = spark.createDataFrame(
        [("a", 1, 2**40, 3.25)], "part string, k long, v long, x double"
    )
    v2 = vs.commit_upsert(spark, store, chg, ["part", "k"])
    assert (
        vs._read_manifest(store, v2)["columns"]
        == "k bigint, v bigint, x double"
    )
    got = sorted(
        (r.part, r.k, r.v, r.x)
        for r in vs.read_version(spark, store, v2).collect()
    )
    assert got == [("a", 1, 2**40, 3.25), ("b", 2, 20, 2.5)]
    # time travel: v1 reads its own (narrow) schema unchanged
    assert dict(vs.read_version(spark, store, 1).dtypes)["v"] == "int"
    # the feed across the widening boundary: one update, typed wide
    feed = vs.table_changes(spark, store, 1, v2, ["part", "k"])
    assert dict(feed.dtypes)["v"] == "bigint"
    assert sorted((r.k, r.v, r._change_type) for r in feed.collect()) == [
        (1, 10, "update_preimage"),
        (1, 2**40, "update_postimage"),
    ]


def test_upsert_cannot_narrow_or_drop_schema(spark, tmp_path):
    """A commit whose touched partitions have NO survivors used to
    record the changeset's schema verbatim — narrowing the table (or
    dropping a column) for every carried-forward file. The recorded
    schema must stay the reconciled union."""
    import engine.versioned_store as vs

    store = str(tmp_path / "narrow")
    base = spark.createDataFrame(
        [("a", 1, 2**40)], "part string, k long, v long"
    )
    vs.commit_overwrite(base, store, "part")

    # narrow changeset into a brand-new partition: schema stays bigint
    chg = spark.createDataFrame([("c", 7, 70)], "part string, k int, v int")
    v2 = vs.commit_upsert(spark, store, chg, ["part", "k"])
    assert vs._read_manifest(store, v2)["columns"] == "k bigint, v bigint"
    got = sorted(
        (r.part, r.k, r.v)
        for r in vs.read_version(spark, store, v2).collect()
    )
    assert got == [("a", 1, 2**40), ("c", 7, 70)]

    # changeset MISSING column v into another new partition: the
    # column survives (null-filled for the new rows), never dropped
    chg2 = spark.createDataFrame([("d", 9)], "part string, k long")
    v3 = vs.commit_upsert(spark, store, chg2, ["part", "k"])
    assert vs._read_manifest(store, v3)["columns"] == "k bigint, v bigint"
    got = sorted(
        (r.part, r.k, r.v)
        for r in vs.read_version(spark, store, v3).collect()
    )
    assert got == [("a", 1, 2**40), ("c", 7, 70), ("d", 9, None)]


def test_incompatible_type_change_raises_before_staging(spark, tmp_path):
    """An off-ladder type change (string column arriving as long) must
    raise at commit time — BEFORE any files are staged — and leave the
    store fully intact."""
    import glob as _glob

    import pytest as _pytest

    import engine.versioned_store as vs

    store = str(tmp_path / "incompat")
    base = spark.createDataFrame([("a", 1, "x")], "part string, k long, v string")
    vs.commit_overwrite(base, store, "part")
    files_before = set(_glob.glob(f"{store}/data/*.parquet"))

    bad = spark.createDataFrame([("a", 1, 99)], "part string, k long, v long")
    with _pytest.raises(ValueError, match="not a widening conversion"):
        vs.commit_upsert(spark, store, bad, ["part", "k"])
    assert vs.versions(store) == [1]
    assert set(_glob.glob(f"{store}/data/*.parquet")) == files_before
    assert [
        (r.k, r.v) for r in vs.read_version(spark, store, 1).collect()
    ] == [(1, "x")]


def test_concurrent_streaming_ingest_through_occ(spark, tmp_path):
    """The operational composition: TWO ingest streams (one per
    source) land micro-batches into the SAME versioned store, each
    foreachBatch committing with max_retries. The racing commits must
    all land via rebase (disjoint partitions by construction), the
    history must be linear, and the final snapshot must hold every
    batch's rows exactly once."""
    import os as _os
    import threading

    import engine.versioned_store as vs
    from engine.operators.versioning import _land_batch

    store = str(tmp_path / "occ_stream")
    schema = "part string, k long, v string"
    base = spark.createDataFrame(
        [("s1", 0, "base"), ("s2", 0, "base")], schema
    )
    vs.commit_overwrite(base, store, "part")

    lands = {}
    for src in ("s1", "s2"):
        land = str(tmp_path / f"land_{src}")
        _os.makedirs(land)
        for b in (1, 2):
            _land_batch(
                spark.createDataFrame([(src, b, f"{src}:b{b}")], schema),
                land,
                f"batch{b}.parquet",
            )
        lands[src] = land

    barrier = threading.Barrier(2)
    errs: dict[str, Exception] = {}

    def run(src):
        try:
            barrier.wait(timeout=60)

            def commit(batch_df, _bid):
                vs.commit_upsert(
                    spark, store, batch_df, ["part", "k"], max_retries=8
                )

            (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(lands[src])
                .writeStream.foreachBatch(commit)
                .option(
                    "checkpointLocation", str(tmp_path / f"ckpt_{src}")
                )
                .trigger(availableNow=True)
                .start()
                .awaitTermination(300)
            )
        except Exception as exc:
            errs[src] = exc

    ts = [threading.Thread(target=run, args=(s,)) for s in ("s1", "s2")]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    assert not errs, errs
    # 1 base + 4 micro-batch commits, linear history, all readable
    assert vs.versions(store) == [1, 2, 3, 4, 5]
    got = sorted(
        (r.part, r.k, r.v)
        for r in vs.read_version(spark, store, 5).collect()
    )
    assert got == [
        ("s1", 0, "base"),
        ("s1", 1, "s1:b1"),
        ("s1", 2, "s1:b2"),
        ("s2", 0, "base"),
        ("s2", 1, "s2:b1"),
        ("s2", 2, "s2:b2"),
    ]
    for v in vs.versions(store):  # every intermediate version reads
        assert vs.read_version(spark, store, v).count() >= 2


def test_partition_evolution_via_overwrite(spark, tmp_path):
    """Re-partitioning is a full-snapshot overwrite (Delta requires
    the same): the new version reads with its OWN partition column,
    old versions keep theirs, and the cross-boundary feed and diff
    fail with a clear error instead of restoring wrong columns."""
    import pytest as _pytest

    import engine.versioned_store as vs

    store = str(tmp_path / "pevolve")
    df = spark.createDataFrame(
        [("a", "eu", 1, "x"), ("b", "us", 2, "y")],
        "part string, region string, k long, v string",
    )
    vs.commit_overwrite(df, store, "part")
    v2 = vs.commit_overwrite(df, store, "region")
    assert vs._read_manifest(store, v2)["partition_col"] == "region"
    got = sorted(
        (r.part, r.region, r.k)
        for r in vs.read_version(spark, store, v2).collect()
    )
    assert got == [("a", "eu", 1), ("b", "us", 2)]
    # v1 still reads with its own partitioning
    assert {e["partition"] for e in vs._read_manifest(store, 1)["files"]} == {
        "a", "b"
    }
    with _pytest.raises(ValueError, match="different partition columns"):
        vs.table_changes(spark, store, 1, v2, ["part", "region", "k"])
    with _pytest.raises(ValueError, match="different partition columns"):
        vs.version_diff(spark, store, 1, v2)


def test_commit_expectations_fail_and_drop(spark, tmp_path, capsys):
    """Commit-time data contract: 'fail' raises with per-expectation
    violation counts and leaves the store byte-untouched; 'drop'
    commits only the passing rows and records the counts in the
    manifest (surfaced by the history CLI). NULL predicate values are
    violations — a contract you cannot evaluate is not met."""
    import glob as _glob

    import pytest as _pytest

    import engine.versioned_store as vs

    store = str(tmp_path / "expect")
    base = spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 20)], "part string, k long, v long"
    )
    vs.commit_overwrite(base, store, "part")
    files_before = set(_glob.glob(f"{store}/data/*.parquet"))

    chg = spark.createDataFrame(
        [("a", 3, 5), ("a", 4, -1), ("b", 5, None)],
        "part string, k long, v long",
    )
    exp = {"v_positive": "v > 0", "v_small": "v < 100"}
    with _pytest.raises(vs.ExpectationViolation) as ei:
        vs.commit_upsert(
            spark, store, chg, ["part", "k"], expectations=exp
        )
    # v=-1 fails v_positive; v=NULL fails BOTH (null = violation)
    assert ei.value.counts == {"v_positive": 2, "v_small": 1}
    assert vs.versions(store) == [1]
    assert set(_glob.glob(f"{store}/data/*.parquet")) == files_before

    v2 = vs.commit_upsert(
        spark, store, chg, ["part", "k"],
        expectations=exp, on_violation="drop",
    )
    got = sorted(
        (r.part, r.k, r.v)
        for r in vs.read_version(spark, store, v2).collect()
    )
    assert got == [("a", 1, 10), ("a", 3, 5), ("b", 2, 20)]
    man = vs._read_manifest(store, v2)
    assert man["expectations"] == {
        "v_positive": {"violations": 2, "action": "drop"},
        "v_small": {"violations": 1, "action": "drop"},
    }
    # surfaced in the lineage CLI
    from engine.__main__ import main as cli

    assert cli(["vstore", "history", store]) == 0
    out = capsys.readouterr().out
    assert "expect:v_positive=2 dropped" in out

    # a fully-clean commit records NO expectations key (nothing to say)
    clean = spark.createDataFrame([("a", 6, 7)], "part string, k long, v long")
    v3 = vs.commit_upsert(
        spark, store, clean, ["part", "k"],
        expectations=exp, on_violation="drop",
    )
    assert "expectations" not in vs._read_manifest(store, v3)

    # overwrite enforces the same contract
    with _pytest.raises(vs.ExpectationViolation):
        vs.commit_overwrite(chg, store, "part", expectations=exp)
    v4 = vs.commit_overwrite(
        chg, store, "part", expectations=exp, on_violation="drop"
    )
    assert [
        (r.part, r.k, r.v)
        for r in vs.read_version(spark, store, v4).collect()
    ] == [("a", 3, 5)]


def test_crash_recovery_at_every_commit_stage(spark, tmp_path, monkeypatch):
    """Crash-inject the commit protocol at each boundary and verify
    the invariants the ordering guarantees claim:

    * crash BEFORE the claim (after staging): readers unaffected, the
      orphaned data files are unreferenced and vacuum removes them;
    * crash AFTER the claim but before the CURRENT hint advances: the
      claim IS the commit point, so the crashed commit is already
      visible (complete manifest, staged immutable files) — readers
      resolve it, later strict writers build on top of it unwedged,
      and vacuum's retention counts it. A bloomed store degrades
      conservatively: the crashed version has no sidecar, so point
      reads keep all files (correct, just unpruned) and the NEXT
      commit re-inherits the bloom config by walking back to the
      newest existing sidecar rather than severing the chain."""
    import glob as _glob

    import pytest as _pytest

    import engine.versioned_store as vs

    store = str(tmp_path / "crash")
    base = spark.createDataFrame(
        [("a", 1, "a1"), ("b", 2, "b2")], "part string, k long, v string"
    )
    vs.commit_overwrite(base, store, "part", bloom_cols=["v"], bloom_bits=256)
    chg_a = spark.createDataFrame([("a", 1, "A!")], "part string, k long, v string")
    chg_b = spark.createDataFrame([("b", 2, "B!")], "part string, k long, v string")

    # -- crash before the claim: staged orphans, store untouched
    def claim_boom(store_, manifest):
        raise RuntimeError("crash before claim")

    real_claim = vs._claim_manifest
    monkeypatch.setattr(vs, "_claim_manifest", claim_boom)
    with _pytest.raises(RuntimeError, match="before claim"):
        vs.commit_upsert(spark, store, chg_a, ["part", "k"])
    monkeypatch.setattr(vs, "_claim_manifest", real_claim)
    assert vs.versions(store) == [1] and vs.current_version(store) == 1
    live = {e["file"] for e in vs._read_manifest(store, 1)["files"]}
    on_disk = {
        p.rsplit("/", 1)[-1] for p in _glob.glob(f"{store}/data/*.parquet")
    }
    assert on_disk > live  # the crash left orphans...
    vs.vacuum(store, keep_latest=1)
    on_disk = {
        p.rsplit("/", 1)[-1] for p in _glob.glob(f"{store}/data/*.parquet")
    }
    assert on_disk == live  # ...and vacuum removed exactly them

    # -- crash after the claim, before the sidecar and CURRENT land
    real_blooms = vs._maybe_write_blooms

    def bloom_boom(*a, **kw):
        raise RuntimeError("crash after claim")

    monkeypatch.setattr(vs, "_maybe_write_blooms", bloom_boom)
    with _pytest.raises(RuntimeError, match="after claim"):
        vs.commit_upsert(spark, store, chg_a, ["part", "k"])
    monkeypatch.setattr(vs, "_maybe_write_blooms", real_blooms)
    assert vs.versions(store) == [1, 2]
    # the claim is the commit point: the crashed commit is visible
    # (its manifest and files are complete) despite the stale hint
    assert open(f"{store}/_manifests/CURRENT").read().strip() == "1"
    assert vs.current_version(store) == 2
    assert sorted(
        (r.k, r.v) for r in vs.read_version(spark, store).collect()
    ) == [(1, "A!"), (2, "b2")]
    # vacuum IN the crashed state keeps the version readers resolve
    # (keep the base too: its bloom sidecar carries the store's config)
    vs.vacuum(store, keep_latest=2)
    assert vs.current_version(store) == 2
    assert vs.read_version(spark, store).count() == 2
    # a later STRICT writer is not wedged: it builds on the claimed
    # head (reading the crashed commit's data as its base)
    v = vs.commit_upsert(spark, store, chg_b, ["part", "k"])
    assert v == 3 and vs.current_version(store) == 3
    got = sorted(
        (r.k, r.v) for r in vs.read_version(spark, store, 3).collect()
    )
    assert got == [(1, "A!"), (2, "B!")]  # BOTH commits' effects live
    # bloom chain: the crashed v2 has no sidecar, but v3 re-inherits
    # the config by walking back to v1's sidecar instead of severing
    assert vs._read_bloom_sidecar(store, 2) is None
    sc3 = vs._read_bloom_sidecar(store, 3)
    assert sc3 is not None and sc3["cols"] == ["v"]
    assert [
        (r.k, r.v)
        for r in vs.read_version(
            spark, store, 3, point_filters={"v": "B!"}
        ).collect()
    ] == [(2, "B!")]


def test_commit_merge_three_clauses_in_one_version(spark, tmp_path):
    """Full MERGE as one commit: matched+delete-condition rows vanish,
    matched others update, unmatched source rows insert, unmatched
    base rows survive, untouched partitions carry forward — and the
    manifest records the clause counts. The same mutation needed two
    versions (upsert then delete) before."""
    import engine.versioned_store as vs

    store = str(tmp_path / "merge")
    base = spark.createDataFrame(
        [("a", 1, "a1"), ("a", 2, "a2"), ("a", 3, "a3"), ("b", 9, "b9")],
        "part string, k long, v string",
    )
    vs.commit_overwrite(base, store, "part")
    src = spark.createDataFrame(
        [
            ("a", 1, "A1!"),   # matched, update
            ("a", 2, "DEAD"),  # matched, delete condition hits
            ("a", 5, "A5+"),   # unmatched, insert
        ],
        "part string, k long, v string",
    )
    v2 = vs.commit_merge(
        spark,
        store,
        src,
        ["part", "k"],
        matched_delete_condition="v = 'DEAD'",
    )
    assert v2 == 2
    got = sorted(
        (r.part, r.k, r.v)
        for r in vs.read_version(spark, store, v2).collect()
    )
    assert got == [
        ("a", 1, "A1!"),
        ("a", 3, "a3"),
        ("a", 5, "A5+"),
        ("b", 9, "b9"),
    ]
    man = vs._read_manifest(store, v2)
    assert man["merge"] == {"updated": 1, "deleted": 1, "inserted": 1}
    # untouched partition 'b' carried forward manifest-only
    b1 = {
        e["file"]
        for e in vs._read_manifest(store, 1)["files"]
        if e["partition"] == "b"
    }
    b2 = {e["file"] for e in man["files"] if e["partition"] == "b"}
    assert b1 == b2 and b1
    # the feed sees exactly the three clauses
    feed = vs.table_changes(spark, store, 1, v2, ["part", "k"])
    assert sorted(
        (r.k, r.v, r._change_type) for r in feed.collect()
    ) == [
        (1, "A1!", "update_postimage"),
        (1, "a1", "update_preimage"),
        (2, "a2", "delete"),
        (5, "A5+", "insert"),
    ]


def test_commit_merge_clause_toggles_and_guards(spark, tmp_path):
    """Clause toggles: update-off keeps matched base rows; insert-off
    skips unmatched source rows; delete-condition rows are never
    inserted. Merge shares upsert's contracts: partition column in
    key_cols, expectations before staging."""
    import pytest as _pytest

    import engine.versioned_store as vs

    store = str(tmp_path / "merge2")
    base = spark.createDataFrame(
        [("a", 1, "a1"), ("a", 2, "a2")], "part string, k long, v string"
    )
    vs.commit_overwrite(base, store, "part")
    src = spark.createDataFrame(
        [("a", 1, "IGNORED"), ("a", 7, "SKIPPED")],
        "part string, k long, v string",
    )
    v2 = vs.commit_merge(
        spark,
        store,
        src,
        ["part", "k"],
        when_matched_update=False,
        when_not_matched_insert=False,
    )
    got = sorted(
        (r.k, r.v) for r in vs.read_version(spark, store, v2).collect()
    )
    assert got == [(1, "a1"), (2, "a2")]  # a no-op rewrite of 'a'
    assert vs._read_manifest(store, v2)["merge"] == {
        "updated": 0,
        "deleted": 0,
        "inserted": 0,
    }

    with _pytest.raises(ValueError, match="must include the partition"):
        vs.commit_merge(spark, store, src, ["k"])
    with _pytest.raises(vs.ExpectationViolation):
        vs.commit_merge(
            spark, store, src, ["part", "k"],
            expectations={"no_skip": "v <> 'SKIPPED'"},
        )


def _fragmented_store(spark, store):
    """v1 with partition 'a' spread over 4 files (range-partitioned
    write: one file per task per partition value) and 'b' in one."""
    import engine.versioned_store as vs

    base = spark.createDataFrame(
        [("a", k, f"a{k}") for k in (1, 2, 3, 4)] + [("b", 9, "b9")],
        "part string, k long, v string",
    )
    vs.commit_overwrite(
        base.repartitionByRange(4, "k"), store, "part"
    )
    man = vs._read_manifest(store, 1)
    n_a = sum(1 for e in man["files"] if e["partition"] == "a")
    assert n_a >= 2  # genuinely fragmented
    return n_a


def test_partial_compaction_rewrites_only_fragmented_partitions(
    spark, tmp_path, capsys
):
    """compact_partitions rewrites ONLY partitions above the file
    target: 'a' collapses to one file, 'b' carries forward verbatim
    (manifest-only), content is invariant, the change feed across the
    compaction is EMPTY (pure file movement), and a second pass is a
    no-op returning None instead of an empty commit."""
    import engine.versioned_store as vs

    store = str(tmp_path / "pcompact")
    _fragmented_store(spark, store)
    v2 = vs.compact_partitions(spark, store, files_per_partition=1)
    assert v2 == 2
    man = vs._read_manifest(store, v2)
    assert man["compacted_partitions"] == 1
    assert sum(1 for e in man["files"] if e["partition"] == "a") == 1
    b1 = {
        e["file"]
        for e in vs._read_manifest(store, 1)["files"]
        if e["partition"] == "b"
    }
    assert {e["file"] for e in man["files"] if e["partition"] == "b"} == b1
    got = sorted(
        (r.part, r.k, r.v)
        for r in vs.read_version(spark, store, v2).collect()
    )
    assert got == [("a", k, f"a{k}") for k in (1, 2, 3, 4)] + [
        ("b", 9, "b9")
    ]
    # pure file movement: the feed between the versions is empty
    assert (
        vs.table_changes(spark, store, 1, v2, ["part", "k"]).count() == 0
    )
    # nothing fragmented anymore: no-op, no empty commit
    assert vs.compact_partitions(spark, store, files_per_partition=1) is None
    assert vs.current_version(store) == 2
    # the CLI drives the same path
    from engine.__main__ import main as cli

    assert cli(["vstore", "compact", store, "--partial"]) == 0
    assert "no-op" in capsys.readouterr().out


def test_partial_compaction_races_ingest_and_both_land(
    spark, monkeypatch, tmp_path
):
    """The maintenance story full compaction cannot deliver: a
    background partial OPTIMIZE of fragmented partition 'a' races an
    ingest into healthy partition 'b' — disjoint sets, so with
    max_retries BOTH land; the final snapshot carries the ingest AND
    reads 'a' from the compacted single file."""
    import engine.versioned_store as vs

    store = str(tmp_path / "pcompact_race")
    _fragmented_store(spark, store)
    chg_b = spark.createDataFrame(
        [("b", 10, "NEW")], "part string, k long, v string"
    )
    _interleave_claim(
        monkeypatch,
        lambda: vs.commit_upsert(spark, store, chg_b, ["part", "k"]),
    )
    v3 = vs.compact_partitions(
        spark, store, files_per_partition=1, max_retries=1
    )
    assert v3 == 3
    man = vs._read_manifest(store, 3)
    assert man["rebased_from_base"] == 1
    assert sum(1 for e in man["files"] if e["partition"] == "a") == 1
    got = sorted(
        (r.part, r.k, r.v)
        for r in vs.read_version(spark, store, 3).collect()
    )
    assert got == [("a", k, f"a{k}") for k in (1, 2, 3, 4)] + [
        ("b", 9, "b9"),
        ("b", 10, "NEW"),
    ]


def test_commit_merge_unmatched_tombstone_is_a_noop(spark, tmp_path):
    """A delete-condition row whose key is NOT in the base (already
    deleted, or never existed — the replayed-feed case) must be a
    no-op, not an insert: inserting it would resurrect deleted data.
    Duplicate base keys must not multiply merge output rows either."""
    import engine.versioned_store as vs

    store = str(tmp_path / "merge_tomb")
    # base with a DUPLICATE key (k=1 twice) — nothing enforces
    # uniqueness on overwrite input
    base = spark.createDataFrame(
        [("a", 1, "dup1"), ("a", 1, "dup2"), ("a", 2, "a2")],
        "part string, k long, v string",
    )
    vs.commit_overwrite(base, store, "part")
    src = spark.createDataFrame(
        [
            ("a", 1, "A1!"),    # matched (against a duplicated key)
            ("a", 7, "DEAD"),   # UNMATCHED tombstone: must vanish
            ("a", 8, "A8+"),    # unmatched insert
        ],
        "part string, k long, v string",
    )
    v2 = vs.commit_merge(
        spark, store, src, ["part", "k"],
        matched_delete_condition="v = 'DEAD'",
    )
    got = sorted(
        (r.k, r.v) for r in vs.read_version(spark, store, v2).collect()
    )
    # k=1 updated ONCE (not multiplied by the base duplicate), the
    # unmatched tombstone absent, the insert present
    assert got == [(1, "A1!"), (2, "a2"), (8, "A8+")]
    assert vs._read_manifest(store, v2)["merge"] == {
        "updated": 1,
        "deleted": 0,
        "inserted": 1,
    }


def test_commit_merge_rejects_duplicate_source_keys(spark, tmp_path):
    """REGRESSION (ADVICE r8): two source rows with the same key both
    classified 'updated' (or an update racing a tombstone on one key)
    and every winner landed in the rewrite — silently committing
    duplicate-key rows. Delta raises for multiple source rows matching
    one target row; so do we, BEFORE anything is staged, for matched
    and unmatched duplicates alike."""
    import pytest as _pytest

    import engine.versioned_store as vs

    store = str(tmp_path / "mergedup")
    vs.commit_overwrite(
        spark.createDataFrame(
            [("a", 1, "a1"), ("a", 2, "a2")], "part string, k long, v string"
        ),
        store,
        "part",
    )
    cases = [
        # same matched key twice: contradictory updates
        [("a", 1, "X"), ("a", 1, "Y")],
        # same key updated AND tombstoned
        [("a", 2, "X"), ("a", 2, "DEAD")],
        # duplicate UNMATCHED key: would insert the row twice
        [("a", 5, "N1"), ("a", 5, "N2")],
    ]
    for rows in cases:
        with _pytest.raises(ValueError, match="duplicate"):
            vs.commit_merge(
                spark,
                store,
                spark.createDataFrame(rows, "part string, k long, v string"),
                ["part", "k"],
                matched_delete_condition="v = 'DEAD'",
            )
    # nothing committed, nothing staged: v1 intact, no orphan files
    assert vs.current_version(store) == 1
    man = vs._read_manifest(store, 1)
    import os

    assert sorted(os.listdir(os.path.join(store, "data"))) == sorted(
        e["file"] for e in man["files"]
    )


def test_vacuum_grace_period_spares_young_staged_files(spark, tmp_path):
    """REGRESSION (ADVICE r8): vacuum deletes any data/ file no
    retained manifest references — including files an in-flight writer
    has STAGED but not yet claimed (the optimistic-rebase retry loop
    lengthens that window). With grace_seconds, young unreferenced
    files survive; old ones still go."""
    import os
    import time

    import engine.versioned_store as vs

    store = str(tmp_path / "grace")
    vs.commit_overwrite(
        spark.createDataFrame([("a", 1)], "part string, k long"),
        store,
        "part",
    )
    data = os.path.join(store, "data")
    # a just-staged (unreferenced) file, as an in-flight commit leaves it
    staged = os.path.join(data, "v00002-deadbeef-0000.parquet")
    with open(staged, "wb") as f:
        f.write(b"stub")
    # an OLD unreferenced file (a long-aborted write)
    aborted = os.path.join(data, "v00000-00000000-0000.parquet")
    with open(aborted, "wb") as f:
        f.write(b"stub")
    old = time.time() - 7200
    os.utime(aborted, (old, old))

    removed = vs.vacuum(store, keep_latest=1, grace_seconds=3600)
    assert removed == ["v00000-00000000-0000.parquet"]
    assert os.path.exists(staged)  # the in-flight writer's file survives
    # offline form (default grace 0) still collects everything
    assert vs.vacuum(store, keep_latest=1) == [
        "v00002-deadbeef-0000.parquet"
    ]


def test_timestamp_time_travel(spark, tmp_path):
    """Each claim records committed_at; version_at_timestamp resolves
    the latest version visible at a wall-clock instant, read_version /
    the vstore source accept it, and out-of-range or pre-recording
    timestamps raise instead of lying about history."""
    import pytest as _pytest

    import engine.versioned_store as vs
    from engine.sources.vstore_datasource import register_vstore

    register_vstore(spark)
    store = str(tmp_path / "ts")
    vs.commit_overwrite(
        spark.createDataFrame([("a", 1, "v1")], "part string, k long, v string"),
        store,
        "part",
    )
    vs.commit_upsert(
        spark,
        store,
        spark.createDataFrame([("a", 1, "v2")], "part string, k long, v string"),
        ["part", "k"],
    )
    t1 = vs._read_manifest(store, 1)["committed_at"]
    t2 = vs._read_manifest(store, 2)["committed_at"]
    assert t1 <= t2

    assert vs.version_at_timestamp(store, t1) == 1
    assert vs.version_at_timestamp(store, (t1 + t2) / 2) in (1, 2)
    assert vs.version_at_timestamp(store, t2 + 10) == 2
    with _pytest.raises(ValueError, match="no retained version"):
        vs.version_at_timestamp(store, t1 - 10)

    got = vs.read_version(spark, store, as_of_timestamp=t1)
    assert [(r.part, r.k, r.v) for r in got.collect()] == [("a", 1, "v1")]
    with _pytest.raises(ValueError, match="not both"):
        vs.read_version(spark, store, 1, as_of_timestamp=t1)

    # through the data source option
    src = (
        spark.read.format("vstore")
        .option("timestamp_as_of", str(t1))
        .load(store)
    )
    assert [(r.part, r.k, r.v) for r in src.collect()] == [("a", 1, "v1")]

    # a manifest missing committed_at (pre-round-9 store) only blocks
    # resolutions that REACH it: newer timestamped versions still
    # resolve (round-9 review — the first cut raised on any
    # untimestamped manifest, disabling the feature store-wide)
    man = vs._read_manifest(store, 1)
    del man["committed_at"]
    import json as _json

    with open(vs._manifest_path(store, 1), "w", encoding="utf-8") as f:
        f.write(_json.dumps(man))
    assert vs.version_at_timestamp(store, t2) == 2
    with _pytest.raises(ValueError, match="no recorded commit time"):
        vs.version_at_timestamp(store, t1)  # t1 < v2's stamp: reaches v1


def test_ddl_pairs_handles_parenthesized_types(spark, tmp_path):
    """REGRESSION (round-9 review, confirmed crash): decimal(10,2)
    carries a top-level-looking comma inside PARENTHESES; the
    context-free DDL parser must depth-track those too, or every
    schema-evolving commit on a decimal-bearing store dies in
    _merge_ddl."""
    import engine.versioned_store as vs

    assert vs._ddl_pairs("price decimal(10,2), x int") == [
        ("price", "decimal(10,2)"),
        ("x", "int"),
    ]
    assert vs._ddl_pairs(
        "m map<string,decimal(20,4)>, s struct<a:int,b:string>"
    ) == [
        ("m", "map<string,decimal(20,4)>"),
        ("s", "struct<a:int,b:string>"),
    ]
    # end to end: a decimal store evolves additively through upsert
    store = str(tmp_path / "dec")
    from decimal import Decimal

    vs.commit_overwrite(
        spark.createDataFrame(
            [("a", 1, Decimal("1.50"))],
            "part string, k long, price decimal(10,2)",
        ),
        store,
        "part",
    )
    vs.commit_upsert(
        spark,
        store,
        spark.createDataFrame(
            [("a", 2, Decimal("2.25"), "x")],
            "part string, k long, price decimal(10,2), note string",
        ),
        ["part", "k"],
    )
    got = sorted(
        (r.part, r.k, str(r.price), r.note)
        for r in vs.read_version(spark, store).collect()
    )
    assert got == [("a", 1, "1.50", None), ("a", 2, "2.25", "x")]


def test_clone_store_is_zero_copy_and_independent(spark, tmp_path):
    """clone_store: a new store whose v1 hard-links the source
    version's files — zero bytes copied, yet fully independent
    (vacuuming or deleting either store never breaks the other:
    hard links keep the shared inodes alive until BOTH drop them)."""
    import os

    import pytest as _pytest

    import engine.versioned_store as vs

    src = str(tmp_path / "src")
    vs.commit_overwrite(
        spark.createDataFrame(
            [("a", 1, "x"), ("b", 2, "y")], "part string, k long, v string"
        ),
        src,
        "part",
    )
    vs.commit_upsert(
        spark,
        src,
        spark.createDataFrame([("a", 1, "x2")], "part string, k long, v string"),
        ["part", "k"],
    )

    dst = str(tmp_path / "dst")
    assert vs.clone_store(spark, src, dst, version=1) == 1
    got = sorted(
        (r.part, r.k, r.v) for r in vs.read_version(spark, dst).collect()
    )
    assert got == [("a", 1, "x"), ("b", 2, "y")]
    # zero-copy: every cloned data file shares its inode with the source
    for e in vs._read_manifest(dst, 1)["files"]:
        d = os.stat(os.path.join(dst, "data", e["file"]))
        s = os.stat(os.path.join(src, "data", e["file"]))
        assert d.st_ino == s.st_ino and d.st_nlink >= 2

    # independence both ways: evolve the clone, purge the source
    vs.commit_upsert(
        spark,
        dst,
        spark.createDataFrame([("c", 9, "new")], "part string, k long, v string"),
        ["part", "k"],
    )
    shutil_rm = __import__("shutil").rmtree
    shutil_rm(src)
    got = sorted(
        (r.part, r.k, r.v) for r in vs.read_version(spark, dst).collect()
    )
    assert got == [("a", 1, "x"), ("b", 2, "y"), ("c", 9, "new")]

    # a clone refuses to overwrite an existing store
    with _pytest.raises(ValueError, match="exists"):
        vs.clone_store(spark, dst, dst)

    # default clones the CURRENT version; blooms ride along when present
    src2 = str(tmp_path / "src2")
    vs.commit_overwrite(
        spark.createDataFrame([("a", 5)], "part string, k long"),
        src2,
        "part",
        bloom_cols=["k"],
        bloom_bits=256,
    )
    dst2 = str(tmp_path / "dst2")
    vs.clone_store(spark, src2, dst2)
    assert vs._read_bloom_sidecar(dst2, 1) is not None
    assert vs.read_version(
        spark, dst2, point_filters={"k": 5}
    ).count() == 1


def test_vstore_cli_clone_and_history_kinds(spark, tmp_path, capsys):
    """CLI: `vstore clone SRC --dest DST` and history's cloned_from /
    commit-time annotations."""
    import engine.versioned_store as vs
    from engine.__main__ import main as cli

    src = str(tmp_path / "csrc")
    vs.commit_overwrite(
        spark.createDataFrame([("a", 1)], "part string, k long"),
        src,
        "part",
    )
    dst = str(tmp_path / "cdst")
    assert cli(["vstore", "clone", src, "--dest", dst]) == 0
    out = capsys.readouterr().out
    assert "cloned" in out and "v00001" in out
    assert vs.read_version(spark, dst).count() == 1

    assert cli(["vstore", "history", dst]) == 0
    out = capsys.readouterr().out
    assert "cloned_from=" in out and "at 2" in out  # ISO commit time

    assert cli(["vstore", "clone", src]) == 2  # --dest required
