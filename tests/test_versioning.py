"""Snapshot-versioning tests: both versions must be real published
artifacts, the diff must be recomputable by an independent engine from
the written files, every diff class must actually occur, and the diff
scan must never read document bodies."""

import glob
import os

import duckdb
from pyspark.sql import functions as F

from engine.operators.versioning import (
    _DIFF_H_DUCK,
    corpus_snapshot_diff,
    snapshot_diff,
)
from engine.plans.inspect import formatted_plan
from tests.conftest import SF_SMOKE


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
        r.source: (
            r.n_added, r.n_removed, r.n_changed, r.n_unchanged,
            r.tok_delta, r.diff_h,
        )
        for r in corpus_snapshot_diff(spark, SF_SMOKE).collect()
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
