"""Capstone tests: the corpus build must publish a real on-disk
artifact whose re-read contents — verified by an INDEPENDENT engine
reading the files — match the summary the query returns, survive
republish, and honor every stage's drop rule."""

import glob
import os

import duckdb
from pyspark.sql import functions as F

from engine.operators.corpus_build import (
    _DOC_H_DUCK,
    build_corpus,
    corpus_build_e2e,
)
from tests.conftest import SF_SMOKE


def _summary_from_files_duckdb(out: str):
    """Per-split summary recomputed by DuckDB straight from the written
    parquet files (hive partitioning gives the split column) — the
    're-read the files, not the DataFrame' check."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT split, CAST(count(*) AS BIGINT),
               CAST(sum(n_tokens) AS BIGINT),
               CAST(count(DISTINCT bucket || ':' || seq_id) AS BIGINT),
               CAST(count(DISTINCT len_bucket) AS BIGINT),
               CAST(bit_xor({_DOC_H_DUCK}) AS BIGINT)
        FROM read_parquet('{out}/split=*/zf=*/*.parquet', hive_partitioning=1)
        GROUP BY split
        """
    ).fetchall()
    return {r[0]: tuple(r[1:]) for r in rows}


def test_corpus_build_publishes_and_hash_pins_files(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CORPUS_OUT", str(tmp_path / "corpus"))
    summary = {
        r.split: (r.n_docs, r.n_tokens, r.n_seqs, r.n_len_buckets, r.corpus_h)
        for r in corpus_build_e2e(spark, SF_SMOKE).collect()
        if r.facet == "summary"
    }
    assert summary and "train" in summary
    out = str(tmp_path / "corpus" / os.path.basename(SF_SMOKE.rstrip("/")))
    # the artifact exists, partitioned by split
    split_dirs = sorted(
        os.path.basename(p) for p in glob.glob(f"{out}/split=*")
    )
    assert split_dirs == sorted(f"split={s}" for s in summary)
    # a DIFFERENT engine re-reads the files and reproduces the summary
    assert _summary_from_files_duckdb(out) == summary

    # republish is idempotent and atomic (old corpus replaced, summary
    # identical)
    again = {
        r.split: (r.n_docs, r.n_tokens, r.n_seqs, r.n_len_buckets, r.corpus_h)
        for r in corpus_build_e2e(spark, SF_SMOKE).collect()
        if r.facet == "summary"
    }
    assert again == summary


def test_corpus_build_stage_drop_rules_hold(spark, tmp_path):
    """Every written row honors the chain: survivor of exact+near
    dedup, not in the eval slice, not contaminated, token count matches
    the written text, and pack offsets sit on the PACK_CTX grid."""
    from engine.operators.dedup import (
        dedup_canonical_components,
        dedup_exact,
    )
    from engine.operators.pipeline import (
        _DECON_EVAL_SPARK,
        PACK_CTX,
        pipeline_decontaminate,
    )

    out = build_corpus(spark, SF_SMOKE, out=str(tmp_path / "c2"))
    corpus = spark.read.parquet(out)
    n = corpus.count()
    assert n > 0

    # dedup survivorship: doc is its exact group's keeper and its
    # component's canonical
    keepers = {
        r.keep_doc_id for r in dedup_exact(spark, SF_SMOKE).collect()
    }
    comp = {
        r.doc_id: r.canonical_id
        for r in dedup_canonical_components(spark, SF_SMOKE).collect()
    }
    doc_ids = [r.doc_id for r in corpus.select("doc_id").collect()]
    assert len(set(doc_ids)) == n  # no duplicates in the artifact
    for d in doc_ids:
        assert d in keepers
        assert comp.get(d, d) == d

    # decontamination: no eval docs, no contaminated docs
    assert corpus.filter(F.expr(_DECON_EVAL_SPARK)).count() == 0
    contaminated = {
        r.doc_id for r in pipeline_decontaminate(spark, SF_SMOKE).collect()
    }
    assert not contaminated.intersection(doc_ids)

    # pack accounting: n_tokens matches the written text; every
    # (seq_id, seq_offset) obeys the running-total grid
    bad = corpus.filter(
        F.size(F.split("stext", " ")).cast("bigint") != F.col("n_tokens")
    ).count()
    assert bad == 0
    # length-bucket ladder: the written len_bucket is the smallest
    # power-of-two rung >= n_tokens (overflow rung excepted)
    from engine.operators.pipeline import LEN_BUCKETS, LEN_OVERFLOW

    for r in corpus.select("n_tokens", "len_bucket").collect():
        want = next(
            (b for b in LEN_BUCKETS if r.n_tokens <= b), LEN_OVERFLOW
        )
        assert r.len_bucket == want, (r.n_tokens, r.len_bucket)
    for r in corpus.select("split", "bucket", "doc_id", "n_tokens",
                           "seq_id", "seq_offset").collect():
        assert 0 <= r.seq_offset < PACK_CTX
    # per-(split,bucket) recheck of the cumulative positions
    import collections

    streams = collections.defaultdict(list)
    for r in corpus.collect():
        streams[(r.split, r.bucket)].append(r)
    for rows in streams.values():
        cum = 0
        for r in sorted(rows, key=lambda r: r.doc_id):
            assert (r.seq_id, r.seq_offset) == (cum // PACK_CTX, cum % PACK_CTX)
            cum += r.n_tokens


def test_corpus_refresh_stored_table_and_idempotence(spark, tmp_path, monkeypatch):
    """The refresh loop on disk: the refreshed STORED table must equal
    base ∪ non-duplicate arrivals exactly (row sets, not just counts),
    duplicates must never land, and re-running the whole refresh
    republishes the identical table."""
    from engine.operators.corpus_build import (
        corpus_out_dir,
        corpus_refresh_incremental,
    )
    from engine.operators.dedup import INC_MOD, dedup_incremental
    from engine.functions.hashing import SPARK_H60

    monkeypatch.setenv("SPARK_GRAFT_CORPUS_OUT", str(tmp_path / "c"))
    summary = {
        r.source: (r.n_base, r.n_arrived, r.n_dropped, r.n_appended,
                   r.total_after, r.corpus_h)
        for r in corpus_refresh_incremental(spark, SF_SMOKE).collect()
    }
    assert summary
    for s, (n_base, n_arrived, n_dropped, n_appended, total, _h) in summary.items():
        assert n_appended == n_arrived - n_dropped
        assert total == n_base + n_appended
    assert sum(v[2] for v in summary.values()) > 0  # gate actually dropped

    from engine.io import load_table
    from engine.versioned_store import current_version, read_version

    store = corpus_out_dir(SF_SMOKE) + "_refresh"
    # round 8: the refresh commits THROUGH the versioned store — the
    # refreshed table is version 2 (base = v1, upsert = v2)
    assert current_version(store) == 2
    stored_ids = {
        r.doc_id
        for r in read_version(spark, store, 2).select("doc_id").collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents")
    is_new = (
        F.expr(SPARK_H60.format(x="concat('inc:', cast(doc_id as string))"))
        % INC_MOD
        == 0
    )
    base_ids = {r.doc_id for r in docs.filter(~is_new).select("doc_id").collect()}
    new_ids = {r.doc_id for r in docs.filter(is_new).select("doc_id").collect()}
    dup_ids = {
        r.doc_id for r in dedup_incremental(spark, SF_SMOKE).select("doc_id").collect()
    }
    assert stored_ids == base_ids | (new_ids - dup_ids)
    assert not (dup_ids & stored_ids & new_ids)  # no flagged arrival landed

    # idempotent: the whole refresh re-runs to the same summary
    again = {
        r.source: (r.n_base, r.n_arrived, r.n_dropped, r.n_appended,
                   r.total_after, r.corpus_h)
        for r in corpus_refresh_incremental(spark, SF_SMOKE).collect()
    }
    assert again == summary


def test_refresh_rollback_restores_prior_corpus_hash(spark, tmp_path, monkeypatch):
    """VERDICT r7 #3's recovery clause: the refresh is a versioned
    COMMIT, so a bad batch is undone with rollback — the rolled-back
    version's per-source (count, corpus hash) must equal v1's exactly,
    v1 must still be readable AFTER the bad refresh landed, and
    version_diff must name the bad batch as pure addition (what the
    rollback removed)."""
    from pyspark.sql import functions as F  # noqa: F811

    from engine.operators.corpus_build import (
        corpus_out_dir,
        corpus_refresh_incremental,
    )
    from engine.versioned_store import (
        read_version,
        rollback,
        version_diff,
    )

    monkeypatch.setenv("SPARK_GRAFT_CORPUS_OUT", str(tmp_path / "c"))
    corpus_refresh_incremental(spark, SF_SMOKE).collect()
    store = corpus_out_dir(SF_SMOKE) + "_refresh"

    def summary(v: int):
        return {
            r.source: (r.n, r.h)
            for r in read_version(spark, store, v)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.expr("bit_xor(h)").cast("bigint").alias("h"),
            )
            .collect()
        }

    before = summary(1)
    bad = summary(2)
    assert bad != before  # the refresh really changed the corpus

    # treat v2 as a bad batch: one JSON write promotes v1's file set
    v3 = rollback(store, to_version=1)
    assert v3 == 3
    assert summary(v3) == before  # prior corpus hash restored exactly
    assert summary(2) == bad  # the bad version stays inspectable
    # the diff between rolled-back and bad names the batch as pure
    # addition (everything the rollback removed, nothing else)
    d = {r.source: r for r in version_diff(spark, store, v3, 2).collect()}
    assert sum(r.n_added for r in d.values()) > 0
    assert all((r.n_removed, r.n_changed) == (0, 0) for r in d.values())


def test_published_corpus_zorder_footers_tight_and_skipping(spark, tmp_path):
    """VERDICT r7 #4's physical clauses: every published file is
    exactly one z-cell whose parquet footer rectangle on
    (doc_id, bucket) is EXACT (equals the row-level min/max an
    independent engine computes by reading the file), and a narrow
    doc_id-range probe skips most of each split's files — the
    clustering win on the real artifact, not a simulation."""
    import glob as g

    import duckdb as _duck

    from engine.operators.corpus_build import _zf_footer_stats

    out = build_corpus(spark, SF_SMOKE, out=str(tmp_path / "zc"))
    stats = _zf_footer_stats(out)
    assert stats
    con = _duck.connect()
    for split, zf, dlo, dhi, blo, bhi, n in stats:
        cell = f"{out}/split={split}/zf={zf}"
        # exactly one physical file per z-cell (the invariant the
        # oracle's per-cell rectangles rely on)
        assert len(g.glob(f"{cell}/*.parquet")) == 1
        # the footer rectangle is TIGHT: equal to the exact row-level
        # min/max, not merely containing it
        row = con.execute(
            f"""SELECT CAST(min(doc_id) AS BIGINT), CAST(max(doc_id) AS BIGINT),
                       CAST(min(bucket) AS BIGINT), CAST(max(bucket) AS BIGINT),
                       CAST(count(*) AS BIGINT)
                FROM read_parquet('{cell}/*.parquet')"""
        ).fetchone()
        assert (dlo, dhi, blo, bhi, n) == row, (split, zf)

    # the skipping win on the train split: a single narrow doc_id-range
    # probe (1/32 of the id span) must touch at most half the files
    ids = [s for s in stats if s[0] == "train"]
    assert len(ids) > 2
    lo = min(s[2] for s in ids)
    hi = max(s[3] for s in ids)
    plo, phi = lo, lo + (hi - lo + 1) // 32
    hit = sum(1 for s in ids if s[2] <= phi and s[3] >= plo)
    assert hit <= len(ids) // 2, (hit, len(ids))
