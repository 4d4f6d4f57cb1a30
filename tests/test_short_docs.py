"""Short-document robustness: the n-gram operators must handle 0/1/2-
token documents — and agree with their DuckDB oracles on them.

The shipped fixture corpus contains no such documents, which let a
real crash class hide: ``sequence(1, greatest(size(t)-k, 0))`` REVERSES
to ``[1, 0]`` when size(t) <= k (Spark sequence flips direction when
start > stop), so the n-gram lambda hit ``element_at(t, 0)`` — an
unconditional runtime error — on any 1-2-token doc (fixed via
textstats.ngram_idx). This test runs the affected registered queries
on a tiny corpus of edge-case documents AND value-compares them
against their oracles, so the class cannot return with a fixture
refresh.
"""

import datetime as dt
import math

import duckdb
import pytest

from engine.registry import all_queries_including_library

SHORT_DOCS = [
    (1, "", "en", "web"),
    (2, "one", "en", "web"),
    (3, "two words", "en", "books"),
    (4, "three word doc", "en", "web"),
    (5, "the of and to a in is it extra words here now", "en", "books"),
    (6, "der die das und ist nicht mit ein mehr worte", "de", "web"),
]

QUERIES = [
    "dedup_ngram_jaccard",
    "doc_fingerprints",
    "pipeline_vocab_bigrams",
    "text_repetition",
    "text_quality_profile",
    "term_rankings",
]


@pytest.fixture(scope="module")
def short_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("shortdocs")
    rows = [(i, t, lang, src, len(t)) for i, t, lang, src in SHORT_DOCS]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars int"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    return v


def _rows(seq, cols):
    out = [tuple(_norm(v) for v in row) for row in seq]
    return sorted(out, key=lambda r: tuple((v is None, str(v)) for v in r)), sorted(
        cols
    )


@pytest.mark.parametrize("name", QUERIES)
def test_short_doc_corpus_matches_oracle(spark, short_dir, name):
    spec = all_queries_including_library()[name]
    sdf = spec.fn(spark, short_dir)
    cols = sdf.columns
    got = [[row[c] for c in sorted(cols)] for row in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{short_dir}/documents.parquet/*.parquet')"
    )
    res = con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    idx = {c: i for i, c in enumerate(ocols)}
    want = [[row[idx[c]] for c in sorted(ocols)] for row in res.fetchall()]

    grows, gcols = _rows(got, cols)
    wrows, wcols = _rows(want, ocols)
    assert gcols == wcols, f"{name}: column mismatch {gcols} vs {wcols}"
    assert grows == wrows, (
        f"{name}: {len(grows)} spark rows vs {len(wrows)} oracle rows;"
        f" first diff: {next((p for p in zip(grows, wrows) if p[0] != p[1]), None)}"
    )
