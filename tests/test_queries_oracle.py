"""Layer B correctness gate: every registered query's Spark result must
match its DuckDB oracle at sf0.001 (fast tier; the driver runs the same
comparison at sf0.01 — use tools/check_oracle.py for that locally)."""

import os

import duckdb
import pytest

from engine.io import TABLES, table_path
from engine.registry import all_queries_including_library
from tests.conftest import SF_SMOKE
from tools.check_oracle import compare

SPECS = all_queries_including_library()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(SF_SMOKE, t)
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, duck, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_SMOKE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert spark_rows is not None  # rows-only check (non-SQL-expressible op)
        return
    rel = duck.sql(spec.oracle)
    errs = compare(name, spark_rows, spark_cols, rel.fetchall(), list(rel.columns))
    assert not errs, f"{name}: {errs}"
