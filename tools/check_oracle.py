"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registered query's Spark plan AND its oracle SQL at a given
scale factor, then compares: row count, sorted column names, and values
(rows sorted by all columns).  Comparison is EXACT by default — the
driver hashes raw values, so a float that is merely within 1e-9 still
hash-mismatches there (that is precisely how hypertable_rollup slipped
through round 1).  Pass ``--tol`` to get the old tolerant comparison
when debugging magnitude-level breakage:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [--tol] [names...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from engine.io import TABLES, table_path  # noqa: E402
from engine.registry import all_queries_including_library  # noqa: E402
from engine.session import get_spark  # noqa: E402


# ---------------------------------------------------------------------------
# Fetch-type safety gate (round-5; see tests/test_oracle_types.py).
#
# The driver hashes FETCHED values; DuckDB types that pandas/Arrow widen,
# narrow or decimal-ize on fetch (HUGEINT from sum(CASE...), DECIMAL,
# FLOAT, small ints) hash-diverge from Spark's output even when every
# value is numerically equal — the exact pipeline_mix_funnel r2-r4
# failure.  Only these type tokens fetch identically to the matching
# Spark collect() representation:
SAFE_TYPE_TOKENS = {
    "BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP",
    "BOOLEAN", "BLOB", "STRUCT", "MAP", "NULL",
}

_TYPE_TOKEN_RE = re.compile(r"\b[A-Z][A-Z_0-9]+\b")

# Multi-word DuckDB type phrases collapsed to ONE verdict token before
# tokenizing, so the unsafe-token report names the actual type instead
# of a misleading WITH/TIME/ZONE shard list.  TIMESTAMP WITH TIME ZONE
# is deliberately fetch-UNSAFE: the driver hashes raw fetched values,
# and a tz-aware datetime hashes differently from Spark's naive
# session-local timestamp even when the instants match — oracles must
# CAST to plain TIMESTAMP.
_TYPE_PHRASES = {
    "TIMESTAMP WITH TIME ZONE": "TIMESTAMPTZ",
    "TIME WITH TIME ZONE": "TIMETZ",
}


def unsafe_type_tokens(type_str: str) -> list:
    """Fetch-unsafe ALL-CAPS type tokens in a DuckDB type string
    (flat scan recurses through STRUCT/MAP/[] nesting; struct field
    names are lowercase in this repo and never match).  Multi-word
    phrases (TIMESTAMP WITH TIME ZONE) report as one token."""
    for phrase, tok in _TYPE_PHRASES.items():
        type_str = type_str.replace(phrase, tok)
    return [t for t in _TYPE_TOKEN_RE.findall(type_str) if t not in SAFE_TYPE_TOKENS]


# Map a DuckDB result type / a Spark simpleString to the fetch "family"
# a value hash actually sees, so the two engines can be compared
# column-by-column before any values are.
_DUCK_FAMILY = {
    "BIGINT": "int", "INTEGER": "int", "DOUBLE": "float",
    "VARCHAR": "str", "DATE": "date", "TIMESTAMP": "timestamp",
    # TIMESTAMP WITH TIME ZONE intentionally absent: fetch-unsafe
    # (see _TYPE_PHRASES) — oracles must CAST to plain TIMESTAMP.
    "BOOLEAN": "bool", "BLOB": "bytes",
}
_SPARK_FAMILY = {
    "bigint": "int", "int": "int", "double": "float", "string": "str",
    "date": "date", "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "boolean": "bool", "binary": "bytes",
}


def _family(mapping, type_str):
    t = str(type_str)
    if t.endswith("[]"):  # duckdb list
        return ("list", _family(mapping, t[:-2]))
    if t.startswith("array<") and t.endswith(">"):  # spark list
        return ("list", _family(mapping, t[6:-1]))
    return mapping.get(t, t)


def dtype_mismatches(spark_schema, duck_cols, duck_types) -> list:
    """Column-name-matched fetch-family comparison between a Spark
    schema and a DuckDB result signature.  Returns [(col, spark, duck)]
    for every column whose fetched representation would differ."""
    duck_by_col = {c: str(t) for c, t in zip(duck_cols, duck_types)}
    out = []
    for f in spark_schema.fields:
        d = duck_by_col.get(f.name)
        if d is None:
            continue  # column-name mismatch is reported by compare()
        sfam = _family(_SPARK_FAMILY, f.dataType.simpleString())
        dfam = _family(_DUCK_FAMILY, d)
        if sfam != dfam and "NULL" not in d:
            out.append((f.name, f.dataType.simpleString(), d))
    return out


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sort_key(row):
    return tuple(
        (v is None, str(type(v).__name__), str(v)) for v in row
    )


def _cells_equal(a, b, tol: bool = False) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, str) or isinstance(b, str):  # NaN sentinel
            return a == b
        try:
            if tol:
                return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
            return float(a) == float(b)  # driver hashes exact values
        except (TypeError, ValueError):
            return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(
            _cells_equal(x, y, tol) for x, y in zip(a, b)
        )
    return a == b


def compare(
    name: str, spark_rows, spark_cols, duck_rows, duck_cols, tol: bool = False
) -> list[str]:
    errs = []
    if len(spark_rows) != len(duck_rows):
        errs.append(f"row count: spark={len(spark_rows)} duckdb={len(duck_rows)}")
    s_cols, d_cols = sorted(spark_cols), sorted(duck_cols)
    if s_cols != d_cols:
        errs.append(f"columns: spark={s_cols} duckdb={d_cols}")
        return errs
    # reorder both to sorted column order, normalize, sort rows
    s_idx = [spark_cols.index(c) for c in s_cols]
    d_idx = [duck_cols.index(c) for c in d_cols]
    s_data = sorted(
        (tuple(_norm(r[i]) for i in s_idx) for r in spark_rows), key=_sort_key
    )
    d_data = sorted(
        (tuple(_norm(r[i]) for i in d_idx) for r in duck_rows), key=_sort_key
    )
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s_data, d_data)):
        if not all(_cells_equal(a, b, tol) for a, b in zip(sr, dr)):
            n_bad += 1
            if n_bad <= 3:
                errs.append(f"row {i}: spark={sr} duckdb={dr}")
    if n_bad > 3:
        errs.append(f"... {n_bad} mismatched rows total")
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--tol",
        action="store_true",
        help="tolerant float comparison (1e-9) instead of driver-exact",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    specs = all_queries_including_library()
    names = args.names or list(specs)
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}; available: {list(specs)}")
        return 2

    con = duckdb.connect()
    for t in TABLES:
        p = table_path(args.sf, t)
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark("oracle-check")
    n_pass = n_fail = n_skip = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark side raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"SKIP {name}: no oracle (rows={len(spark_rows)}) [{time.time()-t0:.1f}s]")
            n_skip += 1
            continue
        try:
            rel = con.sql(spec.oracle)
            duck_cols = list(rel.columns)
            duck_types = list(rel.types)
            duck_rows = rel.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb side raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        # Fetch-type gate: value comparison below uses fetchall() Python
        # scalars and is blind to dtype divergence; the driver's hash is
        # not.  Fail on any type a pandas/Arrow fetch would distort, and
        # on any per-column fetch-family mismatch vs the Spark schema.
        type_errs = [
            f"oracle column {c} has fetch-unsafe type {t} "
            f"(tokens {unsafe_type_tokens(str(t))})"
            for c, t in zip(duck_cols, duck_types)
            if unsafe_type_tokens(str(t))
        ] + [
            f"fetch-dtype mismatch on {c}: spark={s} duckdb={d}"
            for c, s, d in dtype_mismatches(sdf.schema, duck_cols, duck_types)
        ]
        if type_errs:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for e in type_errs:
                print(f"   {e}")
            n_fail += 1
            continue
        # Per-query cache hygiene: many queries persist multi-consumer
        # intermediates for the duration of their plan; without this,
        # a full 145-query run accumulates every query's caches in one
        # session and later queries run under eviction pressure.
        spark.catalog.clearCache()
        errs = compare(name, spark_rows, spark_cols, duck_rows, duck_cols, args.tol)
        if errs:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for e in errs:
                print(f"   {e}")
            n_fail += 1
        else:
            print(f"PASS {name} rows={len(spark_rows)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
