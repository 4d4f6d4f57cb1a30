"""The engine's shared deterministic 60-bit hash, in three dialects.

Cross-engine reproducibility rule (SURVEY.md §7 risk 3): NEVER rely on
an engine-internal hash (Spark's Murmur3, DuckDB's hash()) for results
that must match across engines or survive re-runs — use this md5-derived
construction instead. 15 hex chars = 60 bits, always positive, fits a
signed int64 in both engines.
"""

from __future__ import annotations

import hashlib

# Spark SQL expression template ({x} = any string expression).
SPARK_H60 = "cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)"

# DuckDB SQL expression template.
DUCK_H60 = "CAST(CAST(('0x' || substr(md5({x}), 1, 15)) AS UBIGINT) AS BIGINT)"


def h60_py(s: str) -> int:
    """Python twin (used by Pandas-UDF paths and tests)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
