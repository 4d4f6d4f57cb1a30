"""Cross-engine deterministic rounding.

``round(x, n)`` disagrees between Spark and DuckDB when ``x``'s binary
expansion lands on a decimal half-way boundary (e.g. 1702.33/40 =
42.55825 → 42.5583 vs 42.5582), because each engine reaches the double
through a different summation order and then applies a different
rounding rule.  The fix used by q2 (commit 5cf4de9) is to round via the
*identical IEEE double operations* on both sides:

    floor(x * 10^n + 0.5) / 10^n

Both engines then execute the same multiply/add/floor/divide on the
same double and must agree bit-for-bit.  Use these helpers for every
rounded *output* column that feeds the driver's value hash; keep
internal math unrounded.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_he(col: Column | str, ndigits: int) -> Column:
    """Half-up rounding via identical IEEE ops (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**ndigits)
    return F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def duck_round_he(expr: str, ndigits: int) -> str:
    """The same rounding as :func:`round_he`, as DuckDB SQL text.

    The CAST keeps DuckDB from planning the literal as DECIMAL (DuckDB
    parses ``10000.0`` as DECIMAL(6,1), which would change the math).
    """
    scale = float(10**ndigits)
    return (
        f"floor(({expr}) * CAST({scale!r} AS DOUBLE) + 0.5)"
        f" / CAST({scale!r} AS DOUBLE)"
    )
