"""Dump .explain('formatted') for the named queries into plans/r12/.

Usage: python tools/dump_r12_plans.py <suffix> [names...]
  suffix: 'before' or 'after'
  names: default = the 13 bench headliners
"""

from __future__ import annotations

import io
import os
import sys
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.registry import all_queries_including_library  # noqa: E402
from engine.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")


def main() -> None:
    suffix = sys.argv[1]
    specs = all_queries_including_library()
    names = sys.argv[2:] or [n for n, s in specs.items() if "headline" in s.tags]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plans-r12")
    for name in names:
        df = specs[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        spark.catalog.clearCache()
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
