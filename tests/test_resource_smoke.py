"""Resource smoke (reference tests/test_worker_11.py:149 analog — its
<1 MiB map-heap constraint becomes: the DRIVER must stay lean while the
cluster does the work).

Runs the headline queries at sf0.1 through the noop sink and asserts:
- no engine code path collects more than O(groups) rows to the driver
  (the only sanctioned collects are the O(num_partitions) global-rank
  offsets and scalar convergence sums);
- the Python driver's peak RSS grows by a bounded amount — a query
  that funneled the fact table through the driver would blow this.
"""

import os
import resource

from pyspark.sql import DataFrame

from engine.registry import all_queries

SF_BENCH = "/root/testdata/sf0.1"

COLLECT_ROW_CAP = 2000  # >> num_partitions, << any fact-table size
RSS_GROWTH_CAP_KB = 768 * 1024  # 768 MiB driver-side headroom


def test_headline_queries_driver_lean(spark, monkeypatch):
    if not os.path.isdir(SF_BENCH):
        import pytest

        pytest.skip("sf0.1 testdata not present")

    collected: list[int] = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on Linux
    specs = all_queries()
    names = [n for n, s in specs.items() if "headline" in s.tags]
    assert names, "no headline queries registered"
    for name in names:
        # noop sink: full execution, zero driver materialization
        specs[name].fn(spark, SF_BENCH).write.format("noop").mode(
            "overwrite"
        ).save()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    oversize = [c for c in collected if c > COLLECT_ROW_CAP]
    assert not oversize, (
        f"engine collected {oversize} rows driver-side — headline paths "
        "must keep driver state O(num_partitions)"
    )
    assert rss1 - rss0 < RSS_GROWTH_CAP_KB, (
        f"driver RSS grew {(rss1 - rss0) / 1024:.0f} MiB running headline "
        "queries — something is materializing on the driver"
    )
