"""Scalable global ordering: total row numbering without a
single-partition Window.

The reference has no ranking operators at all (SURVEY.md §2.3 —
`worker/__main__.py:55-58` dispatches only map/reduce); global ranks are
new Layer-B capability. Spark's built-in unpartitioned Window funnels
every row through ONE task ("No Partition Defined" warning) — tolerable
on a dim table at test scale, fatal on a 1B-row table at SF100k. These
helpers compute the same total ordering with the classic two-pass
range-partition trick:

  1. ``repartitionByRange`` on the sort key — one shuffle, all
     partitions work in parallel, partition *i* holds a contiguous
     slice of the global order;
  2. count rows per partition (a tiny aggregate over the persisted
     input — O(num_partitions) rows reach the driver, never O(rows));
  3. broadcast the cumulative offsets back and add a PARTITIONED
     row_number: global position = offset[partition] + local position.

Determinism: callers must pass a TOTAL ordering (include a unique
tie-break column); with a total order the result is independent of
where the range partitioner draws its boundaries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_PID = "_gr_pid"
_OFF = "_gr_offset"


def _as_cols(order_cols: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def with_global_row_number(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Add a 1-based global row number in ``order_cols`` order.

    Returns ``(df_with_out_col, total_row_count)``. ``order_cols`` must
    be a total ordering (unique tie-break) for a deterministic result.
    Cost: one range shuffle + one tiny count job + one hash shuffle on
    the synthetic partition id — every stage fully parallel; driver
    state is O(num_partitions).
    """
    cols = _as_cols(order_cols)
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (
        df.repartitionByRange(n, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        row[_PID]: row["cnt"]
        for row in part.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total = sum(counts.values())
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(offsets or [(0, 0)], f"{_PID} INT, {_OFF} BIGINT")
    w = W.partitionBy(_PID).orderBy(*cols)
    out = (
        part.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, (F.row_number().over(w) + F.col(_OFF)).cast("bigint"))
        .drop(_PID, _OFF)
    )
    return out, total


def ntile_expr(rn: Column, total: int, k: int) -> Column:
    """SQL-standard NTILE(k) from a 1-based global row number ``rn``:
    first ``total % k`` buckets get one extra row. Matches Spark's and
    DuckDB's NTILE exactly, but needs no global window."""
    q, r = divmod(total, k)
    big = (q + 1) * r  # rows covered by the r larger buckets
    denom = q if q > 0 else 1  # q == 0 ⇒ rn <= big always; branch unused
    return F.when(rn <= big, F.ceil(rn / (q + 1))).otherwise(
        r + F.ceil((rn - big) / denom)
    )
