"""Layout tests: the Morton math must be the textbook interleave, the
audit's simulated layouts must show the z-order skipping win, and —
the physical half — files written by ``zorder_write`` must carry
footer statistics that a real reader would use to skip, measurably
better than a single-key layout for cross-dimension predicates."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from engine.io import load_table
from engine.operators.layout import (
    GRID,
    layout_zorder_skipping,
    with_zorder,
    zorder_write,
)
from tests.conftest import SF_CHECK, SF_SMOKE


def _interleave(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_textbook_interleave(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321)],
        "x long, y long",
    )
    rows = with_zorder(df, "x", "y").collect()
    for r in rows:
        # full-range corners pin the grid to identity here
        assert r.z == _interleave(r.gx, r.gy)
    corner = {(r.gx, r.gy): r.z for r in rows}
    assert corner[(65535, 65535)] == (1 << 32) - 1


def test_audit_shows_zorder_skipping_win(spark):
    got = {
        r.layout: r
        for r in layout_zorder_skipping(spark, SF_SMOKE).collect()
        if r.facet == "zo2"
    }
    assert set(got) == {"linear", "zorder"}
    lin, zo = got["linear"], got["zorder"]
    assert lin.n_rows == zo.n_rows  # same data, different layout
    # the whole point: mixed-dimension probes scan far fewer z-files
    assert zo.files_hit < lin.files_hit
    assert zo.rows_hit < lin.rows_hit


def _rowgroup_hits(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(row groups whose [min,max] of ``col`` overlaps [lo,hi], total
    row groups) across all files — read from the parquet FOOTERS, the
    exact stats a real scan's predicate skipping uses."""
    hit = total = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st.min <= hi and st.max >= lo:
                hit += 1
    return hit, total


def test_written_files_skip_on_both_dimensions(spark, tmp_path):
    li = load_table(spark, SF_CHECK, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    zorder_write(li, "l_orderkey", "l_partkey", zpath, 8)
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    bounds = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_orderkey"), F.max("l_orderkey"),
    ).collect()[0]
    ymin, ymax, xmin, xmax = bounds
    # a narrow partkey range (the dimension linear layout ignores):
    # real footer stats must let the z-layout skip files, while the
    # linear layout reads everything
    ylo = ymin + (ymax - ymin) * 3 // 8
    yhi = ymin + (ymax - ymin) * 4 // 8
    z_hit, z_tot = _rowgroup_hits(zpath, "l_partkey", ylo, yhi)
    l_hit, l_tot = _rowgroup_hits(lpath, "l_partkey", ylo, yhi)
    assert z_tot >= 8 and l_tot >= 8
    assert l_hit == l_tot  # single-key layout prunes nothing on y
    assert z_hit < z_tot  # z-layout skips real files on y
    # and the z layout still prunes on x (it trades, not surrenders,
    # the clustered dimension)
    xlo = xmin + (xmax - xmin) * 3 // 8
    xhi = xmin + (xmax - xmin) * 4 // 8
    zx_hit, zx_tot = _rowgroup_hits(zpath, "l_orderkey", xlo, xhi)
    assert zx_hit < zx_tot


def test_morton_n_dims_matches_reference_interleave(spark):
    """The N-dim fold must place bit i of dim d at position i*N+d, and
    a 3-dim z-sort must cluster all three dimensions (each dim's
    neighborhood shrinks vs a random order)."""
    from engine.operators.layout import morton_n_expr

    def ref_z(vals, bits):
        z = 0
        for i in range(bits):
            for d, v in enumerate(vals):
                z |= ((v >> i) & 1) << (i * len(vals) + d)
        return z

    df = spark.createDataFrame(
        [(1, 2, 3), (7, 0, 5), (2**21 - 1, 2**21 - 1, 2**21 - 1), (0, 0, 0)],
        "a long, b long, c long",
    )
    rows = df.withColumn(
        "z", F.expr(morton_n_expr(["a", "b", "c"])).cast("bigint")
    ).collect()
    for r in rows:
        assert r.z == ref_z((r.a, r.b, r.c), 21), r
    # 63-bit safety: the all-max corner is the largest 63-bit value
    assert max(r.z for r in rows) == (1 << 63) - 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        morton_n_expr(["a"])
    with _pytest.raises(ValueError):
        morton_n_expr(["a", "b", "c"], bits=22)


def test_three_dim_audit_serves_all_dimensions(spark):
    from engine.operators.layout import layout_zorder3_skipping

    got = {
        r.layout: r
        for r in layout_zorder3_skipping(spark, SF_SMOKE).collect()
    }
    assert set(got) == {"linear", "zorder3"}
    lin, zo = got["linear"], got["zorder3"]
    assert lin.n_rows == zo.n_rows
    # 12 single-dimension probes: the single-key layout answers only
    # its own dimension's 4; the 3-dim z-order answers all 12
    assert zo.files_hit < lin.files_hit
    assert zo.rows_hit < lin.rows_hit
