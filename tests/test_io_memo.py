"""Scan-memo behavior: the memo returns the same lazy plan object per
(session, dir, table), holds plans not data, and
``invalidate_scan_memo`` makes a mutated table dir visible again
within one session (VERDICT r11 #3 / round-12 change)."""

import os
import shutil

from engine.io import TABLES, invalidate_scan_memo, load_table
from tests.conftest import SF_SMOKE


def test_memo_returns_same_plan_object(spark):
    name = sorted(TABLES)[0]
    a = load_table(spark, SF_SMOKE, name)
    b = load_table(spark, SF_SMOKE, name)
    assert a is b  # memo hit: no rebuilt scan, same unexecuted plan


def test_invalidate_makes_new_files_visible(spark, tmp_path):
    # Clone one fixture table into a mutable sf-dir layout —
    # `<dir>/<name>.parquet` as a DIRECTORY of part files (Spark reads
    # both forms) — load it (memo pins the file listing), then add a
    # second part file: the memoized plan must NOT see it, and after
    # invalidate_scan_memo the new file must be scanned.
    name = sorted(TABLES)[0]
    src = os.path.join(SF_SMOKE, f"{name}.parquet")
    sf_dir = str(tmp_path)
    dst = os.path.join(sf_dir, f"{name}.parquet")
    os.makedirs(dst)
    shutil.copy(src, os.path.join(dst, "part-0.parquet"))

    before = load_table(spark, sf_dir, name)
    n_before = before.count()

    shutil.copy(src, os.path.join(dst, "part-1.parquet"))

    # The pinned listing still answers from the original file.
    assert load_table(spark, sf_dir, name) is before
    assert before.count() == n_before

    invalidate_scan_memo(spark, sf_dir)
    after = load_table(spark, sf_dir, name)
    assert after is not before
    assert after.count() == 2 * n_before  # the added file is scanned


def test_invalidate_all_dirs(spark):
    name = sorted(TABLES)[0]
    a = load_table(spark, SF_SMOKE, name)
    invalidate_scan_memo(spark)  # no sf_dir: drop everything
    assert load_table(spark, SF_SMOKE, name) is not a
