"""Hadoop-Streaming-compatible MapReduce job runner on Spark RDDs.

Reference semantics reproduced (citations into /root/reference):

- Input: a directory of UTF-8 text files, listed in sorted order
  (``manager/__main__.py:193``), read line-by-line.
- Map: each line streamed through the mapper executable's stdin; its
  stdout lines are intermediate records (``worker/__main__.py:134-151``).
  The reference runs one mapper process per input *file*; we run one per
  Spark partition — observationally identical for the documented
  contract (stateless line-wise executables, SURVEY.md §7 Phase 2).
- Partition: intermediate line → bucket
  ``int(md5(key).hexdigest(), 16) % num_reducers`` where key = text
  before the first tab (``worker/__main__.py:143-148``).
- Sort: each reducer's input is sorted lexicographically by WHOLE LINE
  (byte order; ``worker/__main__.py:166-167`` uses coreutils sort, and
  ``heapq.merge`` preserves it, ``worker/__main__.py:196-209``). Python
  str comparison over UTF-8 text equals byte order, matching the
  C-locale sort the goldens assume (SURVEY.md §8).
- Reduce: the merged sorted stream is piped through the reducer
  executable; contiguous equal keys are the grouping contract
  (``tests/testdata/exec/wc_reduce.py:25-28``).
- Output: ``part-00000 .. part-0000(R-1)`` text files in the output
  directory, which is deleted and recreated first
  (``worker/__main__.py:195,213-216``; ``manager/__main__.py:183-187``).

Scale notes: this is one Spark stage pair (map → shuffle → reduce);
the shuffle is Spark's sort-based shuffle, which spills — the
reference's <1 MiB map-heap property (``tests/test_worker_11.py:149``)
is inherited, not re-implemented. At 100 TB the only knob that matters
is ``num_reducers`` (partition count past the shuffle).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Iterator
from tempfile import mkdtemp

from pyspark.sql import SparkSession

LineTransform = Callable[[Iterator[str]], Iterator[str]]


def _exec_command(executable: str | list[str]) -> str:
    """Build the pipe command for an executable, honoring shebangs even
    when the file lacks the executable bit (the reference always execs
    directly; we are more forgiving)."""
    if isinstance(executable, list):
        parts = list(executable)
    else:
        parts = [executable]
    path = parts[0]
    if os.path.isfile(path) and not os.access(path, os.X_OK):
        with open(path, "rb") as f:
            first = f.readline().decode("utf-8", "replace").strip()
        if first.startswith("#!"):
            shebang = first[2:].split()
            if shebang and shebang[0].endswith("env"):
                # '#!/usr/bin/env -S python3 -u' → ['python3', '-u']
                interp = [a for a in shebang[1:] if a != "-S"]
            else:
                interp = shebang
            parts = interp + parts
        else:
            parts = ["sh"] + parts
    # RDD.pipe tokenizes the command string; quote each part so
    # executable paths or argv entries containing spaces/quotes don't
    # silently split into wrong tokens (round-1 advice).
    import shlex

    return " ".join(shlex.quote(str(p)) for p in parts)


def list_input_files(input_dir: str) -> list[str]:
    """Sorted directory listing — the reference's deterministic scan
    (manager/__main__.py:193)."""
    return [
        os.path.join(input_dir, f)
        for f in sorted(os.listdir(input_dir))
        if os.path.isfile(os.path.join(input_dir, f))
    ]


def run_job(
    spark: SparkSession,
    input_directory: str,
    output_directory: str,
    mapper: str | list[str] | LineTransform,
    reducer: str | list[str] | LineTransform,
    num_mappers: int = 2,
    num_reducers: int = 2,
) -> list[str]:
    """Run one MapReduce job; returns the output part-file paths.

    ``mapper``/``reducer`` are either executables (str path, or
    [path, arg, ...] — Hadoop Streaming mode, reference-exact) or
    Python callables ``Iterator[str] -> Iterator[str]`` (native mode).
    """
    sc = spark.sparkContext
    files = list_input_files(input_directory)
    if not files:
        raise FileNotFoundError(f"no input files in {input_directory}")
    # sc.textFile takes a comma-separated path list, so a comma INSIDE a
    # filename would silently split into two bogus paths (round-1
    # advice). Reject loudly; such names also break Hadoop's own API.
    # Hadoop also interprets the path string as a GLOB, so [, ], {, },
    # *, ? in a filename would be expanded as a pattern and silently
    # skip (or mis-match) the file — same path-string-API bug class.
    bad = [f for f in files if "," in f or any(ch in f for ch in "[]{}*?")]
    if bad:
        raise ValueError(
            f"input paths must not contain commas or glob"
            f" metacharacters ([]{{}}*?): {bad}"
        )

    # Map stage. minPartitions=num_mappers for task-shape parity with
    # the reference's round-robin split (manager/__main__.py:195-202);
    # per-file grouping is not load-bearing for stateless mappers.
    lines = sc.textFile(",".join(files), minPartitions=max(1, num_mappers))
    if callable(mapper):
        mapped = lines.mapPartitions(mapper)
    else:
        # checkCode: a mapper that exits non-zero must FAIL the job
        # (reference Hadoop-Streaming semantics), not publish the
        # partial lines it emitted before crashing.
        mapped = lines.pipe(_exec_command(mapper), checkCode=True)

    # Shuffle: md5-bucket by key, whole-line sort within partition.
    # Defined as local closures (not module references) so cloudpickle
    # ships them by value — executors need no 'engine' on PYTHONPATH.
    n_red = max(1, num_reducers)

    def md5_bucket_of_line(line: str) -> int:
        import hashlib as _hashlib

        key = line.split("\t", 1)[0]
        return int(_hashlib.md5(key.encode("utf-8")).hexdigest(), 16) % n_red

    shuffled = (
        mapped.map(lambda line: (line, None))
        .repartitionAndSortWithinPartitions(
            numPartitions=n_red,
            partitionFunc=md5_bucket_of_line,
            keyfunc=lambda line: line,
        )
        .map(lambda kv: kv[0])
    )

    # Reduce stage: one reducer process (or callable) per partition.
    if callable(reducer):
        reduced = shuffled.mapPartitions(reducer)
    else:
        reduced = shuffled.pipe(_exec_command(reducer), checkCode=True)

    # Sink: delete + recreate the output dir (manager/__main__.py:183-187),
    # then publish Spark's part-NNNNN files (worker/__main__.py:195).
    if os.path.exists(output_directory):
        shutil.rmtree(output_directory)
    os.makedirs(output_directory)
    staging = mkdtemp(prefix="mapreduce-staging-")
    target = os.path.join(staging, "out")
    reduced.saveAsTextFile(target)
    out_paths: list[str] = []
    for name in sorted(os.listdir(target)):
        if name.startswith("part-"):
            # Spark names files part-00000[.codec]; reference uses bare
            # part-NNNNN (worker/__main__.py:195). A codec suffix means
            # the session enabled output compression — renaming would
            # publish compressed bytes under a plain-text name, so
            # refuse instead of silently corrupting the contract.
            if "." in name:
                raise RuntimeError(
                    f"compressed part file {name!r}: disable output"
                    " compression for reference text-sink parity"
                )
            dst = os.path.join(output_directory, name.split(".")[0])
            shutil.move(os.path.join(target, name), dst)
            out_paths.append(dst)
    shutil.rmtree(staging)
    return out_paths
