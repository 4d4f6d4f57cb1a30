"""Layer A: Hadoop-Streaming-compatible MapReduce job runner.

Reproduces the reference's user-visible semantics (SURVEY.md §2.1) on
Spark: arbitrary mapper/reducer executables over line-oriented text,
md5(key) % R hash partitioning, whole-line lexicographic sort before
reduce, ``part-NNNNN`` text outputs. The reference's manager/worker
sockets, heartbeats, and task scheduler (F11-F16) are replaced
wholesale by Spark's DAG scheduler, shuffle, and fault tolerance.
"""

from engine.mapreduce.runner import run_job

__all__ = ["run_job"]
