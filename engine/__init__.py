"""PySpark-native analytics engine with the capabilities of
mehrkau26/485-p4-mapreduce (see SURVEY.md), built Spark-first.

Layers
------
Layer A (``engine.mapreduce``): a Hadoop-Streaming-compatible MapReduce
job runner reproducing the reference's semantics (arbitrary mapper /
reducer executables over line-oriented text, md5 hash partitioning,
whole-line sort, ``part-NNNNN`` text outputs).

Layer B (``engine.operators``): a DataFrame-native relational engine
over the TPC-H-ish synthetic tables plus LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis), each
designed for 100 TB scale: declarative plans for Catalyst, broadcast
joins for dims, LSH instead of all-pairs, no driver-side collects.
"""

__version__ = "0.1.0"
