"""Spark 4 Python Data Source for the versioned store: the store's
snapshot-read path surfaced through Spark's OWN reader API, so a
pinned version is one line —

    spark.read.format("vstore").option("version", 3).load(store)

— instead of an engine-specific call. Built on the public
``pyspark.sql.datasource`` API (Spark 4's Python Data Source,
SPARK-44076): the DRIVER-side planning resolves the manifest (schema
from the recorded DDL, file list pruned catalog-side), emits ONE
input partition per data file, and the EXECUTOR side reads each file
with pyarrow and yields Arrow RecordBatches — the vectorized path, no
per-row Python.

Why this exists when ``read_version`` already does: a Spark-first
engine should meet users where Spark's API is. The format string
composes with everything that accepts a reader — SQL
(``CREATE TEMPORARY VIEW v USING vstore OPTIONS (...)``), MLlib
pipelines, notebooks — and it carries the store's metadata plane
(manifest pruning, bloom sidecars, widening reads) into that surface.

File pruning is driven by OPTIONS, mirroring ``read_version``'s
keyword arguments and semantics (the result is EXACTLY the rows
matching the option predicates — files pruned catalog-side, the
residual applied row-level at the Arrow layer):

* ``partitions`` — comma-separated partition values (single-column
  stores), manifest-entry pruning;
* ``range`` — semicolon-separated ``col:lo:hi`` closed intervals
  (empty bound = unbounded side), pruned via per-file stats;
* ``point`` — semicolon-separated ``col:value`` equality probes,
  pruned via the version's bloom sidecar when one exists.

Engineering note — why options and NOT ``pushFilters``: Spark 4.1
plans a Python data source read once per RELATION instance, so a
temp view referenced twice in one query (e.g. a UNION of a full and
a filtered aggregate over the same view) shares ONE partition list
and read function. A reader whose ``pushFilters`` prunes files (or
claims filters as handled) therefore leaks one branch's pruning into
the other — observed as wrong rows before this was removed. Options
are part of the relation's identity, so two differently-optioned
reads are two relations and can never share a plan; within one
relation the pruning is constant, which is exactly when sharing is
sound.

Schema evolution flows through: each file partition carries its Hive
partition values; the reader appends them as constant Arrow columns
and CASTS the batch to the table schema — missing columns null-fill
(additive evolution) and narrow int32 files upcast to a bigint table
column (type widening), identical to ``read_version``.

Scale shape: planning is O(manifest) driver-side metadata — the same
metadata the store already holds — and reading is one task per file
with Arrow batches, so the data plane matches the native parquet
reader's parallelism. Reference parity note: the reference engine has
no pluggable source API (SURVEY.md §2.3); Layer-B capability.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class VStoreFilePartition(InputPartition):
    def __init__(
        self, path: str, pvals: tuple, pcols: tuple, preds: tuple = ()
    ):
        self.path = path
        self.pvals = pvals
        self.pcols = pcols
        # residual row-level predicates from the pruning options,
        # snapshotted into the partition so read() is self-contained:
        # tuples of (op, column, value) with op in {eq, ge, le}
        self.preds = preds


def _store_schema_ddl(man: dict) -> str:
    """The snapshot's full DDL (data columns + string partition
    columns). Returned as a STRING because the data source's planning
    hooks run in a worker process with no SparkContext — Spark parses
    it and hands the reader the resolved StructType."""
    from engine.versioned_store import _norm_pcols

    ddl = man.get("columns")
    if ddl is None:
        raise ValueError(
            "vstore source needs a manifest with a recorded schema"
            " (store predates schema recording)"
        )
    pddl = ", ".join(
        f"{c} string" for c in _norm_pcols(man["partition_col"])
    )
    return f"{ddl}, {pddl}" if ddl else pddl


def _parse_bound(raw: str, numeric: bool):
    if raw == "":
        return None
    if numeric:
        return float(raw) if "." in raw else int(raw)
    return raw


class VStoreReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        from engine.versioned_store import (
            _bloom_prune,
            _norm_pcols,
            _norm_pval,
            _prune_entries,
            _read_bloom_sidecar,
            _read_manifest,
            current_version,
        )

        self.store = options.get("path")
        if not self.store:
            raise ValueError("vstore source requires .load(<store path>)")
        v = options.get("version")
        self.version = int(v) if v is not None else current_version(
            self.store
        )
        self.man = _read_manifest(self.store, self.version)
        self.schema_ = schema
        numeric = {
            f.name
            for f in schema.fields
            if f.dataType.typeName()
            in ("byte", "short", "integer", "long", "float", "double")
        }

        pcols = _norm_pcols(self.man["partition_col"])
        entries = self.man["files"]
        preds: list[tuple] = []
        if options.get("partitions"):
            wanted = {
                (p,) for p in options["partitions"].split(",")
            }
            if len(pcols) != 1:
                raise ValueError(
                    "the partitions option addresses single-column"
                    " stores; composite stores need range/point options"
                )
            entries = [
                e for e in entries if _norm_pval(e["partition"]) in wanted
            ]
        ranges: dict[str, tuple] = {}
        for spec in filter(None, (options.get("range") or "").split(";")):
            col, lo, hi = spec.split(":")
            ranges[col] = (
                _parse_bound(lo, col in numeric),
                _parse_bound(hi, col in numeric),
            )
            if ranges[col][0] is not None:
                preds.append(("ge", col, ranges[col][0]))
            if ranges[col][1] is not None:
                preds.append(("le", col, ranges[col][1]))
        points: dict[str, object] = {}
        for spec in filter(None, (options.get("point") or "").split(";")):
            col, raw = spec.split(":", 1)
            points[col] = _parse_bound(raw, col in numeric)
            preds.append(("eq", col, points[col]))
        if ranges:
            entries = _prune_entries(entries, ranges)
        if points:
            sidecar = _read_bloom_sidecar(self.store, self.version)
            if sidecar is not None:
                entries = _bloom_prune(entries, sidecar, points)
        self._entries = entries
        self._pcols = tuple(pcols)
        self._preds = tuple(preds)

    def partitions(self):
        from engine.versioned_store import _norm_pval

        return [
            VStoreFilePartition(
                os.path.join(self.store, "data", e["file"]),
                _norm_pval(e["partition"]),
                self._pcols,
                self._preds,
            )
            for e in self._entries
        ]

    def read(self, partition: VStoreFilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema_)
        table = pq.read_table(partition.path)
        # residual row filter for the pruning options (SQL semantics:
        # a null comparison filters the row). Partition columns are
        # constants here; columns missing from a pre-evolution file
        # are all-null, so any predicate on them filters every row.
        if partition.preds:
            import pyarrow.compute as pc

            ops = {
                "eq": pc.equal,
                "ge": pc.greater_equal,
                "le": pc.less_equal,
            }
            for op, col, value in partition.preds:
                if col in partition.pcols:
                    i = partition.pcols.index(col)
                    ok = ops[op].__name__ == "equal" and (
                        partition.pvals[i] == value
                    )
                    if not ok:
                        return
                    continue
                if col not in table.column_names:
                    return
                mask = ops[op](table.column(col), value)
                table = table.filter(pc.fill_null(mask, False))
        n = table.num_rows
        cols = []
        for field in target:
            if field.name in partition.pcols:
                i = partition.pcols.index(field.name)
                cols.append(
                    pa.array([partition.pvals[i]] * n, type=field.type)
                )
            elif field.name in table.column_names:
                # CAST to the table schema: widening evolution (int32
                # file -> bigint column) and exact types for the rest
                cols.append(
                    table.column(field.name).cast(field.type).combine_chunks()
                )
            else:
                # additive evolution: pre-evolution file null-fills
                cols.append(pa.nulls(n, type=field.type))
        yield from pa.table(
            cols, schema=target
        ).to_batches(max_chunksize=1 << 16)


class VStoreDataSource(DataSource):
    """``spark.read.format("vstore")`` — see the module docstring."""

    @classmethod
    def name(cls) -> str:
        return "vstore"

    def schema(self) -> str:
        from engine.versioned_store import _read_manifest, current_version

        store = self.options.get("path")
        if not store:
            raise ValueError("vstore source requires .load(<store path>)")
        v = self.options.get("version")
        version = int(v) if v is not None else current_version(store)
        return _store_schema_ddl(_read_manifest(store, version))

    def reader(self, schema: StructType) -> VStoreReader:
        return VStoreReader(dict(self.options), schema)


def register_vstore(spark) -> None:
    """Register the format for this session (idempotent)."""
    spark.dataSource.register(VStoreDataSource)
