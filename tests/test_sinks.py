"""Sink tests: partitioned parquet round-trip with partition pruning,
and the bucketed co-located join (zero shuffle exchanges)."""

from pyspark.sql import functions as F

from engine.io import load_table
from engine.plans import formatted_plan, n_exchanges
from engine.sinks import read_table, write_bucketed_table, write_parquet
from tests.conftest import SF_SMOKE


def test_partitioned_parquet_roundtrip_and_pruning(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    out = str(tmp_path / "li_part")
    write_parquet(li, out, partition_by=["l_returnflag"])

    back = spark.read.parquet(out)
    assert back.count() == li.count()

    pruned = back.filter(F.col("l_returnflag") == "R")
    want = li.filter(F.col("l_returnflag") == "R").count()
    assert pruned.count() == want
    # Partition pruning: the scan must carry a partition filter, and
    # only the matching directory is read.
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and "l_returnflag" in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF_SMOKE, "orders")
    try:
        write_bucketed_table(
            li, "li_b", str(tmp_path / "li_b"), "l_orderkey", 8, sort_col="l_orderkey"
        )
        write_bucketed_table(
            orders.withColumnRenamed("o_orderkey", "l_orderkey"),
            "ord_b",
            str(tmp_path / "ord_b"),
            "l_orderkey",
            8,
            sort_col="l_orderkey",
        )
        a, b = read_table(spark, "li_b"), read_table(spark, "ord_b")
        # Disable broadcast so the join would otherwise shuffle both sides.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "l_orderkey")
            assert n_exchanges(joined) == 0, formatted_plan(joined)
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_compact_parquet_small_files(spark, tmp_path):
    """1000 tiny files → a handful of target-sized ones, same rows."""
    from engine.sinks import compact_parquet

    li = load_table(spark, SF_SMOKE, "lineitem")
    out = str(tmp_path / "li_small")
    li.repartition(64).write.parquet(out)
    import glob

    before = len(glob.glob(f"{out}/*.parquet"))
    assert before >= 64
    want = li.count()

    n_files = compact_parquet(spark, out, target_file_bytes=1024 * 1024)
    after = len(glob.glob(f"{out}/*.parquet"))
    assert after == n_files < before
    back = spark.read.parquet(out)
    assert back.count() == want
    assert set(back.columns) == set(li.columns)


def test_upsert_parquet_merge_semantics(spark, tmp_path):
    """Insert + update + late-arriving stale version + idempotent
    same-version republish."""
    from engine.sinks import upsert_parquet

    path = str(tmp_path / "snapshot")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], ["id", "val", "ver"]
    )
    assert upsert_parquet(spark, v1, path, ["id"], "ver") == 2

    # key 2 updated, key 3 inserted, key 1 receives a STALE version
    v2 = spark.createDataFrame(
        [(2, "b2", 20), (3, "c", 20), (1, "stale", 5)], ["id", "val", "ver"]
    )
    assert upsert_parquet(spark, v2, path, ["id"], "ver") == 3
    got = {r["id"]: (r["val"], r["ver"]) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 20)}

    # same-version republish of key 2 wins over base (update beats base
    # on ties) — rerunning a batch is a no-op state-wise
    v2b = spark.createDataFrame([(2, "b2-rerun", 20)], ["id", "val", "ver"])
    assert upsert_parquet(spark, v2b, path, ["id"], "ver") == 3
    got = {r["id"]: r["val"] for r in spark.read.parquet(path).collect()}
    assert got[2] == "b2-rerun"


def test_parquet_bloom_filter_write(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").coalesce(1)
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    write_parquet(docs, plain)
    write_parquet(docs, bloomed, bloom_filter_cols=["doc_id"], bloom_filter_ndv=1000)

    # The bloom filter occupies real bytes in the file (pyarrow/duckdb
    # here don't surface bloom_filter_offset, so presence is asserted
    # via the size delta — a filter sized for 1000 NDV adds ~1 KB+).
    size = lambda p: sum(
        f.stat().st_size for f in __import__("pathlib").Path(p).rglob("*.parquet")
    )
    assert size(bloomed) > size(plain)

    # Point-lookup reads stay exact through the bloom-filtered file.
    some_id = docs.select("doc_id").head()[0]
    got = spark.read.parquet(bloomed).filter(F.col("doc_id") == some_id)
    assert got.count() == docs.filter(F.col("doc_id") == some_id).count() == 1
