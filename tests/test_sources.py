"""Source-connector round-trips: CSV / JSON lines / ORC must carry the
same rows and schema as the source parquet tables, and ORC scans must keep
predicate pushdown (the property that makes a format scale)."""

from pyspark.sql import functions as F

from engine.io import load_table
from engine.plans import formatted_plan
from engine.sources import read_csv, read_json, read_orc, write_orc
from tests.conftest import SF_SMOKE


def _nation_sample(spark):
    return load_table(spark, SF_SMOKE, "nation")


def test_csv_roundtrip(spark, tmp_path):
    df = _nation_sample(spark)
    out = str(tmp_path / "nation_csv")
    df.write.mode("overwrite").option("header", "true").csv(out)
    back = read_csv(spark, out, df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    assert back.schema == df.schema


def test_json_roundtrip(spark, tmp_path):
    df = _nation_sample(spark)
    out = str(tmp_path / "nation_json")
    df.write.mode("overwrite").json(out)
    back = read_json(spark, out, df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    out = str(tmp_path / "li_orc")
    write_orc(li, out)
    back = read_orc(spark, out)
    assert back.count() == li.count()
    assert back.schema == li.schema

    filtered = back.filter(F.col("l_quantity") > 30.0).select("l_orderkey")
    plan = formatted_plan(filtered)
    # Both the predicate and the 2-column projection must reach the scan.
    assert "PushedFilters" in plan and "l_quantity" in plan, plan
    got = filtered.count()
    want = li.filter(F.col("l_quantity") > 30.0).count()
    assert got == want


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Old files without the late-added column read as NULL; new files
    carry it; the merged frame exposes the union schema."""
    from engine.sources.tabular import read_parquet_evolving

    gen1, gen2 = str(tmp_path / "gen1"), str(tmp_path / "gen2")
    spark.createDataFrame([(1, "a")], ["id", "val"]).write.parquet(gen1)
    spark.createDataFrame(
        [(2, "b", 0.9)], ["id", "val", "quality"]
    ).write.parquet(gen2)

    df = read_parquet_evolving(spark, gen1, gen2)
    assert set(df.columns) == {"id", "val", "quality"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["quality"] is None
    assert rows[2]["quality"] == 0.9
