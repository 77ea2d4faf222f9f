"""Source/sink surface: CSV and JSON reads with explicit schemas (SURVEY
§2.2 'Scans/sources/sinks'), parquet write round-trip, noop sink."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    path = str(tmp_path / "customer_csv")
    c.write.option("header", True).csv(path)
    back = spark.read.option("header", True).schema(c.schema).csv(path)
    assert back.count() == c.count()
    assert {r.c_custkey for r in back.select("c_custkey").collect()} == {
        r.c_custkey for r in c.select("c_custkey").collect()
    }
    # aggregate equivalence (values survive the text round-trip)
    a = c.agg(F.round(F.sum("c_acctbal"), 2).alias("s")).collect()[0].s
    b = back.agg(F.round(F.sum("c_acctbal"), 2).alias("s")).collect()[0].s
    assert a == b


def test_json_roundtrip_with_nested(spark, sf_dir, tmp_path):
    e = spark.read.parquet(f"{sf_dir}/events.parquet").limit(200)
    path = str(tmp_path / "events_json")
    e.write.json(path)
    back = spark.read.schema(e.schema).json(path)
    assert back.count() == 200
    # props JSON column survives and parses
    k = back.select(F.get_json_object("props", "$.k").cast("int").alias("k"))
    assert k.filter(F.col("k").isNotNull()).count() == 200


def test_parquet_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Partitioned layout + partition pruning (the 100 TB table layout)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "yr", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    o.write.partitionBy("yr").parquet(path)
    back = spark.read.parquet(path).filter(F.col("yr") == 1997)
    plan = back._jdf.queryExecution().executedPlan().toString()
    got = back.count()
    want = o.filter(F.col("yr") == 1997).count()
    assert got == want
    # pruned scan: only the yr=1997 directory is listed
    assert "PartitionFilters" in plan


def test_noop_sink(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy("l_returnflag").count()
    df.write.format("noop").mode("overwrite").save()  # executes, discards


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC is the other columnar interchange format users arrive with."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    path = str(tmp_path / "lineitem_orc")
    li.write.orc(path)
    back = spark.read.orc(path)
    assert back.count() == li.count()
    a = li.agg(F.round(F.sum("l_extendedprice"), 2).alias("s")).collect()[0].s
    b = back.agg(F.round(F.sum("l_extendedprice"), 2).alias("s")).collect()[0].s
    assert a == b
    # predicate pushdown reaches the ORC scan
    plan = (
        back.filter(F.col("l_shipdate") > "1996-01-01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "l_shipdate" in plan


def test_write_compacted_bounds_file_count(spark, sf_dir, tmp_path):
    """200 near-empty input partitions must not become 200 output files —
    AQE REBALANCE coalesces to the advisory partition size."""
    import glob

    from flink_wordcount_spark.io import write_compacted

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(200)
    path = str(tmp_path / "compacted")
    write_compacted(li, path, by=["l_orderkey"])
    files = glob.glob(f"{path}/part-*.parquet")
    assert 1 <= len(files) <= 8, len(files)
    back = spark.read.parquet(path)
    assert back.count() == li.count()
