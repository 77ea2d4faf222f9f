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
