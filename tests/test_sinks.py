"""Sink-side operator coverage (SURVEY.md §2.1 S5-S7, S10): temp views,
CTAS, saveAsTable overwrite semantics, partitioned path writes with
partition pruning on read-back."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_feature_store_flight_school_spark.sources import load_table


def test_temp_view_sink_and_sql_roundtrip(spark, sf_dir):
    """S5: createOrReplaceTempView registers a PLAN (lazy), queryable via
    SQL, replaceable in place."""
    load_table(spark, sf_dir, "region").createOrReplaceTempView("vw_region")
    assert spark.sql("SELECT count(*) AS n FROM vw_region").collect()[0]["n"] == 5
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("vw_region")
    assert spark.sql("SELECT count(*) AS n FROM vw_region").collect()[0]["n"] == 25
    spark.catalog.dropTempView("vw_region")


def test_ctas_sink(spark, sf_dir):
    """S6: CREATE TABLE AS SELECT through the session catalog."""
    spark.sql("DROP TABLE IF EXISTS ctas_nations")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("vw_nation_src")
    try:
        spark.sql(
            "CREATE TABLE ctas_nations USING PARQUET AS "
            "SELECT n_regionkey, count(*) AS n FROM vw_nation_src GROUP BY n_regionkey"
        )
        got = {r["n_regionkey"]: r["n"] for r in spark.table("ctas_nations").collect()}
        assert sum(got.values()) == 25 and len(got) == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS ctas_nations")
        spark.catalog.dropTempView("vw_nation_src")


def test_save_as_table_overwrite(spark, sf_dir):
    """S7: saveAsTable mode=overwrite replaces both data and schema."""
    spark.sql("DROP TABLE IF EXISTS sat_regions")
    try:
        load_table(spark, sf_dir, "region").write.format("parquet").mode(
            "overwrite"
        ).saveAsTable("sat_regions")
        assert spark.table("sat_regions").count() == 5
        load_table(spark, sf_dir, "region").select("r_name").limit(2).write.format(
            "parquet"
        ).mode("overwrite").saveAsTable("sat_regions")
        after = spark.table("sat_regions")
        assert after.columns == ["r_name"] and after.count() == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS sat_regions")


def test_partitioned_path_write_prunes(spark, sf_dir, tmp_path):
    """S10 + partition layout: partitionBy on write, and a partition filter
    on read-back scans only the matching directory (PartitionFilters)."""
    out = str(tmp_path / "orders_by_status")
    load_table(spark, sf_dir, "orders").write.partitionBy("o_orderstatus").mode(
        "overwrite"
    ).parquet(out)
    back = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    want = (
        load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").count()
    )
    assert back.count() == want
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan
