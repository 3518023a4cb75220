"""salted_join result parity + bucketed-join Exchange elimination
(operators/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from databricks_feature_store_flight_school_spark.operators.skew import (
    bucketed_table,
    salted_join,
    write_bucketed,
)
from databricks_feature_store_flight_school_spark.sources import load_table


def _counts(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must be invisible in the result: same rows, same columns."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(customer, on="o_custkey", how="inner")
    salted = salted_join(orders, customer, on="o_custkey", how="inner", salt=4)
    assert salted.columns == plain.columns
    cols = ["o_orderkey", "c_mktsegment"]
    assert _counts(salted, cols) == _counts(plain, cols)


def test_salted_left_join_preserves_unmatched(spark):
    left = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=1, v="b"), Row(k=2, v="c"), Row(k=9, v="z")]
    )
    right = spark.createDataFrame([Row(k=1, d="dim1"), Row(k=2, d="dim2")])
    out = salted_join(left, right, on="k", how="left", salt=3)
    got = {(r["k"], r["v"], r["d"]) for r in out.collect()}
    assert got == {(1, "a", "dim1"), (1, "b", "dim1"), (2, "c", "dim2"), (9, "z", None)}


def test_salted_join_duplicate_left_rows_survive(spark):
    """Identical left rows hash to the same salt — they must all survive."""
    left = spark.createDataFrame([Row(k=1, v="x")] * 5)
    right = spark.createDataFrame([Row(k=1, d="d")])
    assert salted_join(left, right, on="k", salt=4).count() == 5


def test_salted_join_rejects_unsupported_how(spark):
    df = spark.createDataFrame([Row(k=1)])
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, on="k", how="full")


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    join without any shuffle Exchange in the physical plan."""
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_customer")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    write_bucketed(orders, "bt_orders", "o_custkey", num_buckets=8, sort_cols="o_custkey")
    write_bucketed(customer, "bt_customer", "o_custkey", num_buckets=8, sort_cols="o_custkey")
    try:
        joined = bucketed_table(spark, "bt_orders").join(
            bucketed_table(spark, "bt_customer").hint("merge"), on="o_custkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it actually computes the right thing
        plain = orders.join(customer, on="o_custkey").count()
        assert joined.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_customer")


def _shuffles(df) -> str:
    """Shuffle-Exchange lines of the executed plan (BroadcastExchange is
    not a shuffle and doesn't count)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "\n".join(
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
        or "Exchange rangepartitioning" in ln or "Exchange SinglePartition" in ln
    )


@pytest.mark.skipif(
    not __import__("pathlib").Path("/root/testdata/sf0.1").exists(),
    reason="sf0.1 testdata not generated",
)
def test_bucketed_layout_runs_headline_queries_exchange_free(spark):
    """SCALING.md's layout claim, demonstrated on the real headline queries
    at sf0.1: with lineitem+orders bucketed on orderkey, q_flagship's
    fact-fact join runs with NO shuffle on the orderkey (the plain plan
    shuffles both sides), and with orders bucketed on custkey,
    q_window_topn's partitioned window runs with ZERO shuffle Exchanges
    end-to-end — identical results both times."""
    from databricks_feature_store_flight_school_spark.plans.queries_relational import (
        q_flagship_regional_revenue,
        q_window_topn_per_customer,
    )
    from pyspark.sql import Window

    sf_dir = "/root/testdata/sf0.1"
    for t in ("bl_lineitem", "bl_orders_ok", "bl_orders_ck"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(
        lineitem, "bl_lineitem", "l_orderkey", num_buckets=8,
        sort_cols="l_orderkey",
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "bl_orders_ok",
        "l_orderkey", num_buckets=8, sort_cols="l_orderkey",
    )
    write_bucketed(orders, "bl_orders_ck", "o_custkey", num_buckets=8)
    try:
        # -- q_flagship on the bucketed fact tables --------------------
        nation = load_table(spark, sf_dir, "nation")
        region = load_table(spark, sf_dir, "region")
        customer = load_table(spark, sf_dir, "customer")
        bucketed = (
            bucketed_table(spark, "bl_lineitem")
            .join(
                bucketed_table(spark, "bl_orders_ok")
                .where(F.col("o_orderstatus") != "P")
                .hint("merge"),
                on="l_orderkey",
            )
            .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy(F.col("r_name").alias("region_name"))
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue"),
                F.count(F.lit(1)).alias("line_count"),
                F.round(F.avg("l_discount"), 6).alias("avg_discount"),
            )
            .orderBy(F.col("revenue").desc())
        )
        got = [tuple(r) for r in bucketed.collect()]
        want = [
            tuple(r) for r in q_flagship_regional_revenue(spark, sf_dir).collect()
        ]
        assert got == want
        shuffles = _shuffles(bucketed)
        assert "l_orderkey" not in shuffles and "o_orderkey" not in shuffles, (
            "fact-fact join must consume the bucket layout:\n" + shuffles
        )
        # like-for-like contrast: the same sort-merge join over UNbucketed
        # scans shuffles both fact sides on the orderkey (at real scale
        # neither side broadcasts, so SMJ is the plan bucketing rescues)
        plain_smj = lineitem.join(
            orders.withColumnRenamed("o_orderkey", "l_orderkey")
            .where(F.col("o_orderstatus") != "P")
            .hint("merge"),
            on="l_orderkey",
        )
        assert "l_orderkey" in _shuffles(plain_smj)

        # -- q_window_topn on custkey-bucketed orders ------------------
        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_totalprice").desc(), "o_orderkey"
        )
        bwin = (
            bucketed_table(spark, "bl_orders_ck")
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select(
                F.col("o_custkey").alias("c_custkey"),
                "o_orderkey",
                F.round("o_totalprice", 2).alias("totalprice"),
                "rn",
            )
        )
        checksum = [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("c_custkey", "o_orderkey", "totalprice", "rn")).alias("h"),
        ]
        got_row = bwin.agg(*checksum).collect()[0]
        want_row = (
            q_window_topn_per_customer(spark, sf_dir).agg(*checksum).collect()[0]
        )
        assert tuple(got_row) == tuple(want_row)
        shuffles = _shuffles(bwin)
        assert not shuffles, (
            "custkey-bucketed window must be Exchange-free:\n" + shuffles
        )
        assert _shuffles(q_window_topn_per_customer(spark, sf_dir))
    finally:
        for t in ("bl_lineitem", "bl_orders_ok", "bl_orders_ck"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Runtime bloom-filter join pruning (the 100 TB semi-join story): when a
    selective dimension feeds a shuffle join, Catalyst should inject a
    bloom_filter_agg on the dim side and probe it in the fact scan — rows
    that cannot join die before the shuffle.  Thresholds are lowered to make
    the tiny testdata eligible; the plan shape, not the byte sizes, is the
    contract."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        l = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:3000]
        assert "might_contain" in plan, plan[:3000]
        # and the filtered join is still correct
        rows = {r["o_orderpriority"]: r["count"] for r in j.collect()}
        want = (
            l.join(o, l.l_orderkey == o.o_orderkey).count()
        )
        assert rows.get("1-URGENT") == want and len(rows) == 1
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_layout_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order clustering: after zorder_write on (o_custkey, o_totalprice),
    parquet footer min/max must be selective on BOTH columns — a narrow band
    on either dimension overlaps only a fraction of files.  A single-column
    sort layout is the control: perfect on its own key, useless on the other."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from databricks_feature_store_flight_school_spark.operators.layout import (
        zorder_write,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    zdir = str(tmp_path / "zorder")
    ldir = str(tmp_path / "linear")
    zorder_write(orders, zdir, "o_custkey", "o_totalprice", num_files=8)
    (
        orders.repartitionByRange(8, F.col("o_custkey"))
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    def file_ranges(d, col):
        out = []
        for f in sorted(Path(d).glob("*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            out.append((lo, hi))
        return out

    def overlapping(ranges, lo, hi):
        return sum(1 for a, b in ranges if not (b < lo or a > hi))

    # a ~12% band on each dimension
    ck = [r["o_custkey"] for r in orders.select("o_custkey").collect()]
    tp = [r["o_totalprice"] for r in orders.select("o_totalprice").collect()]
    ck.sort(); tp.sort()
    ck_band = (ck[len(ck) // 2], ck[len(ck) // 2 + len(ck) // 8])
    tp_band = (tp[len(tp) // 2], tp[len(tp) // 2 + len(tp) // 8])

    z_ck = overlapping(file_ranges(zdir, "o_custkey"), *ck_band)
    z_tp = overlapping(file_ranges(zdir, "o_totalprice"), *tp_band)
    l_ck = overlapping(file_ranges(ldir, "o_custkey"), *ck_band)
    l_tp = overlapping(file_ranges(ldir, "o_totalprice"), *tp_band)

    # control: linear layout is perfect on its key, blind on the other
    assert l_ck <= 2
    assert l_tp == 8
    # z-order: BOTH dimensions skip (strictly better than the blind axis)
    assert z_ck < 8 and z_tp < 8
    assert z_ck + z_tp < l_ck + l_tp + 8  # strictly better combined than control

    # and the data round-trips
    assert spark.read.parquet(zdir).count() == orders.count()


def test_auto_salt_factor_from_profile():
    """The derived factor: hot-key rows / even-partition share, clamped.
    A 90%-one-key histogram over 8 partitions wants ~8 splits; a uniform
    histogram wants none."""
    from databricks_feature_store_flight_school_spark.operators.skew import (
        auto_salt_factor,
    )

    skewed = {"n_rows": 1000, "max_rows": 900}
    assert auto_salt_factor(skewed, num_partitions=8) == 8
    assert auto_salt_factor(skewed, num_partitions=32, max_salt=16) == 16  # clamped
    uniform = {"n_rows": 1000, "max_rows": 10}
    assert auto_salt_factor(uniform, num_partitions=8) == 1
    assert auto_salt_factor({}, num_partitions=8) == 1  # empty input


def test_auto_salted_join_measures_and_matches(spark):
    """auto_salted_join on a crafted 90%-one-key left side: the measured
    profile picks a factor > 1, the result equals the plain join, and a
    near-uniform left side short-circuits to the unsalted plan (no __salt
    column anywhere in the physical plan)."""
    from databricks_feature_store_flight_school_spark.operators.skew import (
        auto_salted_join, key_skew_profile,
    )

    hot = [Row(k=1, v=i) for i in range(90)] + [
        Row(k=2 + i % 5, v=i) for i in range(10)
    ]
    left = spark.createDataFrame(hot)
    right = spark.createDataFrame([Row(k=j, d=f"dim{j}") for j in range(1, 8)])

    prof = key_skew_profile(left, "k")
    assert prof["max_rows"] == 90 and prof["n_rows"] == 100
    assert prof["skew_ratio"] > 5

    out = auto_salted_join(left, right, on="k", profile=prof)
    plain = left.join(right, on="k", how="inner")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))

    uniform = spark.createDataFrame(
        [Row(k=1 + i % 7, v=i) for i in range(70)]
    )
    unsalted = auto_salted_join(uniform, right, on="k")
    assert "__salt" not in unsalted._jdf.queryExecution().executedPlan().toString()
    assert unsalted.count() == 70
