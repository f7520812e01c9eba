"""Scale-path operators: salted skew joins and bucketed co-located
joins.  Correctness is checked against the plain-join result; the
bucketing test additionally asserts the shuffle Exchange is GONE from
the physical plan — the property that matters at 100 TB."""

import pytest
from pyspark.sql import functions as F

from pythonql_spark.operators.skew import hot_keys, salted_join
from pythonql_spark.sources import load_table, write_bucketed


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey")
    plain = orders.join(customer, "o_custkey").select(
        "o_orderkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey", salt=8).select(
        "o_orderkey", "c_name")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame(
        [(1, "a")] * 50 + [(2, "b"), (99, "zz")], "k int, v string")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    out = salted_join(big, small, "k", salt=4, how="left")
    assert out.count() == 52
    assert out.filter(F.col("k") == 99).first()["w"] is None


def test_hot_keys(spark):
    df = spark.createDataFrame(
        [(1,)] * 80 + [(2,)] * 15 + [(i,) for i in range(3, 8)], "k int")
    assert hot_keys(df, "k", min_share=0.10) == [1, 2]


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    # a previous session's in-memory catalog forgets the table but the
    # managed location survives — clear it or saveAsTable refuses
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_customer"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, "b_orders", ["o_custkey"], n_buckets=8)
    write_bucketed(customer.withColumnRenamed("c_custkey", "o_custkey"),
                   "b_customer", ["o_custkey"], n_buckets=8)
    a = spark.table("b_orders")
    b = spark.table("b_customer")
    # defeat broadcast so the co-location is what saves the shuffle
    joined = (a.hint("merge").join(b.hint("merge"), "o_custkey")
              .groupBy("c_mktsegment")
              .agg(F.count(F.lit(1)).alias("n")))
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # keep AQE's final plan only
    smj = plan.find("SortMergeJoin")
    assert smj != -1
    # no shuffle below the join: bucketed scans feed it directly
    assert "Exchange hashpartitioning" not in plan[smj:], plan[:800]
    assert joined.count() > 0
