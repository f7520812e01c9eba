"""Scale-path operators: salted skew joins and bucketed co-located
joins.  Correctness is checked against the plain-join result; the
bucketing test additionally asserts the shuffle Exchange is GONE from
the physical plan — the property that matters at 100 TB."""

import pytest
from pyspark.sql import functions as F

from pythonql_spark.operators.skew import hot_keys, salted_join
from pythonql_spark.sources import (load_table, write_bucketed,
                                    write_compacted, write_range_sorted)


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


def test_write_compacted_collapses_small_files(spark, tmp_path):
    import os
    # 64 partitions of a small table would write 64 tiny files;
    # compaction must collapse them to a handful
    df = spark.range(0, 100_000).repartition(64).withColumn(
        "v", F.col("id") * 2)
    path = str(tmp_path / "compacted")
    n = write_compacted(df, path, target_file_mb=64)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == n
    assert n <= 4                      # ~1.6 MB of data, never 64 files
    back = spark.read.parquet(path)
    assert back.count() == 100_000
    assert back.agg(F.sum("v")).first()[0] == 2 * sum(range(100_000))


def test_write_range_sorted_skips_files(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_ts")
    write_range_sorted(ev, path, ["ts"], n_partitions=8)
    back = spark.read.parquet(path)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 16          # narrow range at the low end
    narrow = back.filter(F.col("ts") <= F.lit(cut))
    # correctness: same rows as filtering the original
    assert narrow.count() == ev.filter(F.col("ts") <= F.lit(cut)).count()
    # data skipping: the scan's parquet footer stats prune most files —
    # observable as fewer bytes/rows actually read than a full scan.
    # Spark exposes it via the scan's metrics after execution.
    narrow.collect()
    scan_node = [n for n in narrow._jdf.queryExecution().executedPlan()
                 .toString().split("\n") if "Scan parquet" in n]
    assert scan_node, "expected a parquet scan in the plan"
    # ranges are non-overlapping, so at most ~1/8th of files match + 1
    boundary_files = {r.f for r in
                      narrow.select(F.input_file_name().alias("f")).collect()}
    all_files = {r.f for r in
                 back.select(F.input_file_name().alias("f")).collect()}
    assert len(boundary_files) <= max(2, len(all_files) // 4)


def test_minhash_index_probe(spark, tmp_path):
    import shutil

    from pythonql_spark.operators.dedup import (build_minhash_index,
                                                minhash_lsh_pairs_bipartite,
                                                probe_minhash_index)
    spark.sql("DROP TABLE IF EXISTS mh_index")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/mh_index", ignore_errors=True)

    corpus = spark.createDataFrame(
        [(i, f"shared prefix words here document number {i}", "a")
         for i in range(50)],
        "doc_id long, text string, source string")
    new = spark.createDataFrame(
        [(100, "shared prefix words here document number 7", "a"),   # dup of 7
         (101, "entirely different content with no match at all", "a")],
        "doc_id long, text string, source string")

    build_minhash_index(corpus, "mh_index", ngram=1)
    probed = probe_minhash_index(new, "mh_index", corpus, ngram=1,
                                 jaccard_threshold=0.5)
    direct = minhash_lsh_pairs_bipartite(new, corpus, ngram=1,
                                         jaccard_threshold=0.5)
    assert sorted(map(tuple, probed.collect())) == \
        sorted(map(tuple, direct.collect()))
    assert any(r.id_a == 100 and r.id_b == 7 for r in probed.collect())

    # the persisted index must be READ bucketed: no exchange between
    # the index scan and the probe join (defeat broadcast to see it)
    nb_pairs = probe_minhash_index(
        new, "mh_index", corpus, ngram=1, jaccard_threshold=None)
    from pythonql_spark.benchqueries import QUERIES  # noqa: F401  (plan util)
    plan = nb_pairs._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "Bucketed: true" in plan, plan[:1200]


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
