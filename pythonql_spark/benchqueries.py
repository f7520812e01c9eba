"""Registry of benchmark/correctness queries.

Every entry is one capability row from SURVEY.md §2, expressed through
the engine's public API, with a DuckDB-runnable ANSI-SQL oracle that
must hash-match (same column names, same values).

Float determinism: double summation order differs between engines, so
every sum/avg over doubles accumulates in decimal(38,6) and casts the
final value back to double — bit-identical on both sides.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from pythonql_spark.query import Query
from pythonql_spark.sources import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle:
            ORACLE[name] = oracle
        return fn
    return deco


def dsum(e: str) -> str:
    """Order-independent exact sum of a double expression (valid in
    both Spark SQL and DuckDB)."""
    return f"cast(sum(cast({e} as decimal(38,6))) as double)"


def davg(e: str) -> str:
    return f"cast(avg(cast({e} as decimal(38,6))) as double)"


# ---------------------------------------------------------------- §2.1 core

@q("select_project", """
SELECT o_orderkey, o_orderpriority,
       cast(o_totalprice * 0.9 as double) AS discounted
FROM orders WHERE o_orderstatus = 'F'
""")
def select_project(spark, sf):
    return (Query(spark)
            .for_("o", load_table(spark, sf, "orders"))
            .where("o.o_orderstatus == 'F'")
            .select("o.o_orderkey", "o.o_orderpriority",
                    "cast(o.o_totalprice * 0.9 as double) as discounted")
            .df())


@q("filter_where", """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_quantity > 45 AND l_discount >= 0.05 AND l_returnflag <> 'A'
""")
def filter_where(spark, sf):
    return (Query(spark)
            .for_("l", load_table(spark, sf, "lineitem"))
            .where("l.l_quantity > 45 and l.l_discount >= 0.05 and l.l_returnflag != 'A'")
            .select("l.l_orderkey", "l.l_linenumber", "l.l_quantity")
            .df())


@q("let_compute", """
SELECT l_orderkey, l_linenumber,
       cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) as double) AS charge
FROM lineitem WHERE l_extendedprice * (1 - l_discount) * (1 + l_tax) > 90000
""")
def let_compute(spark, sf):
    return (Query(spark)
            .for_("l", load_table(spark, sf, "lineitem"))
            .let_("charge", "cast(l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax) as double)")
            .where("charge > 90000")
            .select("l.l_orderkey", "l.l_linenumber", "charge")
            .df())


@q("join_equi", f"""
SELECT c_mktsegment AS seg, count(*) AS n_orders,
       {dsum('o_totalprice')} AS total
FROM customer JOIN orders ON c_custkey = o_custkey
WHERE o_totalprice > 100000
GROUP BY c_mktsegment
""")
def join_equi(spark, sf):
    return (Query(spark)
            .for_("c", load_table(spark, sf, "customer"))
            .for_("o", load_table(spark, sf, "orders"))
            .where("c.c_custkey == o.o_custkey and o.o_totalprice > 100000")
            .group_by("c.c_mktsegment as seg")
            .select("seg", "count(o) as n_orders",
                    dsum("o.o_totalprice") + " as total")
            .df())


@q("join_multi", f"""
SELECT n_name AS nation, count(*) AS n_items,
       {dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""")
def join_multi(spark, sf):
    # TPC-H Q5 shape: big fact joins + two broadcast-able dims
    return (Query(spark)
            .for_("c", load_table(spark, sf, "customer"))
            .for_("o", load_table(spark, sf, "orders"))
            .for_("l", load_table(spark, sf, "lineitem"))
            .for_("n", load_table(spark, sf, "nation"), hint="broadcast")
            .for_("r", load_table(spark, sf, "region"), hint="broadcast")
            .where("c.c_custkey == o.o_custkey and l.l_orderkey == o.o_orderkey "
                   "and c.c_nationkey == n.n_nationkey and n.n_regionkey == r.r_regionkey "
                   "and r.r_name == 'ASIA'")
            .group_by("n.n_name as nation")
            .select("nation", "count(l) as n_items",
                    dsum("l.l_extendedprice * (1 - l.l_discount)") + " as revenue")
            .df())


@q("group_agg", f"""
SELECT l_returnflag AS rf, l_linestatus AS ls,
       {dsum('l_quantity')} AS sum_qty,
       {dsum('l_extendedprice')} AS sum_base_price,
       {dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {davg('l_quantity')} AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def group_agg(spark, sf):
    # TPC-H Q1 — the flagship: one scan, map-side partial aggregation
    return (Query(spark)
            .for_("l", load_table(spark, sf, "lineitem"))
            .where("l.l_shipdate <= timestamp'1998-09-02 00:00:00'")
            .group_by("l.l_returnflag as rf", "l.l_linestatus as ls")
            .select("rf", "ls",
                    dsum("l.l_quantity") + " as sum_qty",
                    dsum("l.l_extendedprice") + " as sum_base_price",
                    dsum("l.l_extendedprice * (1 - l.l_discount)") + " as sum_disc_price",
                    dsum("l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax)") + " as sum_charge",
                    davg("l.l_quantity") + " as avg_qty",
                    "count(l) as count_order")
            .df())


@q("group_lists", """
SELECT o_custkey AS cust, list_sort(list(o_orderkey)) AS orderkeys,
       count(*) AS n
FROM orders WHERE o_totalprice > 250000
GROUP BY o_custkey
""")
def group_lists(spark, sf):
    # reference implicit-list semantics: non-key var -> per-group list
    return (Query(spark)
            .for_("o", load_table(spark, sf, "orders"))
            .where("o.o_totalprice > 250000")
            .let_("ok", "o.o_orderkey")
            .group_by("o.o_custkey as cust")
            .select("cust", "sort_array(ok) as orderkeys",
                    "cast(len(ok) as bigint) as n")
            .df())


@q("order_multi", """
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_orderpriority ASC, o_totalprice DESC
LIMIT 100
""")
def order_multi(spark, sf):
    # LIMIT after ORDER BY → Spark TakeOrderedAndProject (no full sort
    # materialization at scale)
    return (Query(spark)
            .for_("o", load_table(spark, sf, "orders"))
            .where("o.o_orderstatus == 'O'")
            .order_by("o.o_orderpriority asc", "o.o_totalprice desc")
            .select("o.o_orderkey", "o.o_orderpriority", "o.o_totalprice")
            .limit(100)
            .df())


@q("count_clause", """
SELECT row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey) - 1 AS idx,
       s_name, s_acctbal
FROM supplier
""")
def count_clause(spark, sf):
    return (Query(spark)
            .for_("s", load_table(spark, sf, "supplier"))
            .count_("idx", order="s.s_acctbal desc, s.s_suppkey")
            .select("idx", "s.s_name", "s.s_acctbal")
            .df())


@q("distinct_set", """
SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
""")
def distinct_set(spark, sf):
    return (Query(spark)
            .for_("c", load_table(spark, sf, "customer"))
            .select("c.c_mktsegment", "c.c_nationkey")
            .distinct()
            .df())


@q("join_left_outer", f"""
SELECT c_custkey, count(o_orderkey) AS n_orders,
       {dsum('coalesce(o_totalprice, 0)')} AS total
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""")
def join_left_outer(spark, sf):
    return (Query(spark)
            .for_("c", load_table(spark, sf, "customer"))
            .left_join("o", load_table(spark, sf, "orders"),
                       on="c.c_custkey == o.o_custkey")
            .group_by("c.c_custkey as c_custkey")
            .select("c_custkey", "count(o.o_orderkey) as n_orders",
                    dsum("coalesce(o.o_totalprice, 0)") + " as total")
            .df())


@q("join_semi", """
SELECT p_partkey, p_name FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 49)
""")
def join_semi(spark, sf):
    # reference pattern: where [select .. for ..] != []
    return (Query(spark)
            .for_("p", load_table(spark, sf, "part"))
            .semi_join(load_table(spark, sf, "lineitem"),
                       on="__semi.l_partkey == p.p_partkey and __semi.l_quantity > 49")
            .select("p.p_partkey", "p.p_name")
            .df())


@q("join_anti", """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""")
def join_anti(spark, sf):
    return (Query(spark)
            .for_("c", load_table(spark, sf, "customer"))
            .anti_join(load_table(spark, sf, "orders"),
                       on="__anti.o_custkey == c.c_custkey")
            .select("c.c_custkey", "c.c_name")
            .df())


@q("lateral_explode", """
SELECT w AS word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
GROUP BY w ORDER BY n DESC, w LIMIT 20
""")
def lateral_explode(spark, sf):
    return (Query(spark)
            .for_("d", load_table(spark, sf, "documents"))
            .for_("w", "split(d.text, ' ')")
            .group_by("w as word")
            .select("word", "count(w) as n")
            .order_by("n desc", "word")
            .limit(20)
            .df())


@q("subquery_in", f"""
SELECT o_orderpriority, count(*) AS n
FROM orders
WHERE o_totalprice > (SELECT {davg('o_totalprice')} FROM orders)
GROUP BY o_orderpriority
""")
def subquery_in(spark, sf):
    orders = load_table(spark, sf, "orders")
    avg_df = (Query(spark).for_("o", orders)
              .group_by("1 as one")
              .select(davg("o.o_totalprice") + " as avg_price").df())
    return (Query(spark)
            .for_("o", orders)
            .for_("a", avg_df, hint="broadcast")
            .where("o.o_totalprice > a.avg_price")
            .group_by("o.o_orderpriority as o_orderpriority")
            .select("o_orderpriority", "count(o) as n")
            .df())


@q("tpch_q6", f"""
SELECT {dsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""")
def tpch_q6(spark, sf):
    return (Query(spark)
            .for_("l", load_table(spark, sf, "lineitem"))
            .where("l.l_shipdate >= timestamp'1997-01-01 00:00:00' "
                   "and l.l_shipdate < timestamp'1998-01-01 00:00:00' "
                   "and l.l_discount between 0.05 and 0.07 and l.l_quantity < 24")
            .group_by("1 as one")
            .select(dsum("l.l_extendedprice * l.l_discount") + " as revenue")
            .df())
