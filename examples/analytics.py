"""Analytics walkthrough: the reference's query surface, Spark-first.

Mirrors the kinds of queries in the reference's tutorial
(/root/reference examples & tutorial_tests.py) against the TPC-H-ish
testdata.  Run:  python examples/analytics.py [SF_DIR]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pythonql_spark import Query, get_spark
from pythonql_spark.pql import pql
from pythonql_spark.sources import load_sf


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("examples-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_sf(spark, sf_dir)

    # clause DSL: joins are lifted from where-equalities, dims broadcast
    top_nations = (Query(spark)
                   .for_("l", t["lineitem"])
                   .for_("o", t["orders"])
                   .for_("c", t["customer"])
                   .for_("n", t["nation"], hint="broadcast")
                   .where("l.l_orderkey == o.o_orderkey "
                          "and c.c_custkey == o.o_custkey "
                          "and c.c_nationkey == n.n_nationkey")
                   .group_by("n.n_name as nation")
                   .select("nation",
                           "round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) as revenue")
                   .order_by("revenue desc")
                   .limit(5))
    print("top nations by revenue:")
    top_nations.df().show()

    # the reference's own string syntax via the pql() front-end
    res = pql(spark, """
        select (priority, count(o) as n)
        for o in orders
        where o.o_totalprice > 150000
        group by o.o_orderpriority as priority
        order by priority
    """, env={"orders": t["orders"]})
    print("large orders by priority:")
    res.show()

    # behavioral analytics: click→purchase attribution as a binned
    # range join (equi on (user, 4h-bucket), never a nested loop)
    from pyspark.sql import functions as F

    from pythonql_spark.operators import range_join, top_k_per_group
    e = t["events"]
    purchases = e.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        (F.col("ts") - F.expr("INTERVAL 4 HOURS")).alias("w_start"),
        F.col("ts").alias("w_end"))
    clicks = e.filter("event_type = 'click'").select(
        "user_id", F.col("ts").alias("click_ts"))
    attributed = range_join(clicks, purchases, point="click_ts",
                            start="w_start", end="w_end",
                            on="user_id", bin_width=4 * 3600)
    print("clicks attributed to a purchase within 4h:", attributed.count())

    # top-3 purchases per user — WindowGroupLimit keeps the shuffle at
    # ~k rows per key
    top3 = top_k_per_group(
        e.filter("event_type = 'purchase'")
         .select("user_id", "event_id", "value"),
        "user_id", ["value desc", "event_id"], 3)
    top3.show(6)

    # cohort retention: first-seen day x day offset, distinct actives
    firsts = (Query(spark).for_("e", e)
              .group_by("e.user_id as user_id")
              .select("user_id", "min(date_trunc('day', e.ts)) as cohort_day"))
    retention = (Query(spark)
                 .for_("e", e)
                 .for_("f", firsts, hint="broadcast")
                 .where("f.user_id == e.user_id")
                 .group_by("f.cohort_day as cohort_day",
                           "cast(datediff(cast(e.ts as date), "
                           "cast(f.cohort_day as date)) as bigint) as day_offset")
                 .select("cohort_day", "day_offset",
                         "count(distinct e.user_id) as n_users")
                 .order_by("cohort_day", "day_offset")
                 .limit(8))
    print("cohort retention (first 8 cells):")
    retention.df().show()

    # reference path-step syntax (Grammar.md ./ and .//) inside query
    # strings — compiled to the registered pql_child/pql_desc UDFs
    paths = pql(spark, """
        select (e.event_id as event_id, k_val)
        for e in ev, k_val in e.props ./ 'k'
    """, env={"ev": t["events"].select("event_id", "props")})
    print("path-step rows:", paths.count())

    # the reference's window-clause string, DISTRIBUTED: TableSeq
    # binds the source per-user, nothing collects to the driver
    from pythonql_spark.pql import TableSeq
    win = pql(spark, """
        select (user_id, s, sum(w) as sum_w)
        for sliding window w in x
        start y at s when True
        end at e when e - s == 2
    """, env={"x": TableSeq(e.select("user_id", "ts", "value"),
                            order_by=["ts", "value"],
                            partition_by="user_id", value="value")})
    print("per-user sliding windows:", win.count())

    # entity resolution: supplier names within edit distance 1
    from pythonql_spark.operators.fuzzy import fuzzy_pairs
    fz = fuzzy_pairs(t["supplier"].select("s_suppkey", "s_name"),
                     "s_name", 1, id_col="s_suppkey")
    print("near-identical supplier names:", fz.count())

    # trade-graph PageRank + event co-occurrence + experiment z-test
    from pythonql_spark.operators.cooccur import cooccurrence_pmi
    from pythonql_spark.operators.graph import pagerank
    from pythonql_spark.operators.profile import conversion_ztest
    edges = (t["orders"].join(t["lineitem"],
                              t["orders"].o_orderkey
                              == t["lineitem"].l_orderkey)
             .selectExpr("o_custkey * 2 as src",
                         "l_suppkey * 2 + 1 as dst").distinct())
    pagerank(edges, iters=3).orderBy(F.desc("rank")).show(5)
    cooccurrence_pmi(e, "user_id", "event_type") \
        .orderBy(F.desc("pmi")).show(5)
    conversion_ztest(e, "event_type", "value > 150").show()


if __name__ == "__main__":
    main()
