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


if __name__ == "__main__":
    main()
