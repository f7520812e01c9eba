"""pythonql_spark — a PySpark-native engine with the query and
data-processing capabilities of pythonql/pythonql.

The reference (``/root/reference``) extends Python comprehensions into
query expressions (select / for / let / where / count / group by /
order by / windows / match) executed tuple-at-a-time. Here the same
clause surface compiles to a single Spark DataFrame plan so Catalyst
+ Tungsten pick the physical strategy and the plan scales to a real
cluster.

Public API:
    from pythonql_spark import Query, get_spark
    res = (Query(spark)
           .for_("l", lineitem)
           .where("l.l_shipdate <= date'1998-09-02'")
           .group_by("l.l_returnflag as rf")
           .select("rf", "sum(l.l_quantity) as sum_qty")
           .df())
"""

from pythonql_spark.session import get_spark
from pythonql_spark.query import Query
from pythonql_spark import helpers
from pythonql_spark import plans

__all__ = ["Query", "get_spark", "helpers", "plans"]
__version__ = "0.1.0"
