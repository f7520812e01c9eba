"""Driver contract for the spark-graft builder (PySpark target).

entry()    — flagship query (TPC-H Q1 shape through the Query DSL).
queries()  — one entry per implemented capability from SURVEY.md §2.
oracle_sql() — DuckDB-runnable ANSI SQL per query (same column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pythonql_spark.benchqueries import QUERIES
    return QUERIES["group_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pythonql_spark.benchqueries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pythonql_spark.benchqueries import ORACLE
    return dict(ORACLE)
