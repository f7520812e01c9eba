from pythonql_spark.operators.window_clause import predicate_windows
from pythonql_spark.operators.match_clause import match_pattern

__all__ = ["predicate_windows", "match_pattern"]
