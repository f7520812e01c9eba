from pythonql_spark.operators.window_clause import fixed_windows, predicate_windows
from pythonql_spark.operators.match_clause import match_pattern
from pythonql_spark.operators.skew import hot_keys, salted_join
from pythonql_spark.operators.decontam import decontaminate

__all__ = ["fixed_windows", "predicate_windows", "match_pattern",
           "hot_keys", "salted_join", "decontaminate"]
