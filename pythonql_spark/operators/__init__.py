from pythonql_spark.operators.window_clause import fixed_windows, predicate_windows
from pythonql_spark.operators.match_clause import match_pattern
from pythonql_spark.operators.skew import hot_keys, salted_join
from pythonql_spark.operators.decontam import decontaminate
from pythonql_spark.operators.rangejoin import band_join, range_join
from pythonql_spark.operators.topk import top_k_per_group
from pythonql_spark.operators.pivot import pivot_table, unpivot
from pythonql_spark.operators.fuzzy import fuzzy_pairs
from pythonql_spark.operators.graph import pagerank
from pythonql_spark.operators.cooccur import cooccurrence_pmi

__all__ = ["fixed_windows", "predicate_windows", "match_pattern",
           "hot_keys", "salted_join", "decontaminate",
           "band_join", "range_join", "top_k_per_group",
           "pivot_table", "unpivot", "fuzzy_pairs", "pagerank",
           "cooccurrence_pmi"]
