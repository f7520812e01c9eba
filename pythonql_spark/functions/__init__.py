from pythonql_spark.functions.path import json_child, json_descendants
from pythonql_spark.functions.tryexcept import try_eval, try_number, try_or

__all__ = ["json_child", "json_descendants", "try_eval", "try_number", "try_or"]
