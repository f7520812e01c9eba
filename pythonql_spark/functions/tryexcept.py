"""Try-except *expressions* (reference Grammar.md try_except_expr;
Executor.py:106-112 PQTry): evaluate an expression, fall back to a
default on failure — the data-cleaning idiom
``let price = try float(o.price) except 0``.

Spark-first fast paths stay JVM-side (ANSI ``try_*`` builtins /
``try_cast``); ``try_eval`` is the general Arrow-batched escape hatch
for arbitrary Python.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _col(c: str | Column) -> Column:
    return F.expr(c) if isinstance(c, str) else c


def try_number(e: str | Column, default: float | None = None) -> Column:
    """``try float(x) except default`` — JVM-side via try_cast."""
    out = _col(e).try_cast("double")
    return out if default is None else F.coalesce(out, F.lit(float(default)))


def try_or(e: str, default) -> Column:
    """Evaluate a Spark SQL expression under ANSI semantics, falling
    back to ``default`` on runtime error (JVM-side, no Python).

    Wraps the expression in Spark's ``try()``-style builtins where
    possible; for arbitrary expressions uses ``try_cast`` of the
    stringified result, so errors inside ``e`` must be expressible as
    NULL-producing (``try_divide``, ``try_cast``, ...).  For anything
    else use ``try_eval``.
    """
    return F.coalesce(F.expr(f"try_cast(({e}) as string)").try_cast("string"),
                      F.lit(default).cast("string"))


def try_eval(c: str | Column, fn: Callable[[Any], Any], default,
             dtype: str = "double") -> Column:
    """General path: apply ``fn`` per value, ``default`` on exception.
    Arrow-batched pandas UDF (vectorized transfer, per-value call)."""
    spark_t = T._parse_datatype_string(dtype)

    @F.pandas_udf(spark_t)
    def udf(s: pd.Series) -> pd.Series:
        def safe(v):
            try:
                return fn(v)
            except Exception:
                return default
        return s.map(safe)

    return udf(_col(c))
