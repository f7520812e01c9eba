"""Pivot / unpivot — long↔wide reshaping for analytics output.

Beyond the reference surface (PythonQL reshapes via nested
comprehensions on the driver); here both directions stay distributed:

* `pivot_table` is a single hash aggregation — with an EXPLICIT
  `values` list the plan is one shuffle on the index keys and the
  pivoted columns are conditional aggregates (no extra job).  Omitting
  `values` makes Spark run a distinct-scan job first to discover them
  AND bakes an unbounded column count into the schema — at 100 TB
  always pass `values`.
* `unpivot` is a narrow `stack()` projection: no shuffle at all, rows
  multiply by len(cols) in place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_table(df: DataFrame, index: list[str] | str, pivot_col: str,
                value_expr: str, values: list[str] | None = None) -> DataFrame:
    """Wide table: one row per `index`, one column per pivot value,
    cells = `value_expr` aggregate (a full agg expression, e.g.
    ``"sum(x)"``) over the matching rows.  Cells with no rows are NULL.
    """
    index = [index] if isinstance(index, str) else list(index)
    gp = df.groupBy(*index).pivot(pivot_col, values)
    return gp.agg(F.expr(value_expr))


def unpivot(df: DataFrame, ids: list[str] | str, cols: list[str],
            var_name: str = "metric", value_name: str = "value") -> DataFrame:
    """Long table: (ids, var_name, value_name) with one row per input
    row per entry of `cols` (all cast to double).  Pure projection —
    `stack()` runs inside the scan stage."""
    ids = [ids] if isinstance(ids, str) else list(ids)
    pairs = ", ".join(f"'{c}', cast({c} as double)" for c in cols)
    stack = f"stack({len(cols)}, {pairs}) as ({var_name}, {value_name})"
    return df.selectExpr(*ids, stack)
