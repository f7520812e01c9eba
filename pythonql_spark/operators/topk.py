"""Top-k rows per group — the `order by … limit k` -inside-a-group
shape (reference expresses it as a nested subquery per group key:
Executor.py materializes each group's list and slices it — per-group
materialization that cannot scale).

Spark-first shape: rank with a `row_number` window over (keys, order)
and filter rank <= k.  That is ONE hash shuffle on the group keys
with an external per-partition sort — but crucially Catalyst inserts
a WindowGroupLimit (partial top-k) BEFORE the shuffle when the window
function is row_number/rank with a `<= k` filter, so each map task
ships at most k rows per key it has seen, not its whole input.  The
plan to look for: `WindowGroupLimit` under the Exchange
(tests/test_plans.py asserts it).  At 100 TB this is the difference
between shuffling the corpus and shuffling ~k x |keys| rows.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _order_cols(order_by: list[str] | str):
    specs = [order_by] if isinstance(order_by, str) else list(order_by)
    cols = []
    for spec in specs:
        m = re.match(r"(.*?)\s+(asc|desc)\s*$", spec, flags=re.IGNORECASE)
        e, d = (m.group(1), m.group(2).lower()) if m else (spec, "asc")
        c = F.expr(e)
        cols.append(c.desc() if d == "desc" else c.asc())
    return cols


def top_k_per_group(df: DataFrame, keys: list[str] | str,
                    order_by: list[str] | str, k: int, *,
                    rank_col: str | None = "rank",
                    ties: bool = False,
                    dense: bool | None = None) -> DataFrame:
    """Keep the first `k` rows of each group under `order_by`.

    `order_by` specs are `"expr [asc|desc]"` strings; include a
    unique tiebreaker column for a deterministic result.  With
    `ties=True` tied rows share a rank (SQL `rank()` semantics — may
    return more than k rows per group, and ranks have gaps; this is
    NOT dense_rank); default is strict `row_number`.  ``dense`` is
    the deprecated old name for the same flag (it never meant
    dense_rank).  `rank_col=None` drops the rank from the output.
    """
    if k <= 0:
        raise ValueError("k must be >= 1")
    if dense is not None:
        ties = dense
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = W.partitionBy(*[F.col(c) for c in keys]).orderBy(*_order_cols(order_by))
    fn = F.rank() if ties else F.row_number()
    name = rank_col or "__rank"
    out = df.withColumn(name, fn.over(w)).filter(F.col(name) <= k)
    return out if rank_col else out.drop(name)
