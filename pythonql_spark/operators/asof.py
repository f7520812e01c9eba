"""As-of (point-in-time) join — the time-series primitive Spark lacks
as a built-in: each left row is matched to the single most recent
right row with right_ts <= left_ts (direction='backward') within the
same key.

Spark-first shape: no per-key Python, no range-condition theta join.
Both sides are tagged and UNIONed, then ONE shuffle on (key, ts)
orders the merged stream and a running `last(right_payload,
ignorenulls=True)` window carries the latest right row forward onto
every subsequent left row.  Cost is a single sort-shuffle of
|left| + |right| rows — the same envelope as a windowed aggregation —
vs. the O(|left| x |right|-per-key) range join Catalyst would plan
for `l.ts >= r.ts`.

At equal timestamps the right row is visible to the left row
(>= semantics, matching DuckDB's ASOF JOIN, which serves as the
oracle); right rows must be unique per (key, ts) for a deterministic
match — pre-aggregate the right side otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts", *,
              suffix: str = "_r", how: str = "left") -> DataFrame:
    """Backward as-of join.  Result: every `left` row (how='left'; use
    how='inner' to drop unmatched), plus each `right` non-key column
    as `<name><suffix>` (including the matched right timestamp)."""
    r_payload = [c for c in right.columns if c != on]
    l_tagged = left.select(
        F.col(on), F.col(left_ts).alias("__ts"), F.lit(1).alias("__is_l"),
        F.struct(*[F.col(c) for c in left.columns if c != on]).alias("__lv"),
        F.lit(None).cast(
            right.select(F.struct(*r_payload).alias("s")).schema["s"].dataType
        ).alias("__rv"))
    r_tagged = right.select(
        F.col(on), F.col(right_ts).alias("__ts"), F.lit(0).alias("__is_l"),
        F.lit(None).cast(
            left.select(F.struct(*[c for c in left.columns if c != on])
                        .alias("s")).schema["s"].dataType).alias("__lv"),
        F.struct(*r_payload).alias("__rv"))
    merged = l_tagged.unionByName(r_tagged)
    # right rows sort BEFORE left rows at the same timestamp, so a
    # right row at exactly left_ts is visible (>= semantics)
    w = (W.partitionBy(on).orderBy("__ts", "__is_l")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    carried = merged.withColumn(
        "__m", F.last("__rv", ignorenulls=True).over(w))
    base = carried.filter("__is_l = 1")
    if how == "inner":
        base = base.filter(F.col("__m").isNotNull())
    return base.select(F.col(on), "__lv.*",
                       *[F.col(f"__m.{c}").alias(f"{c}{suffix}")
                         for c in r_payload])
