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


def asof_join(left: DataFrame, right: DataFrame,
              on: str | list[str],
              left_ts: str = "ts", right_ts: str = "ts", *,
              suffix: str = "_r", how: str = "left",
              direction: str = "backward") -> DataFrame:
    """As-of join.  Result: every `left` row (how='left'; use
    how='inner' to drop unmatched), plus each `right` non-key column
    as `<name><suffix>` (including the matched right timestamp).
    ``on`` takes one key column name or a list (compound keys
    partition the same single sort-shuffle; no extra cost).

    ``direction``: 'backward' (most recent right_ts <= left_ts, the
    default), 'forward' (earliest right_ts >= left_ts — the same
    merged stream walked in descending order), or 'nearest' (whichever
    of the two is closer; ties take the backward match).  'nearest'
    runs both window passes — one Exchange, two local sorts."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward | forward | nearest")
    if how not in ("left", "inner"):
        raise ValueError("how must be left | inner")
    keys = [on] if isinstance(on, str) else list(on)
    r_payload = [c for c in right.columns if c not in keys]
    l_payload = [c for c in left.columns if c not in keys]
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"), F.lit(1).alias("__is_l"),
        F.struct(*[F.col(c) for c in l_payload]).alias("__lv"),
        F.lit(None).cast(
            right.select(F.struct(*r_payload).alias("s")).schema["s"].dataType
        ).alias("__rv"))
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"), F.lit(0).alias("__is_l"),
        F.lit(None).cast(
            left.select(F.struct(*l_payload).alias("s")).schema["s"].dataType
        ).alias("__lv"),
        F.struct(*r_payload).alias("__rv"))
    merged = l_tagged.unionByName(r_tagged)

    # right rows sort BEFORE left rows at the same timestamp (in both
    # walk directions), so a right row at exactly left_ts is visible
    def carry(descending: bool):
        order = [F.col("__ts").desc() if descending else F.col("__ts").asc(),
                 F.col("__is_l").asc()]
        w = (W.partitionBy(*keys).orderBy(*order)
              .rowsBetween(W.unboundedPreceding, W.currentRow))
        return F.last("__rv", ignorenulls=True).over(w)

    if direction == "backward":
        carried = merged.withColumn("__m", carry(False))
    elif direction == "forward":
        carried = merged.withColumn("__m", carry(True))
    else:  # nearest
        both = (merged.withColumn("__mb", carry(False))
                .withColumn("__mf", carry(True)))
        d_b = (F.col("__ts").cast("double")
               - F.col(f"__mb.{right_ts}").cast("double"))
        d_f = (F.col(f"__mf.{right_ts}").cast("double")
               - F.col("__ts").cast("double"))
        carried = (both.withColumn(
            "__m",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
             .when(F.col("__mf").isNull(), F.col("__mb"))
             .when(d_f < d_b, F.col("__mf"))
             .otherwise(F.col("__mb")))
            .drop("__mb", "__mf"))
    base = carried.filter("__is_l = 1")
    if how == "inner":
        base = base.filter(F.col("__m").isNotNull())
    return base.select(*[F.col(k) for k in keys], "__lv.*",
                       *[F.col(f"__m.{c}").alias(f"{c}{suffix}")
                         for c in r_payload])
