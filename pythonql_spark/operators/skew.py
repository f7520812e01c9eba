"""Skew-aware join strategies for the 100 TB regime.

AQE's skew-join handling (spark.sql.adaptive.skewJoin) splits
oversized SORT-MERGE partitions at runtime and is on by default in
our sessions — reach for these helpers only when AQE can't help:

* salted_join — explicit key salting for shuffle joins where one side
  has pathological hot keys (a handful of keys holding a large share
  of rows).  The big side gets a random salt in [0, salt); the small
  side is replicated salt× via explode; the join key becomes
  (key, salt), spreading each hot key over ``salt`` reducers.
* hot_keys — find the keys worth salting (frequency above a
  threshold), so pipelines can salt selectively and leave the long
  tail on the normal path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, *, min_share: float = 0.01,
             max_keys: int = 1000) -> list:
    """Keys holding at least ``min_share`` of rows — the same one-job
    broadcast-total shape as :func:`skew_report` (no separate count
    scan), collected because salting decisions are driver-side."""
    rows = (skew_report(df, key, min_share=min_share)
            .orderBy(F.col("n").desc(),
                     F.col(key))           # deterministic tie order
            .limit(max_keys)
            .collect())
    return [r[key] for r in rows]


def salted_join(big: DataFrame, small: DataFrame, on: str, *,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join where ``big``'s ``on`` column is skewed: salt the big
    side with rand()*salt, replicate the small side salt×, join on
    (key, salt).  Shuffle volume for the small side grows salt×, so
    keep it for genuinely small-but-unbroadcastable sides; each hot
    key now lands on ``salt`` reducers instead of one.

    Output columns match a plain ``big.join(small, on, how)``.
    ``how`` is limited to inner/left: under right/full outer the
    small side's unmatched SALT REPLICAS would each surface as their
    own null-extended output row (salt× duplication) — semantics a
    salted join cannot express."""
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join supports how='inner'|'left' only (outer "
            "joins would emit one row per unmatched salt replica)")
    b = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    s = (small.withColumn(
            "__salt",
            F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))))
    out = b.join(s, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def skew_report(df: DataFrame, key: str, *,
                min_share: float = 0.01) -> DataFrame:
    """Skew diagnosis as a DataFrame: every key holding at least
    ``min_share`` of rows, with its count and share — the input to a
    salting / AQE-skew-join decision.  One partial-agg shuffle over
    the key + a 1-row total broadcast back; never a collect."""
    total = df.groupBy().agg(F.count(F.lit(1)).alias("__total"))
    return (df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
            .join(F.broadcast(total))
            .filter(F.col("n") >= F.greatest(
                F.lit(1).cast("bigint"),
                # ceil, not truncate: "at least min_share" must not
                # admit keys strictly below the share
                F.ceil(F.col("__total") * min_share)))
            .selectExpr(key, "n",
                        "cast(round(n / cast(__total as double), 6) "
                        "as double) as share"))
