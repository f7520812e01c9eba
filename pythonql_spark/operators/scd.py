"""Slowly-changing-dimension type 2 (SCD2) maintenance.

Warehouse-shape dimension versioning: every attribute change appends a
new row with a validity interval instead of overwriting, so facts can
always join "the supplier as it was on the order date" (via the
engine's as-of join, operators/asof.py).

Reference parity: not in pythonql — the warehouse-maintenance
extension set next to merge_upsert (sources/catalog.py).

Scale shape
-----------
The dimension side NEVER shuffles: the update delta's first-change
timestamps aggregate to |changed keys| rows and broadcast onto the
dimension scan; version chaining is one window shuffle over the DELTA
only.  At 100 TB-dimension / small-delta (the normal case) this is a
scan + broadcast join, partition-overwrite friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(dim: DataFrame, updates: DataFrame,
               keys: list[str], ts_col: str = "ts") -> DataFrame:
    """Apply a batch of attribute updates to an SCD2 dimension.

    ``dim`` rows carry ``valid_from`` / ``valid_to`` timestamps
    (``valid_to IS NULL`` = current version).  ``updates`` carries the
    key columns, the new attribute values, and ``ts_col`` (effective
    time); (keys, ts) pairs must be unique within the batch.

    Result: per key, updates chain in ``ts_col`` order (each closes
    its predecessor); the pre-existing current row closes at the key's
    first update timestamp; history rows and untouched keys pass
    through unchanged; unseen keys insert as new current rows.
    """
    missing = [c for c in ("valid_from", "valid_to") if c in updates.columns]
    if missing:
        raise ValueError(f"updates must not carry {missing}; "
                         f"use {ts_col} as the effective time")
    kw = ", ".join(keys)
    upd = (updates
           .withColumn("valid_from", F.col(ts_col))
           .withColumn("valid_to", F.expr(
               f"lead({ts_col}) OVER (PARTITION BY {kw} "
               f"ORDER BY {ts_col})"))
           .drop(ts_col))
    firsts = updates.groupBy(*keys).agg(
        F.min(ts_col).alias("__first_ts"))
    closed = (dim.join(F.broadcast(firsts), keys, "left")
              .withColumn("valid_to", F.expr(
                  "CASE WHEN valid_to IS NULL AND __first_ts IS NOT NULL "
                  "THEN __first_ts ELSE valid_to END"))
              .drop("__first_ts"))
    return closed.unionByName(upd.select(*closed.columns))


def scd2_current(dim: DataFrame) -> DataFrame:
    """The current version of every key (valid_to IS NULL)."""
    return dim.filter("valid_to IS NULL")


def scd2_as_of(dim: DataFrame, ts) -> DataFrame:
    """Dimension snapshot as of ``ts``: the version whose validity
    interval covers it.  ``ts`` may be a 'YYYY-MM-DD[ HH:MM:SS]'
    string (becomes a timestamp literal), a ``datetime``, or a
    pyspark ``Column``."""
    from datetime import date, datetime
    if isinstance(ts, F.Column):
        t = ts
    elif isinstance(ts, (datetime, date)):
        t = F.lit(str(ts)).cast("timestamp")
    elif isinstance(ts, str):
        t = F.expr(f"timestamp'{ts}'")
    else:
        raise TypeError(
            f"ts must be a str, datetime/date or Column, got {type(ts)}")
    return dim.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t)))
