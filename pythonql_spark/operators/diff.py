"""Dataset snapshot diff — added / removed / changed rows.

Training corpora are versioned: each refresh needs an exact account
of what changed (how many docs were added, dropped by a new filter,
or edited by a new cleaner) both for audit and for incremental
downstream work (re-embed only the changed docs, re-shard only the
touched shards).  ``snapshot_diff`` computes that account with ONE
full outer join on the key:

* rows only in ``new``   → ``added``
* rows only in ``old``   → ``removed``
* rows in both with different content → ``changed``
* identical rows are dropped (the overwhelming majority — the diff
  output is proportional to the CHANGE, not the corpus)

Content equality is a per-row xxhash64 over the canonical rendering
of the compared columns (NULL → a sentinel), computed scan-side on
each snapshot BEFORE the join, so the shuffle carries (key, 8-byte
hash) — never the document bodies.  At 100 TB both sides shuffle
once on the key (or zero times if both snapshots are bucketed by the
key — catalog.write_bucketed); there is no window, no driver data.

The same hash formula is emitted in a DuckDB dialect for the value
oracle (DuckDB has no xxhash64, so the oracle compares the rendered
strings directly — same verdicts by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _render(cols: list[str], dialect: str = "spark") -> str:
    """Canonical row rendering shared by both engines: col=value
    pairs joined with ``|``, NULL → ``∅``."""
    cast = "string" if dialect == "spark" else "varchar"
    parts = [f"coalesce(cast({c} as {cast}), '∅')" for c in cols]
    if dialect == "spark":
        return "concat_ws('|', " + ", ".join(parts) + ")"
    return " || '|' || ".join(parts)


def snapshot_diff(old: DataFrame, new: DataFrame, *,
                  key_col: str = "doc_id",
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Returns (key, change) with ``change`` ∈ added/removed/changed;
    unchanged rows produce no output."""
    cols = compare_cols or [c for c in new.columns if c != key_col]
    digest = F.xxhash64(F.expr(_render(cols)))
    o = old.select(F.col(key_col).alias("__k"), digest.alias("__oh"))
    n = new.select(F.col(key_col).alias("__k"), digest.alias("__nh"))
    joined = o.join(n, "__k", "full_outer")
    return (joined
            .withColumn("change", F.when(F.col("__oh").isNull(), "added")
                        .when(F.col("__nh").isNull(), "removed")
                        .when(F.col("__oh") != F.col("__nh"), "changed"))
            .filter(F.col("change").isNotNull())
            .select(F.col("__k").alias(key_col), "change"))


def snapshot_diff_oracle_sql(old_sql: str, new_sql: str, *,
                             key_col: str = "doc_id",
                             compare_cols: list[str]) -> str:
    """DuckDB replay: identical join/verdict logic; content equality
    compares the canonical renderings directly (same semantics as
    hash equality minus the astronomically-unlikely collision)."""
    r = _render(compare_cols, dialect="duck")
    return f"""
WITH o AS (SELECT {key_col} AS k, {r} AS v FROM ({old_sql})),
     n AS (SELECT {key_col} AS k, {r} AS v FROM ({new_sql}))
SELECT coalesce(o.k, n.k) AS {key_col},
       CASE WHEN o.k IS NULL THEN 'added'
            WHEN n.k IS NULL THEN 'removed'
            WHEN o.v <> n.v THEN 'changed' END AS change
FROM o FULL OUTER JOIN n ON o.k = n.k
WHERE (o.k IS NULL OR n.k IS NULL OR o.v <> n.v)"""
