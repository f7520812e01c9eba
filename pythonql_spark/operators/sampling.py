"""Deterministic corpus sampling for training-data pipelines.

Sampling must be reproducible across runs, engines, and cluster
layouts — ``rand()`` is none of those — so rows are kept by a
content-derived hash bucket: ``md5`` of the id expression, first 8 hex
digits as an integer, modulo 10_000.  The same formula is emitted in a
Spark and a DuckDB dialect, so sampled outputs are oracle-checkable
bit-for-bit.

Everything here is a narrow transformation (filter on a per-row
expression): no shuffle, fully pushdown-friendly, trivially correct at
any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(expr: str, dialect: str = "spark",
                buckets: int = BUCKETS) -> str:
    """Deterministic bucket in [0, buckets) from any expression —
    identical values in Spark SQL and DuckDB."""
    s = f"cast({expr} as string)" if dialect == "spark" else \
        f"cast({expr} as varchar)"
    if dialect == "spark":
        h = f"cast(conv(substring(md5({s}), 1, 8), 16, 10) as bigint)"
    else:
        h = f"cast(('0x' || substring(md5({s}), 1, 8)) as bigint)"
    return f"({h} % {buckets})"


def sample_fraction(df: DataFrame, fraction: float,
                    id_col: str = "doc_id") -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by id-hash bucket."""
    cut = int(round(fraction * BUCKETS))
    return df.filter(F.expr(f"{hash_bucket(id_col)} < {cut}"))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0,
                      id_col: str = "doc_id") -> DataFrame:
    """Per-stratum deterministic sampling: e.g. keep 100% of low-resource
    languages and 10% of the dominant one.  ``fractions`` maps stratum
    value -> keep fraction; anything absent gets ``default_fraction``."""
    cut = "CASE " + " ".join(
        f"WHEN {strata_col} = '{k}' THEN {int(round(v * BUCKETS))}"
        for k, v in sorted(fractions.items())
    ) + f" ELSE {int(round(default_fraction * BUCKETS))} END"
    return df.filter(F.expr(f"{hash_bucket(id_col)} < {cut}"))


def sample_oracle_where(fractions: dict[str, float] | float,
                        strata_col: str | None = None,
                        default_fraction: float = 0.0,
                        id_col: str = "doc_id") -> str:
    """The matching DuckDB WHERE predicate for the two samplers."""
    if isinstance(fractions, float):
        return f"{hash_bucket(id_col, 'duck')} < {int(round(fractions * BUCKETS))}"
    cut = "CASE " + " ".join(
        f"WHEN {strata_col} = '{k}' THEN {int(round(v * BUCKETS))}"
        for k, v in sorted(fractions.items())
    ) + f" ELSE {int(round(default_fraction * BUCKETS))} END"
    return f"{hash_bucket(id_col, 'duck')} < {cut}"
