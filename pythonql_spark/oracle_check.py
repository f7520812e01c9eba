"""Local replica of the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet, compare row count + order-insensitive values.

Used by tests/test_oracle.py and ad-hoc from the CLI:
    python -m pythonql_spark.oracle_check [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    from pythonql_spark.sources.catalog import TABLES
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm_cell(v):
    """Canonical cell repr — STRICT, modelled on the driver's comparison:
    floats round to 6 dp (the driver demonstrably absorbs ULP-level
    sum-order differences: `group_agg` was driver-green in r3) but are
    NEVER int-normalized, so a DuckDB HUGEINT/DECIMAL sum leaking
    through as float64 ('153156.0') MISMATCHES a Spark bigint
    ('153156') here exactly as it does in the driver (this bug class
    shipped in r1 `pack_sequences` and r3 `doc_pipeline`/
    `training_pipeline` while the old forgiving normalizer hid it)."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float) or type(v).__name__.startswith("float"):
        return repr(round(float(v), 6))
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat().replace(" ", "T")[:26]
    if isinstance(v, (int,)) or type(v).__name__.startswith(("int", "uint")):
        return repr(int(v))
    return repr(v)


def _fingerprint(df: pd.DataFrame) -> tuple[int, list[str], int]:
    cols = sorted(df.columns)
    rows = sorted(
        "|".join(_norm_cell(r[c]) for c in cols)
        for _, r in df.iterrows()
    )
    return len(df), cols, hash(tuple(rows))


def _harmonize_dtypes(spark_pd: pd.DataFrame, oracle_pd: pd.DataFrame):
    """Distinguish the two ways an int column can surface as float64:

    * null widening — pandas has no nullable int64, so EITHER side's
      integer column with NULLs arrives as float64-with-NaN.  Harmless:
      cast both sides to float64 so reprs agree.
    * HUGEINT/DECIMAL leakage — DuckDB's integer sum() returns HUGEINT,
      which lands as float64 with NO NaN while Spark is bigint.  That is
      an oracle-SQL bug (missing ``cast(... as bigint)``) and must FAIL.

    Returns the list of columns with the second (bug) shape.
    """
    bad = []
    for c in set(spark_pd.columns) & set(oracle_pd.columns):
        k1, k2 = spark_pd[c].dtype.kind, oracle_pd[c].dtype.kind
        if {k1, k2} == {"i", "f"} or ({k1, k2} == {"u", "f"}):
            fside = spark_pd if k1 == "f" else oracle_pd
            if fside[c].isna().any():
                spark_pd[c] = spark_pd[c].astype("float64")
                oracle_pd[c] = oracle_pd[c].astype("float64")
            else:
                bad.append(c)
    return bad


def check_driver_sortable(spark_df) -> list[str]:
    """Columns the driver's canonicalizer cannot sort: its pandas
    lexsort dies on list/dict cells (`unhashable type: 'list'` — the
    r4 `media_decode` driver-ERR).  Every queries() entry — oracled OR
    rows-only — must surface arrays/maps/structs as scalars (digest,
    array_join, aggregate stats).  Returns offending column names."""
    from pyspark.sql import types as T
    return [f.name for f in spark_df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))]


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    con = _duck(sf_dir)
    oracle_pd = con.execute(oracle_sql).df()
    spark_pd = spark_df.toPandas()
    dtype_bad = _harmonize_dtypes(spark_pd, oracle_pd)
    n1, c1, h1 = _fingerprint(spark_pd)
    n2, c2, h2 = _fingerprint(oracle_pd)
    return {
        "rows_spark": n1, "rows_oracle": n2,
        "cols_spark": c1, "cols_oracle": c2,
        "rows_match": n1 == n2, "cols_match": c1 == c2,
        "values_match": h1 == h2,
        "dtype_mismatch": dtype_bad,
        "ok": n1 == n2 and c1 == c2 and h1 == h2 and not dtype_bad,
    }


def run_all(sf_dir: str = "/root/testdata/sf0.001", names=None, spark=None):
    import __spark_entry__ as entry
    from pythonql_spark import get_spark
    spark = spark or get_spark("oracle_check")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entry.queries(), entry.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        if name not in oracles:
            results[name] = {"ok": None, "note": "rows-only (no oracle)"}
            try:
                df = fn(spark, sf_dir)
                bad = check_driver_sortable(df)
                if bad:
                    results[name] = {
                        "ok": False,
                        "error": f"driver-unsortable output columns {bad}: "
                                 "surface arrays/maps as scalar digests"}
                    continue
                results[name]["rows_spark"] = df.count()
            except Exception as e:
                results[name] = {"ok": False, "error": repr(e)[:300]}
            continue
        try:
            df = fn(spark, sf_dir)
            bad = check_driver_sortable(df)
            if bad:
                results[name] = {
                    "ok": False,
                    "error": f"driver-unsortable output columns {bad}: "
                             "surface arrays/maps as scalar digests"}
                continue
            results[name] = compare(df, oracles[name], sf_dir)
        except Exception as e:
            results[name] = {"ok": False, "error": repr(e)[:300]}
    return results


if __name__ == "__main__":
    import sys
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    res = run_all(sf, names)
    bad = 0
    for name, r in sorted(res.items()):
        status = "OK " if r.get("ok") else ("--- " if r.get("ok") is None else "FAIL")
        bad += r.get("ok") is False
        extra = ""
        if r.get("ok") is False:
            extra = " " + str({k: v for k, v in r.items() if k != "ok"})[:400]
        print(f"{status} {name}{extra}")
    sys.exit(1 if bad else 0)
