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
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v))
        return repr(round(v, 6))
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


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    con = _duck(sf_dir)
    oracle_pd = con.execute(oracle_sql).df()
    spark_pd = spark_df.toPandas()
    n1, c1, h1 = _fingerprint(spark_pd)
    n2, c2, h2 = _fingerprint(oracle_pd)
    return {
        "rows_spark": n1, "rows_oracle": n2,
        "cols_spark": c1, "cols_oracle": c2,
        "rows_match": n1 == n2, "cols_match": c1 == c2,
        "values_match": h1 == h2,
        "ok": n1 == n2 and c1 == c2 and h1 == h2,
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
                results[name]["rows_spark"] = fn(spark, sf_dir).count()
            except Exception as e:
                results[name] = {"ok": False, "error": repr(e)[:300]}
            continue
        try:
            results[name] = compare(fn(spark, sf_dir), oracles[name], sf_dir)
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
