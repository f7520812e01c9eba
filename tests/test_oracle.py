"""The driver's correctness gate, run in-repo: every ``queries()``
entry vs its ``oracle_sql()`` at sf0.001 (row count + sorted-column
order-insensitive value hash via DuckDB)."""

import pytest

import __spark_entry__ as entry
from pythonql_spark.oracle_check import compare

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query(name, spark, sf_dir):
    fn = QUERIES[name]
    if name not in ORACLES:
        # rows-only gate for non-SQL-expressible ops
        assert fn(spark, sf_dir).count() >= 0
        return
    res = compare(fn(spark, sf_dir), ORACLES[name], sf_dir)
    assert res["ok"], res


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0


def test_survey_keys_exist():
    """Every queries() key cited in SURVEY.md section 2 exists in the
    registry, and every registry entry is cited somewhere in SURVEY —
    the coverage table and the code can't drift apart."""
    import re
    from pythonql_spark.benchqueries import QUERIES
    text = open("SURVEY.md").read()
    sec2 = text.split("\n## §2")[1].split("\n## §3")[0]
    cited = set(re.findall(r"`([a-z0-9_]+)`", sec2)) & set(QUERIES)
    missing_in_survey = set(QUERIES) - cited
    assert not missing_in_survey, missing_in_survey


def test_norm_cell_keeps_int_float_distinct():
    """Driver-strictness regression guard: a DuckDB HUGEINT sum that
    lands as float64 must NOT hash-match a Spark bigint (this bug
    class shipped in r1 `pack_sequences` and r3 `doc_pipeline`/
    `training_pipeline`)."""
    from pythonql_spark.oracle_check import _norm_cell
    assert _norm_cell(153156) != _norm_cell(153156.0)
    # but ULP-level float noise is absorbed at 6 dp, like the driver
    assert _norm_cell(0.30000000000000004) == _norm_cell(0.3)


def test_harmonize_dtypes_flags_hugeint_not_null_widening():
    import pandas as pd
    from pythonql_spark.oracle_check import _harmonize_dtypes
    # HUGEINT leak: float64 with no NaN vs int64 -> flagged
    s = pd.DataFrame({"x": pd.Series([1, 2], dtype="int64")})
    o = pd.DataFrame({"x": pd.Series([1.0, 2.0], dtype="float64")})
    assert _harmonize_dtypes(s, o) == ["x"]
    # null widening: float64 WITH NaN vs int64 -> harmonized, not flagged
    s = pd.DataFrame({"x": pd.Series([1, 2], dtype="int64")})
    o = pd.DataFrame({"x": pd.Series([1.0, None], dtype="float64")})
    assert _harmonize_dtypes(s, o) == []
    assert s["x"].dtype.kind == "f" and o["x"].dtype.kind == "f"
