"""Port of reference tests/match_clause_test.py (exact_test) onto
match_pattern: nested patterns, binds, per-value conditions, exact
key-set matching."""

import json

import pytest

from pythonql_spark.operators import match_pattern
from pythonql_spark.operators.match_clause import Bind

PEOPLE = [
    {"first": "daniela", "last": "f", "age": 45, "zip_code": {"number": 123}},
    {"first": "daniela", "last": "k", "age": 50, "zip_code": {"number": 999}},
    {"first": "daniela", "last": "j", "age": 50, "extra_field": True,
     "zip_code": {"number": 999}},
    {"first": "john", "last": "wayne", "age": 50, "extra_field": True,
     "zip_code": {"number": 999}},
    {"first": "daniela", "last": "s", "age": 55,
     "zip_code": {"number": 999, "extra_field": True}},
]

PATTERN = {
    "last": Bind("x"),
    "first": "daniela",
    "age": Bind("y", where=lambda v: v > 40),
    "zip_code": {"number": Bind("w")},
}


@pytest.fixture(scope="module")
def people_df(spark):
    return spark.createDataFrame([(json.dumps(p),) for p in PEOPLE], "z string")


def test_exact(people_df):
    res = match_pattern(people_df, "z", PATTERN, exact=True)
    rows = sorted(res.collect(), key=lambda r: r["x"])
    # exact: rows 3 (extra_field) and 5 (extra key inside zip_code) drop
    assert len(rows) == 2
    assert json.loads(rows[0]["z"])["age"] == 45


def test_partial(people_df):
    res = match_pattern(people_df, "z", PATTERN)
    rows = sorted(res.collect(), key=lambda r: r["x"])
    assert len(rows) == 4
    assert json.loads(rows[3]["z"])["age"] == 55


def test_binds_and_parent(people_df):
    res = match_pattern(people_df, "z", PATTERN, bind_parent="p")
    row = sorted(res.collect(), key=lambda r: r["x"])[0]
    assert row["x"] == "f" and row["y"] == "45" and row["w"] == "123"
    assert json.loads(row["p"])["last"] == "f"


def test_const_mismatch(people_df):
    res = match_pattern(people_df, "z", {"first": "nobody"})
    assert res.count() == 0


def test_struct_fast_path(spark):
    df = spark.createDataFrame(
        [((p["first"], p["age"]),) for p in PEOPLE],
        "p struct<first:string, age:int>")
    res = match_pattern(df, "p", {"first": "daniela", "age": Bind("a")})
    assert res.count() == 4
    # fast path stays JVM-side: no mapInPandas in the plan
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
