"""Predicate/fixed window clause tests (reference Executor.py:568-638).

The key property: fixed_windows (native JVM window frames) must agree
ROW-FOR-ROW with predicate_windows (the general applyInPandas path)
whenever the predicates express a fixed count — they are two physical
strategies for one operator."""

import pytest
from pyspark.sql import functions as F

from pythonql_spark.operators import fixed_windows, predicate_windows


@pytest.fixture(scope="module")
def seq(spark):
    rows = [("u1", i, float(v)) for i, v in enumerate([10, 20, 30, 40, 50])] + \
           [("u2", i, float(v)) for i, v in enumerate([7, 8, 9])]
    return spark.createDataFrame(rows, "user_id string, pos int, value double")


def _normalize(df):
    return sorted(
        (r.user_id, r.s_at, r.e_at, r.closed,
         tuple((w.pos, w.value) for w in r.window))
        for r in df.collect())


@pytest.mark.parametrize("size,tumbling,only_full", [
    (3, False, True), (3, False, False),
    (2, True, True), (2, True, False),
])
def test_fixed_matches_predicate_path(seq, size, tumbling, only_full):
    fast = fixed_windows(seq, order_by="pos", size=size,
                         partition_by="user_id", tumbling=tumbling,
                         only_full=only_full)
    slow = predicate_windows(
        seq, order_by="pos",
        start_when=lambda c, a, p, n: True,
        end_when=lambda c, a, p, n, sc, sa: a - sa == size - 1,
        partition_by="user_id", tumbling=tumbling, only_end=only_full)
    assert _normalize(fast) == _normalize(slow)


def test_predicate_windows_value_conditions(seq):
    # open on value >= 20, close when value >= 40 — data-dependent,
    # only the general path expresses this
    w = predicate_windows(
        seq, order_by="pos",
        start_when=lambda c, a, p, n: c["value"] >= 20,
        end_when=lambda c, a, p, n, sc, sa: c["value"] >= 40,
        partition_by="user_id", only_end=True)
    rows = _normalize(w)
    # u1: windows open at 20,30,40,50; the first three close at 40,
    # the 50-window opens and closes on the same element
    assert [(r[1], r[2]) for r in rows if r[0] == "u1"] == \
        [(1, 3), (2, 3), (3, 3), (4, 4)]
    assert all(r[0] == "u1" for r in rows)  # u2 never reaches 20


def test_only_end_drops_unclosed(seq):
    closed_only = predicate_windows(
        seq, order_by="pos",
        start_when=lambda c, a, p, n: True,
        end_when=lambda c, a, p, n, sc, sa: a - sa == 2,
        partition_by="user_id", only_end=True)
    with_open = predicate_windows(
        seq, order_by="pos",
        start_when=lambda c, a, p, n: True,
        end_when=lambda c, a, p, n, sc, sa: a - sa == 2,
        partition_by="user_id", only_end=False)
    n_closed = closed_only.count()
    both = with_open.count()
    assert both > n_closed
    assert with_open.filter(~F.col("closed")).count() == both - n_closed


def test_global_sequence_no_partition(spark):
    df = spark.createDataFrame([(i, i * 10) for i in range(6)], "pos int, v int")
    w = fixed_windows(df, order_by="pos", size=2)
    rows = _normalize_global(w)
    assert rows[0] == (0, 1, True, ((0, 0), (1, 10)))


def _normalize_global(df):
    return sorted(
        (r.s_at, r.e_at, r.closed, tuple((w.pos, w.v) for w in r.window))
        for r in df.collect())


def test_null_partition_keys_group_together(spark):
    # NaN != NaN after Arrow conversion must NOT splinter null-keyed
    # rows into singleton groups: all null-keyed rows form one
    # sequence, matching groupBy semantics.
    rows = [(None, 0, 1.0), (None, 1, 2.0), (None, 2, 3.0),
            ("u1", 0, 4.0), ("u1", 1, 5.0)]
    df = spark.createDataFrame(rows, "user_id string, pos int, value double")
    w = predicate_windows(
        df, order_by="pos",
        start_when=lambda c, a, p, n: a == 0,
        end_when=lambda c, a, p, n, sc, sa: n is None,
        partition_by="user_id", only_end=True)
    got = sorted(((r.user_id, r.s_at, r.e_at, len(r.window))
                  for r in w.collect()),
                 key=lambda t: (t[0] is not None, t))
    # one window per key spanning the whole sequence — 3 rows for the
    # null key (splintering would yield three 1-row windows instead)
    assert got == [(None, 0, 2, 3), ("u1", 0, 1, 2)]


def test_dsl_size_window_uses_native_path(spark, tables):
    from pythonql_spark.query import Query
    q = (Query(spark).for_("e", tables["events"])
         .window_("w", order_by=["e.ts", "e.event_id"], size=3,
                  partition_by="e.user_id", only_end=True)
         .select("user_id", "s_at", "size(w) as n"))
    df = q.df()
    # no Python evaluation node in the plan
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "FlatMapGroupsInPandas" not in plan
    assert df.count() > 0
    assert df.filter(F.col("n") != 3).count() == 0
