"""The pql() string front-end runs the reference's own queries in
near-verbatim syntax (reference tests/tutorial_tests.py and
tests/match_clause_test.py)."""

import json
from collections import namedtuple

from pythonql_spark.pql import pql


def test_q1(spark):
    r = pql(spark, """
      select (x, y)
      for x in range(1,8), y in range(1,7)
      if x % 2 == 0 and y % 2 != 0 and x > y
      order by x, y
    """).collect()
    assert (r[0].x, r[0].y) == (2, 1)


def test_q2_group_agg(spark):
    r = pql(spark, """
      select (x, sum(y) as sum)
      for x in range(1,8), y in range(1,7)
      if x % 2 == 0 and y % 2 != 0 and x > y
      group by x
      order by x
    """).collect()
    assert (r[0].x, r[0].sum) == (2, 1.0)


def test_q3_having(spark):
    r = pql(spark, """
      select (x, sum_y)
      for x in range(1,8), y in range(1,7)
      where x % 2 == 0 and y % 2 != 0 and x > y
      group by x
      let sum_y = sum(y)
      where sum_y % 2 != 0
      order by x
    """).collect()
    assert (r[0].x, r[0].sum_y) == (2, 1.0)
    assert (r[1].x, r[1].sum_y) == (6, 9.0)


def test_q6_group_by_power(spark):
    r = pql(spark, """
      select (x_squared, y)
      for x in range(1,5), y in range(1,5)
      where x > y
      group by x ** 2 as x_squared
      order by x_squared
    """).collect()
    assert r[2].x_squared == 16.0 and sorted(r[2].y) == [1, 2, 3]


def test_q9_try_except(spark):
    data = [15, 25, None, 80, 34, "34", "twenty", "[12]", 54, 12]
    r = pql(spark, """
      select num
      for item in data
      let num = try int(item) except 0
    """, env={"data": [str(d) if d is not None else None for d in data]}).collect()
    assert sum(x.num for x in r) == 254


def test_q11_window(spark):
    r = pql(spark, """
      select (y, sum(w) as sum)
      for sliding window w in x
      start y at s when True
      end at e when e - s == 2
      order by s
    """, env={"x": [1, 2, 3, 4, 5, 6, 7]}).collect()
    assert [(t.y, t.sum) for t in r][:3] == [(1, 6.0), (2, 9.0), (3, 12.0)]


def test_q12_window_predicates(spark):
    r = pql(spark, """
      select (y, sum(w) as sum)
      for sliding window w in x
      start y when y % 2 == 0
      end z when z - y > 2
      order by y
    """, env={"x": [1, 2, 3, 4, 5, 6, 7]}).collect()
    assert [(t.y, t.sum) for t in r] == [(2, 14.0), (4, 22.0), (6, 13.0)]


def test_q13_tuple_window_only_end(spark):
    P = namedtuple("P", ["y", "z"])
    r = pql(spark, """
      select (s, x)
      for sliding window x in pairs
      start s when s.y % 2 == 1
      only end e when e.y - s.y >= 2
      order by s
    """, env={"pairs": [P(i, i) for i in range(1, 7)]}).collect()
    assert r[0].s.y == 1 and r[0].s.z == 1
    assert r[1].s.y == 3 and r[1].s.z == 3


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

MATCH_BODY = """
  { "last" : as x,
    "first" : "daniela",
    "age" : as y where y > 40,
    "zip_code" : { "number" : as w }
  } as z in people
  order by x
"""


def test_match_exact(spark):
    r = pql(spark, "select z match exact" + MATCH_BODY,
            env={"people": PEOPLE}).collect()
    assert len(r) == 2
    assert json.loads(r[0].z)["age"] == 45


def test_match_partial(spark):
    r = pql(spark, "select z match" + MATCH_BODY,
            env={"people": PEOPLE}).collect()
    assert len(r) == 4
    assert json.loads(r[3].z)["age"] == 55


def test_cli_runner(spark, tmp_path, capsys):
    # parity with the reference's RunPYQL.py command-line entry
    from pythonql_spark.run import main
    qf = tmp_path / "q.pql"
    qf.write_text(
        "select (pri, count(o) as n) for o in orders "
        "group by o.o_orderpriority as pri order by pri")
    main([str(qf), "--sf-dir", "/root/testdata/sf0.001", "-n", "10"])
    out = capsys.readouterr().out
    assert "1-URGENT" in out
    assert "----Time: compile=" in out


def test_try_except_preserves_prefix_type_and_parens(spark):
    from pythonql_spark.pql import pql
    rows = pql(spark, """
        select (x, 1 + (try int(x) except 0) as plus,
                try str(x) except 'n/a' as s)
        for x in xs
    """, env={"xs": [1, 2]}).orderBy("x").collect()
    # prefix '1 + ' survives; int stays integral; str stays a string
    assert [(r.x, r.plus, r.s) for r in rows] == [(1, 2, "1"), (2, 3, "2")]


def test_empty_sequence_yields_zero_rows(spark):
    from pythonql_spark.pql import pql
    assert pql(spark, "select x for x in xs",
               env={"xs": []}).count() == 0


def test_if_function_call_not_a_clause(spark):
    from pythonql_spark.pql import pql
    rows = pql(spark, """
        select (x, if(x > 1, x, 0) as big)
        for x in xs
        if x != 99
    """, env={"xs": [1, 2, 99]}).orderBy("x").collect()
    assert [(r.x, r.big) for r in rows] == [(1, 0), (2, 2)]


def test_window_dataframe_source_requires_pos(spark, tables):
    import pytest as _pytest
    from pythonql_spark.pql import pql
    with _pytest.raises(ValueError, match="__pos"):
        pql(spark, """
            select s
            for sliding window w in ev
            start y at s when True
            end at e when e - s == 1
        """, env={"ev": tables["events"].select("value")})


def test_match_as_binds_parent_on_dataframe(spark):
    from pythonql_spark.pql import pql
    df = spark.createDataFrame(
        [('{"k": 7, "x": 1}',), ('{"j": 2}',)], "z string")
    rows = pql(spark, """
        select (k, w)
        match {"k": as k} as w in src
    """, env={"src": df}).collect()
    assert len(rows) == 1
    assert rows[0].k == "7" and '"k"' in rows[0].w


# ------------------------------------------------------------ path steps

def test_rewrite_path_steps_shapes():
    from pythonql_spark.pql import _rewrite_path_steps as rw
    assert rw("db ./ 'region' ./ 'region'") == \
        "pql_child_seq(pql_child(db, 'region'), 'region')"
    assert rw("db .// 'box'") == "pql_desc(db, 'box')"
    assert rw("e.props ./ 'k'") == "pql_child(e.props, 'k')"
    assert rw("db ./ _") == "pql_child(db, '_')"
    assert rw("db .// _") == "pql_desc(db, '_')"
    # float literal, untouched; identifier ending in a digit is a step
    assert rw("1./2 + x") == "1./2 + x"
    assert rw("x1 ./ 'k'") == "pql_child(x1, 'k')"
    # step nested in a call argument
    assert rw("f(a ./ 'k') + 1") == "f(pql_child(a, 'k')) + 1"


def test_q8_path_steps_verbatim(spark):
    """Reference tutorial q8 (tests/tutorial_tests.py:77-85) verbatim
    through the pql() string front-end — bare path expressions."""
    from pythonql_spark.pql import pql
    db = [{"region": [{"box": [1, 2], "label": "lake"},
                      {"box": {"box": [2, 3]}},
                      {"region": {"box": [1, 2], "label": "lake"}},
                      {"region": {"circle": [0.5, 0.5, 45],
                                  "label": "pond"}}]},
          {"region": {"box": [1, 2], "label": "lake"}}]
    assert len(list(pql(spark, "db./'region'./'region'",
                        env={"db": db}).collect())) == 2
    assert len(list(pql(spark, "db .// 'box'",
                        env={"db": db}).collect())) == 5


def test_path_step_inside_query_clauses(spark):
    from pythonql_spark.pql import pql
    ev = spark.createDataFrame(
        [(1, '{"k": 7, "x": 1}'), (2, '{"y": 2}'), (3, '{"k": 9}')],
        "event_id long, props string")
    rows = pql(spark, """
        select (e.event_id as event_id, k_val)
        for e in ev, k_val in e.props ./ 'k'
    """, env={"ev": ev}).orderBy("event_id").collect()
    assert [(r.event_id, r.k_val) for r in rows] == [(1, "7"), (3, "9")]


def test_path_descendants_in_where(spark):
    from pythonql_spark.pql import pql
    src = spark.createDataFrame(
        [('{"a": {"box": 1}}',), ('{"b": 2}',)], "j string")
    rows = pql(spark, """
        select (x.j as j)
        for x in src
        where size(x.j .// 'box') > 0
    """, env={"src": src}).collect()
    assert len(rows) == 1 and '"box"' in rows[0].j


def test_window_tableseq_distributed_matches_local(spark):
    """TableSeq (distributed per-key window clause) == the local
    Python-sequence path run per key."""
    from pythonql_spark.pql import TableSeq, pql
    rows = [(u, i, float(v)) for u, vals in
            [(1, [5, 1, 7, 2]), (2, [3, 9])]
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id int, pos int, value double")
    qry = """
      select (s, sum(w) as sum_w)
      for sliding window w in x
      start y at s when True
      end at e when e - s == 1
    """
    got = pql(spark, "select (user_id, s, sum(w) as sum_w) " + qry[qry.index("for"):],
              env={"x": TableSeq(df, order_by="pos",
                                 partition_by="user_id")})
    got_rows = {(r.user_id, r.s): r.sum_w for r in got.collect()}
    for u, vals in [(1, [5.0, 1.0, 7.0, 2.0]), (2, [3.0, 9.0])]:
        loc = pql(spark, qry, env={"x": vals})
        for r in loc.collect():
            assert got_rows[(u, r.s)] == r.sum_w
    assert len(got_rows) == 6


def test_tableseq_ambiguous_value_column(spark):
    import pytest as _pytest
    from pythonql_spark.pql import TableSeq
    df = spark.createDataFrame([(1, 2, 3.0, 4.0)],
                               "k int, pos int, a double, b double")
    with _pytest.raises(ValueError, match="ambiguous"):
        TableSeq(df, order_by="pos", partition_by="k")


# --------------------------------------------------- source codec

def test_pythonql_codec_runs_inline_queries(spark, tmp_path):
    """A ``# coding: pythonql`` module with reference-style INLINE
    query expressions imports and runs (reference codec/register.py
    behavior): tutorial q1/q3-shaped queries execute with value
    parity; plain list comprehensions in the same file are untouched."""
    import importlib
    import sys

    import pythonql_spark.codec  # noqa: F401  (registers the codec)

    mod = tmp_path / "pqlmod_r7.py"
    mod.write_text(
        "# coding: pythonql\n"
        "res1 = [ select (x, y)\n"
        "         for x in range(1, 8)\n"
        "         for y in range(1, 7)\n"
        "         if x % 2 == 0 and\n"
        "            y % 2 != 0 and\n"
        "            x > y ]\n"
        "res3 = [ select (x, sum_y)\n"
        "         for x in xs, y in ys\n"
        "         where x % 2 == 0 and y % 2 != 0 and x > y\n"
        "         group by x\n"
        "         let sum_y = sum(y)\n"
        "         where sum_y % 2 != 0\n"
        "         order by x ]\n"
        "plain = [x * 2 for x in range(3)]\n"
        "selective = ['select me', 'not a query']\n",
        encoding="utf-8")
    # module-scope sources for the second query
    pre = "xs = range(1, 8)\nys = range(1, 7)\n"
    mod.write_text("# coding: pythonql\n" + pre
                   + mod.read_text().split("\n", 1)[1], encoding="utf-8")
    sys.path.insert(0, str(tmp_path))
    try:
        m = importlib.import_module("pqlmod_r7")
    finally:
        sys.path.remove(str(tmp_path))
    # reference tutorial q1 asserts (iteration order == canonical
    # order for ascending sources)
    assert m.res1[0].x == 2 and m.res1[0].y == 1
    assert [(r.x, r.y) for r in m.res1] == \
        [(2, 1), (4, 1), (4, 3), (6, 1), (6, 3), (6, 5)]
    # q3 asserts
    assert m.res3[0].x == 2 and m.res3[0].sum_y == 1
    assert m.res3[1].x == 6 and m.res3[1].sum_y == 9
    # non-query brackets untouched
    assert m.plain == [0, 2, 4]
    assert m.selective == ["select me", "not a query"]


def test_codec_single_column_unwraps(spark, tmp_path):
    import importlib
    import sys

    import pythonql_spark.codec  # noqa: F401

    mod = tmp_path / "pqlmod_r7b.py"
    mod.write_text(
        "# coding: pythonql\n"
        "data = [15, 25, 80, 34]\n"
        "total = sum([ select v for v in data ])\n",
        encoding="utf-8")
    sys.path.insert(0, str(tmp_path))
    try:
        m = importlib.import_module("pqlmod_r7b")
    finally:
        sys.path.remove(str(tmp_path))
    assert m.total == 154


def test_count_based_window_string_compiles_to_jvm_frames(spark, tables):
    """`start … when True / end at e when e - s == K` through the
    string front-end must take the native fixed_windows path: no
    Python evaluation anywhere in the plan, and value parity with the
    predicate path on a shape the fast path does NOT match."""
    from pythonql_spark.plans import plan_report
    from pythonql_spark.pql import TableSeq, pql
    ev = tables["events"].select("user_id", "ts", "value")
    seq = TableSeq(ev, order_by=["ts", "value"],
                   partition_by="user_id", value="value")
    fast = pql(spark, """
        select (user_id, s, sum(w) as sum_w)
        for sliding window w in x
        start y at s when True
        end at e when e - s == 2
    """, env={"x": seq})
    r = plan_report(fast)
    assert r["python_arrow_evals"] == 0 and r["python_row_evals"] == 0, r
    # same semantics through the predicate path (condition shape the
    # fast-path matcher must NOT claim: reversed operands)
    slow = pql(spark, """
        select (user_id, s, sum(w) as sum_w)
        for sliding window w in x
        start y at s when True
        end at e when (e - s) * 1 == 2
    """, env={"x": seq})
    assert plan_report(slow)["python_arrow_evals"] > 0
    a = sorted((row.user_id, row.s, row.sum_w) for row in fast.collect())
    b = sorted((row.user_id, row.s, row.sum_w) for row in slow.collect())
    assert a == b
