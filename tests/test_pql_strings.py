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
    parity.  Like the reference preprocessor, a plain comprehension
    is ALSO a query (select-less shorthand) — `plain` runs through
    the engine and yields the same list; non-comprehension brackets
    (`selective`) stay untouched."""
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


# ----------------------------------------- nested query expressions
# Reference Grammar.md places query_expression under expr, so any
# clause expression can contain a bracketed query.  Array/range-backed
# nested queries compile to Spark higher-order functions (no shuffle);
# DataFrame-backed ones compile to semi/anti/left joins.

def test_q4_verbatim_nested_let_outer_join(spark):
    """Reference tutorial q4 (tests/tutorial_tests.py:35-44) VERBATIM:
    nested select-less query in a let + the ys_and_none outer-join
    idiom + a Python ternary."""
    res = pql(spark, """ (x,y)
           for x in range(1,10)
           let ys = [  y for y in range(1,10)
                      where x%2 == 0 and x > y ],
               ys_and_none = ys if ys != [] else [ None ]

           for y in ys_and_none """).collect()
    assert res[3].x == 4 and res[3].y == 1
    assert res[6].x == 5 and res[6].y is None


def test_q5_verbatim_group_implicit_list(spark):
    res = sorted(pql(spark, """
        select (x,y)
        for x in range(1,5),
            y in range(1,5)
        where x > y
        group by x
    """).collect(), key=lambda r: r.x)
    assert res[2].x == 4 and sorted(res[2].y) == [1, 2, 3]


def test_q7_verbatim_order_by_expr(spark):
    res = pql(spark, """
        select (x,y)
        for x in range(1,5),
            y in range(1,5)
        where x > y
        order by abs(x-y) asc, y desc
    """).collect()
    assert (res[0].x, res[0].y) == (4, 3)
    assert (res[1].x, res[1].y) == (3, 2)


def test_q10_verbatim_nested_projection(spark):
    """Reference tutorial q10 (tests/tutorial_tests.py:95-101)
    VERBATIM: dict-ctor projection containing a correlated nested
    query -> transform(sequence(...)) with zero shuffle."""
    res = pql(spark, """
        select {"sequence_start": i,
                "sequence": [ select {"item":k}
                              for k in range(i,i+5) ]}
        for i in [1,3,5]
    """).collect()
    assert res[1]["sequence_start"] == 3 and len(res[1]["sequence"]) == 5
    assert [s["item"] for s in res[1]["sequence"]] == [3, 4, 5, 6, 7]


def test_nested_query_over_array_column(spark):
    """cust_journey idiom (reference tests/cust_journey_scenario_
    tests.py:21-38): nested queries filter an array-of-structs column;
    [q][0], [q][-1] subscripts and [q] != [] all work."""
    df = spark.createDataFrame(
        [(1, [{"ev": "open", "amt": 0.0}, {"ev": "dep", "amt": 5.0},
              {"ev": "dep", "amt": 7.0}]),
         (2, [{"ev": "open", "amt": 0.0}])],
        "id long, cj array<struct<ev string, amt double>>")
    rows = pql(spark, """
        select (c.id as id, first_dep, last_dep)
        for c in journeys
        let deps = [ select e.amt for e in c.cj where e.ev == 'dep' ]
        where deps != []
        let first_dep = deps[0], last_dep = deps[-1]
    """, env={"journeys": df}).collect()
    assert len(rows) == 1
    assert (rows[0].id, rows[0].first_dep, rows[0].last_dep) == (1, 5.0, 7.0)


def test_membership_semi_anti_string_form(spark, tables):
    """`E in [select ...]` / `E not in [...]` over an env DataFrame
    lower to LeftSemi/LeftAnti joins; parity vs the DataFrame API."""
    cust, orders = tables["customer"], tables["orders"]
    env = {"customer": cust, "orders": orders}
    semi = pql(spark, """
        select (c.c_custkey as ck)
        for c in customer
        where c.c_custkey in [ select o.o_custkey for o in orders
                               where o.o_orderstatus == 'F' ]
    """, env=env)
    assert "LeftSemi" in semi._jdf.queryExecution().optimizedPlan().toString()
    anti_n = pql(spark, """
        select (c.c_custkey as ck)
        for c in customer
        where c.c_custkey not in [ select o.o_custkey for o in orders
                                   where o.o_orderstatus == 'F' ]
    """, env=env).count()
    import pyspark.sql.functions as F
    keys = orders.filter("o_orderstatus = 'F'").select("o_custkey").distinct()
    exp = cust.join(keys, cust.c_custkey == keys.o_custkey, "left_semi").count()
    assert semi.count() == exp
    assert anti_n == cust.count() - exp


def test_exists_not_exists_string_form(spark, tables):
    """`[select ... where corr] != []` -> EXISTS semi join (the
    reference's canonical membership idiom, cust_journey l.29)."""
    cust, orders = tables["customer"], tables["orders"]
    env = {"customer": cust, "orders": orders}
    n_ex = pql(spark, """
        select (c.c_custkey as ck)
        for c in customer
        where [ select o for o in orders
                where o.o_custkey == c.c_custkey
                  and o.o_totalprice > 250000 ] != []
    """, env=env).count()
    n_nex = pql(spark, """
        select (c.c_custkey as ck)
        for c in customer
        where [ select o for o in orders
                where o.o_custkey == c.c_custkey
                  and o.o_totalprice > 250000 ] == []
    """, env=env).count()
    big = orders.filter("o_totalprice > 250000").select("o_custkey").distinct()
    exp = cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").count()
    assert n_ex == exp and n_nex == cust.count() - exp
    assert 0 < n_ex < cust.count()  # the threshold discriminates


def test_outer_subquery_string_form(spark, tables):
    """`for o in outer([select o for o in orders where corr])` ->
    LeftOuterJoin (reference Rewriter.py:441-491 good_outerjoin);
    value parity vs the DataFrame left join."""
    cust, orders = tables["customer"], tables["orders"]
    r = pql(spark, """
        select (c.c_custkey as ck, o.o_orderkey as ok)
        for c in customer
        for o in outer([ select o for o in orders
                         where o.o_custkey == c.c_custkey
                           and o.o_totalprice > 250000 ])
    """, env={"customer": cust, "orders": orders})
    big = orders.filter("o_totalprice > 250000")
    exp = cust.join(big, cust.c_custkey == big.o_custkey, "left")
    assert r.count() == exp.count()
    assert (r.filter("ok is null").count()
            == exp.filter("o_orderkey is null").count() > 0)


def test_ternary_and_list_literal_translation(spark):
    rows = pql(spark, """
        select (x, x if x > 2 else 0 as capped,
                'hi' if x == 1 else 'lo' as tag)
        for x in xs
        order by x
    """, env={"xs": [1, 2, 3]}).collect()
    assert [(r.x, r.capped, r.tag) for r in rows] == [
        (1, 0, "hi"), (2, 0, "lo"), (3, 3, "lo")]


def test_membership_over_literal_list(spark):
    rows = pql(spark, """
        select x
        for x in xs
        where x in [1, 3]
        order by x
    """, env={"xs": [1, 2, 3, 4]}).collect()
    assert [r.x for r in rows] == [1, 3]


def test_codec_select_less_shorthand_and_nested(spark, tmp_path):
    """Reference parser/Preprocessor.py rewrites ANY inline query:
    the select-less `[ (x, sum(y) as sum) for ... ]` shorthand
    (tutorial q2 verbatim) and a q4-shaped file whose let contains a
    NESTED query — the outer span rewrites, the inner bracket passes
    through verbatim for pql() to compile (splicing inner spans
    separately would corrupt offsets)."""
    import importlib
    import sys

    import pythonql_spark.codec  # noqa: F401

    mod = tmp_path / "pqlmod_r8.py"
    mod.write_text(
        "# coding: pythonql\n"
        "res2 = [ (x, sum(y) as sum)\n"
        "         for x in range(1,8),\n"
        "             y in range(1,7)\n"
        "         if x % 2 == 0 and y % 2 != 0 and x > y\n"
        "         group by x ]\n"
        "res4 = [ (x,y)\n"
        "         for x in range(1,10)\n"
        "         let ys = [  y for y in range(1,10)\n"
        "                    where x%2 == 0 and x > y ],\n"
        "             ys_and_none = ys if ys != [] else [ None ]\n"
        "         for y in ys_and_none ]\n",
        encoding="utf-8")
    sys.path.insert(0, str(tmp_path))
    try:
        m = importlib.import_module("pqlmod_r8")
    finally:
        sys.path.remove(str(tmp_path))
    # reference tutorial q2 assert
    assert m.res2[0].x == 2 and m.res2[0].sum == 1
    # reference tutorial q4 asserts (canonical order == iteration
    # order here: x ascending, y ascending within x)
    assert m.res4[3].x == 4 and m.res4[3].y == 1
    assert m.res4[6].x == 5 and m.res4[6].y is None


def test_codec_body_with_both_quote_kinds(spark, tmp_path):
    """repr()-based span splicing survives bodies containing single
    AND double quotes (the raw-triple-quote scheme could not)."""
    import importlib
    import sys

    import pythonql_spark.codec  # noqa: F401

    mod = tmp_path / "pqlmod_r8b.py"
    mod.write_text(
        '# coding: pythonql\n'
        'tags = [ select (x, "d\'q" if x == 1 else \'s"q\' as tag)\n'
        '         for x in range(1, 3)\n'
        '         order by x ]\n',
        encoding="utf-8")
    sys.path.insert(0, str(tmp_path))
    try:
        m = importlib.import_module("pqlmod_r8b")
    finally:
        sys.path.remove(str(tmp_path))
    assert [(r.x, r.tag) for r in m.tags] == [(1, "d'q"), (2, 's"q')]


def test_codec_runs_reference_match_file_verbatim(spark):
    """The reference's OWN tests/match_clause_test.py (a `# coding:
    pythonql` file: exact + partial match queries over nested dicts,
    with its original asserts incl. dict subscripting on results)
    runs UNMODIFIED under our codec — loaded from /root/reference at
    runtime, nothing copied.  Exercises the match-clause span
    detector (no `for` clause — `select z match {…} as z in people`)
    and the match-bind JSON→dict result materialization."""
    import os

    import pytest as _pytest

    from pythonql_spark.codec import transform_source

    ref = "/root/reference/tests/match_clause_test.py"
    if not os.path.exists(ref):
        _pytest.skip("reference checkout not present")
    with open(ref, encoding="utf-8") as f:
        src = f.read()
    g = {"__name__": "ref_match_verbatim"}
    exec(compile(transform_source(src), ref, "exec"), g)
    ran = 0
    for name, fn in sorted(g.items()):
        if name.endswith("_test") and callable(fn):
            fn()                       # the reference's own asserts
            ran += 1
    assert ran >= 1


def test_codec_runs_reference_tutorial_file_verbatim(spark):
    """The reference's OWN tests/tutorial_tests.py — its complete
    acceptance suite, q1–q13 with original asserts — runs UNMODIFIED
    under our codec (loaded from /root/reference at runtime, nothing
    copied).  Covers comprehension and select-less spans, nested
    queries (q4/q10), bare path steps outside brackets (q8,
    `db./'region'`), heterogeneous driver-local sequences + try-except
    (q9), window clauses (q11/q12), and a parenthesized subquery as a
    window source (q13)."""
    import os

    import pytest as _pytest

    from pythonql_spark.codec import transform_source

    ref = "/root/reference/tests/tutorial_tests.py"
    if not os.path.exists(ref):
        _pytest.skip("reference checkout not present")
    with open(ref, encoding="utf-8") as f:
        src = f.read()
    g = {"__name__": "ref_tutorial_verbatim"}
    exec(compile(transform_source(src), ref, "exec"), g)
    ran = 0
    for name, fn in sorted(g.items()):
        if name.endswith("_test") and callable(fn):
            fn()                       # the reference's own asserts
            ran += 1
    assert ran == 13


# ------------------------------------------------- r9 codec robustness
# ADVICE r8 (high): the whole-file path-step pass must mask comments
# and never merge statements across newlines; unparseable `./` text
# outside query spans is a no-op, not an error.

import pytest


@pytest.mark.parametrize("src", [
    "# ./relative/path\nx = 1\n",           # path-looking comment
    "# cd ./\ny = 2\n",                      # comment ends in `./`
    "#!/usr/bin/env python\n# see ./docs\nz = 3\n",
    "a = 1\n# x ./ y inline note\nb = a\n",
])
def test_codec_comments_with_path_text_are_untouched(src):
    from pythonql_spark.codec import transform_source
    assert transform_source(src) == src


def test_codec_comment_never_swallows_next_statement():
    """`# cd ./` + `y = 2` on the next line: r8 deleted the
    assignment from the emitted source (key scan crossed the
    newline); now the file is byte-identical."""
    from pythonql_spark.codec import transform_source
    src = "# cd ./\ny = 2\nprint(y)\n"
    out = transform_source(src)
    assert out == src
    g = {}
    exec(compile(out, "<t>", "exec"), g)
    assert g["y"] == 2


def test_codec_real_step_next_to_comment():
    from pythonql_spark.codec import transform_source
    src = "z = db ./ 'region'  # docs at .//here\n"
    out = transform_source(src)
    assert "__pql_child__(db, 'region')" in out
    assert "# docs at .//here" in out


def test_codec_non_step_slash_dot_is_noop():
    """`1 ./ 2` (float-dot) and other non-step text must not raise
    in the lenient whole-file pass."""
    from pythonql_spark.codec import transform_source
    src = "w = 1 ./ 2\n"
    assert transform_source(src) == src


def test_has_match_clause_is_depth_and_call_aware():
    """ADVICE r8 (low): `re.match(...)` / a call named match / a
    bracketed `match` at depth>0 are NOT match clauses; a real
    top-level match clause is."""
    from pythonql_spark.codec import _has_match_clause
    assert _has_match_clause(
        'select z match {"name": as z} in people')
    assert not _has_match_clause("select re.match(p, d) for d in db")
    assert not _has_match_clause("select match(p, d) for d in db")
    assert not _has_match_clause(
        "select f([m for m in match_list]) for d in db")


def test_codec_json_looking_strings_stay_strings(spark, tmp_path):
    """Single-column string results that LOOK like JSON must come back
    as STRINGS when the query has no top-level match clause (the r8
    decoder grepped \\bmatch\\b over the text and json.loads'd them;
    the decision is now _has_match_clause, unit-tested above for the
    re.match / match(...) false-positive cases)."""
    import importlib
    import sys

    import pythonql_spark.codec  # noqa: F401

    mod = tmp_path / "pqlmod_r9_jsonstr.py"
    mod.write_text(
        "# coding: pythonql\n"
        "data = ['{\"a\": 1}', '[2]', 'plain']\n"
        "res = [ select v for v in data if v != '' ]\n",
        encoding="utf-8")
    sys.path.insert(0, str(tmp_path))
    try:
        m = importlib.import_module("pqlmod_r9_jsonstr")
    finally:
        sys.path.remove(str(tmp_path))
    assert sorted(m.res) == ['[2]', 'plain', '{"a": 1}']
    assert all(isinstance(v, str) for v in m.res)


def test_mixed_numeric_sequence_binds_as_double(spark):
    """ADVICE r8 (medium): [1, 2.5, 3] and [True, 1] are NUMBERS in
    the reference — widen to double, never stringify."""
    r = pql(spark, "select v for v in data order by v",
            env={"data": [1, 2.5, 3]}).collect()
    assert [x.v for x in r] == [1.0, 2.5, 3.0]
    assert all(isinstance(x.v, float) for x in r)
    r2 = pql(spark, "select v for v in data order by v",
             env={"data": [True, 1, 2]}).collect()
    assert [x.v for x in r2] == [1.0, 1.0, 2.0]
    # truly heterogeneous still binds as strings (tutorial q9 path)
    r3 = pql(spark, "select v for v in data",
             env={"data": [15, "x", None]}).collect()
    assert {x.v for x in r3} == {"15", "x", None}


# ---------------------------------------- r9 codec quote-edge sweep
# (r8 punch list #8: permanent adversarial cases so the next codec
# change can't silently regress the repr()-splicing scheme)

def _run_codec_module(tmp_path, name, src):
    import importlib
    import sys

    import pythonql_spark.codec  # noqa: F401

    (tmp_path / f"{name}.py").write_text(src, encoding="utf-8")
    sys.path.insert(0, str(tmp_path))
    try:
        return importlib.import_module(name)
    finally:
        sys.path.remove(str(tmp_path))


def test_codec_body_ending_in_quote(spark, tmp_path):
    m = _run_codec_module(tmp_path, "pqlmod_r9_q1",
        "# coding: pythonql\n"
        "res = [ select (x, 'end' as tag)\n"
        "        for x in range(1, 3) if x > 1 and 'k' == 'k' ]\n")
    assert [(r.x, r.tag) for r in m.res] == [(2, "end")]


def test_codec_mixed_triple_quote_blocks(spark, tmp_path):
    """''' and \"\"\" strings around and between query spans must not
    desync the mask."""
    m = _run_codec_module(tmp_path, "pqlmod_r9_q2",
        '# coding: pythonql\n'
        'doc1 = """has [ select fake for fake in nothing ] inside"""\n'
        "doc2 = '''also [ x for x in fake ] here'''\n"
        "res = [ select v for v in range(3) if v > 0 ]\n")
    assert "[ select fake" in m.doc1
    assert "[ x for x in fake ]" in m.doc2
    assert m.res == [1, 2]


def test_codec_subscript_select_not_a_query(spark, tmp_path):
    """x[select] — a subscript whose index is a variable named
    select — is a primary subscript, not a query span."""
    m = _run_codec_module(tmp_path, "pqlmod_r9_q3",
        "# coding: pythonql\n"
        "select = 1\n"
        "x = [10, 20, 30]\n"
        "y = x[select]\n")
    assert m.y == 20


# ------------------------------------------- r9 rewriter unit tests
# (pure functions — no SparkSession; the scenario-verbatim test in
# test_cust_journey.py is the integration gate)

def test_split_minus_top_shapes():
    from pythonql_spark.pql import _split_minus_top
    assert _split_minus_top("a - b") == ["a ", " b"]
    assert _split_minus_top("f(x - y) - g") == ["f(x - y) ", " g"]
    assert _split_minus_top("filter(a, x -> x - 1)") == \
        ["filter(a, x -> x - 1)"]          # lambda arrow + depth>0
    assert _split_minus_top("-a") == ["-a"]              # unary
    assert _split_minus_top("a * -b") == ["a * -b"]      # unary after op


def test_rewrite_datetime_idioms():
    from pythonql_spark import pql as P
    saved = dict(P._PQL_CTX)
    P._PQL_CTX.update(ts_vars={"cd", "rd"}, seq_vars=set(),
                      opt_vars=set(), env_fns={})
    try:
        assert P._rewrite_datetime("(cd - rd).days < 30") == \
            "datediff(cd, rd) < 30"
        assert P._rewrite_datetime("fd.date()") == "to_date(fd)"
        assert P._rewrite_datetime("cd.year + 1") == "year(cd) + 1"
        assert P._rewrite_datetime("e.date.month == mo") == \
            "month(e.date) == mo"
        # bare row alias NOT in ts_vars keeps struct-field semantics
        assert P._rewrite_datetime("row.year") == "row.year"
        # (a - b) > 0 rewrites only when a side is timestampy
        assert P._rewrite_datetime(
            "(to_timestamp(e.d) - rd) > 0") == \
            "((to_timestamp(e.d)) > (rd))"
        assert P._rewrite_datetime("(x - y) > 0") == "(x - y) > 0"
    finally:
        P._PQL_CTX.update(saved)


def test_detect_env_fns_identity_based():
    import calendar
    from datetime import date

    import numpy as np
    from dateutil.parser import parse

    from pythonql_spark.pql import _detect_env_fns
    fns = _detect_env_fns({"parse": parse, "date": date,
                           "monthrange": calendar.monthrange,
                           "np": np, "other": len,
                           "myparse": lambda x: x})
    assert fns == {"parse": "parse", "date": "date",
                   "monthrange": "monthrange", "np.mean": "mean"}


def test_truthy_name_requires_tracked_vars():
    from pythonql_spark import pql as P
    saved = dict(P._PQL_CTX)
    P._PQL_CTX.update(seq_vars={"arr"}, opt_vars={"opt"},
                      ts_vars=set(), env_fns={})
    try:
        assert P._truthy_name("arr") == "size(arr) > 0"
        assert P._truthy_name("not arr") == "size(arr) = 0"
        assert P._truthy_name("opt") == "opt IS NOT NULL"
        assert P._truthy_name("not opt") == "opt IS NULL"
        assert P._truthy_name("flag") is None
        assert P._truthy_name("arr == 1") is None
    finally:
        P._PQL_CTX.update(saved)
