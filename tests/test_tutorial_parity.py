"""Ports of the reference's own acceptance suite
(reference tests/tutorial_tests.py q1–q13) onto the Spark DSL.
Each test asserts the same values the reference asserts.
"""

import json

from pyspark.sql import functions as F

from pythonql_spark import Query
from pythonql_spark.functions import json_child, json_descendants, try_number
from pythonql_spark.operators import predicate_windows


def _range_pairs(spark, nx, ny):
    x = spark.range(1, nx).selectExpr("cast(id as int) as x")
    y = spark.range(1, ny).selectExpr("cast(id as int) as y")
    return x.crossJoin(y)


def test_q1_filtered_cartesian(spark):
    # select (x,y) for x in 1..7, y in 1..6 if x%2==0 and y%2!=0 and x>y
    res = (Query(spark)
           .for_("t", _range_pairs(spark, 8, 7))
           .let_("x", "t.x").let_("y", "t.y")
           .where("x % 2 == 0 and y % 2 != 0 and x > y")
           .order_by("x", "y")
           .select("x", "y")
           .to_list())
    assert res[0].x == 2 and res[0].y == 1


def test_q2_q3_group_having(spark):
    # group by x, sum(y), then filter on the aggregate (having)
    res = (Query(spark)
           .for_("t", _range_pairs(spark, 8, 7))
           .let_("x", "t.x").let_("y", "t.y")
           .where("x % 2 == 0 and y % 2 != 0 and x > y")
           .group_by("x")
           .let_("sum_y", "sum(y)")
           .where("sum_y % 2 != 0")
           .order_by("x")
           .select("x", "cast(sum_y as int) as sum_y")
           .to_list())
    assert res[0].x == 2 and res[0].sum_y == 1
    assert res[1].x == 6 and res[1].sum_y == 9


def test_q4_outer_lateral(spark):
    # let ys = subquery, for y in outer(ys): empty lists yield None
    x = spark.range(1, 10).selectExpr("cast(id as int) as x")
    res = (Query(spark)
           .for_("r", x)
           .let_("ys", "CASE WHEN r.x % 2 = 0 THEN filter(sequence(1, 9), y -> r.x > y) "
                       "ELSE array() END")
           .for_("y", "ys", outer=True)
           .order_by("r.x", "y")
           .select("r.x as x", "y")
           .to_list())
    by_x = {}
    for r in res:
        by_x.setdefault(r.x, []).append(r.y)
    assert by_x[4] == [1, 2, 3]
    assert by_x[5] == [None]


def test_q5_group_lists(spark):
    res = (Query(spark)
           .for_("t", _range_pairs(spark, 5, 5))
           .let_("x", "t.x").let_("y", "t.y")
           .where("x > y")
           .group_by("x")
           .order_by("x")
           .select("x", "sort_array(y) as y")
           .to_list())
    assert res[2].x == 4 and res[2].y == [1, 2, 3]


def test_q6_group_by_expr(spark):
    res = (Query(spark)
           .for_("t", _range_pairs(spark, 5, 5))
           .let_("x", "t.x").let_("y", "t.y")
           .where("x > y")
           .group_by("x * x as x_squared")
           .order_by("x_squared")
           .select("x_squared", "sort_array(y) as y")
           .to_list())
    assert res[2].x_squared == 16 and res[2].y == [1, 2, 3]
    assert res[1].x_squared == 9 and res[1].y == [1, 2]


def test_q7_order_multi(spark):
    res = (Query(spark)
           .for_("t", _range_pairs(spark, 5, 5))
           .let_("x", "t.x").let_("y", "t.y")
           .where("x > y")
           .order_by("abs(x - y) asc", "y desc")
           .select("x", "y")
           .to_list())
    assert res[0].x == 4 and res[0].y == 3
    assert res[1].x == 3 and res[1].y == 2


def test_q8_path_steps(spark):
    db = [{"region": [{"box": [1, 2], "label": "lake"},
                      {"box": {"box": [2, 3]}},
                      {"region": {"box": [1, 2], "label": "lake"}},
                      {"region": {"circle": [0.5, 0.5, 45], "label": "pond"}}]},
          {"region": {"box": [1, 2], "label": "lake"}}]
    df = spark.createDataFrame([(json.dumps(d),) for d in db], "j string")
    child_child = (df.select(F.explode(json_child("j", "region")).alias("r"))
                   .select(F.explode(json_child("r", "region")).alias("rr")))
    assert child_child.count() == 2
    desc = df.select(F.explode(json_descendants("j", "box")).alias("b"))
    assert desc.count() == 5


def test_q9_try_except(spark):
    data = [15, 25, None, 80, 34, "34", "twenty", [12], 54, 12]
    df = spark.createDataFrame([(str(v) if v is not None else None,)
                                for v in data], "v string")
    # "[12]" fails the cast → 0, like the reference's try int(x) except 0
    got = (df.select(try_number("v", 0).alias("n"))
           .agg(F.expr("cast(sum(n) as int)").alias("s")).first().s)
    assert got == 254


def test_q10_nested_construction(spark):
    res = (Query(spark)
           .for_("i", spark.createDataFrame([(1,), (3,), (5,)], "i int"))
           .let_("sequence_start", "i.i")
           .let_("sequence", "transform(sequence(i.i, i.i + 4), k -> named_struct('item', k))")
           .order_by("sequence_start")
           .select("sequence_start", "sequence")
           .to_list())
    assert res[1].sequence_start == 3 and len(res[1].sequence) == 5


def _seq_df(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "pos int, v int")


def test_q11_sliding_fixed(spark):
    w = predicate_windows(_seq_df(spark, [1, 2, 3, 4, 5, 6, 7]).select("pos", "v"),
                          order_by="pos",
                          start_when=lambda c, a, p, n: True,
                          end_when=lambda c, a, p, n, sc, sa: a - sa == 2)
    rows = sorted((r["s_at"], sum(d["v"] for d in r["window"]))
                  for r in w.collect())
    assert rows[0] == (0, 6) and rows[1] == (1, 9) and rows[2] == (2, 12)


def test_q12_sliding_predicates(spark):
    w = predicate_windows(_seq_df(spark, [1, 2, 3, 4, 5, 6, 7]),
                          order_by="pos",
                          start_when=lambda c, a, p, n: c["v"] % 2 == 0,
                          end_when=lambda c, a, p, n, sc, sa: c["v"] - sc["v"] > 2)
    rows = sorted((r["window"][0]["v"], sum(d["v"] for d in r["window"]))
                  for r in w.collect())
    assert rows == [(2, 14), (4, 22), (6, 13)]


def test_q13_only_end(spark):
    # start at odd y, only closed windows (e.y - s.y >= 2)
    pairs = spark.createDataFrame(
        [(i, y, y) for i, y in enumerate([1, 2, 3, 4, 5, 6])],
        "pos int, y int, z int")
    w = predicate_windows(pairs, order_by="pos",
                          start_when=lambda c, a, p, n: c["y"] % 2 == 1,
                          end_when=lambda c, a, p, n, sc, sa: c["y"] - sc["y"] >= 2,
                          only_end=True)
    starts = sorted(r["window"][0]["y"] for r in w.collect())
    assert starts == [1, 3]
