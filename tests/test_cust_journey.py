"""Port of the reference's customer-journey scenario
(reference tests/cust_journey_scenario_tests.py): per-entity event
sequences queried with let-subqueries, semi-joins, grouping.

The reference iterates in-memory journey lists; here journeys are the
``events`` table partitioned by user — the shape such analyses take on
a cluster.  The assertions validate clause composition (filters over
per-user aggregates, semi/anti membership, balance arithmetic) against
independently-computed pandas results.
"""

import pytest
from pyspark.sql import functions as F

from pythonql_spark import Query


@pytest.fixture(scope="module")
def events(tables):
    return tables["events"]


@pytest.fixture(scope="module")
def events_pd(events):
    return events.toPandas()


def test_balance_per_user(spark, events, events_pd):
    # reference: balance = sum(deposits) - sum(withdrawals), keep > 300
    # here: purchases minus errors by value, keep high-balance users
    q = (Query(spark)
         .for_("e", events)
         .group_by("e.user_id as user_id")
         .let_("balance",
               "sum(CASE WHEN e.event_type = 'purchase' THEN e.value "
               "WHEN e.event_type = 'error' THEN -e.value ELSE 0 END)")
         .where("balance > 300")
         .select("user_id", "round(balance, 2) as balance"))
    got = {r.user_id: r.balance for r in q.df().collect()}

    pdf = events_pd.copy()
    pdf["delta"] = pdf.apply(
        lambda r: r["value"] if r["event_type"] == "purchase"
        else (-r["value"] if r["event_type"] == "error" else 0.0), axis=1)
    want = pdf.groupby("user_id")["delta"].sum()
    want = {k: round(v, 2) for k, v in want.items() if v > 300}
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-6


def test_users_with_event_semi(spark, events, events_pd):
    # reference: journeys containing a 'close' event (membership test)
    users = (Query(spark)
             .for_("u", events.select("user_id").distinct())
             .semi_join(events.filter("event_type = 'signup'"),
                        on="__semi.user_id == u.user_id")
             .select("u.user_id")
             .df())
    got = {r.user_id for r in users.collect()}
    want = set(events_pd[events_pd.event_type == "signup"].user_id)
    assert got == want


def test_last_event_then_filter(spark, events, events_pd):
    # reference: last issued loan then check follow-up; here: users
    # whose latest event is an error
    q = (Query(spark)
         .for_("e", events)
         .group_by("e.user_id as user_id")
         .let_("last_type", "max_by(e.event_type, struct(e.ts, e.event_id))")
         .where("last_type == 'error'")
         .select("user_id"))
    got = {r.user_id for r in q.df().collect()}
    last = events_pd.sort_values(["user_id", "ts", "event_id"]).groupby("user_id").tail(1)
    want = set(last[last.event_type == "error"].user_id)
    assert got == want


def test_first_event_group(spark, events, events_pd):
    # reference: group journeys by the 'open' event's state
    q = (Query(spark)
         .for_("e", events)
         .group_by("e.user_id as user_id")
         .let_("first_type", "min_by(e.event_type, struct(e.ts, e.event_id))")
         .group_by("first_type")
         .select("first_type", "count(user_id) as n_users"))
    got = {r.first_type: r.n_users for r in q.df().collect()}
    first = events_pd.sort_values(["user_id", "ts", "event_id"]).groupby("user_id").head(1)
    want = first.event_type.value_counts().to_dict()
    assert got == want
