"""Temperature sampling + epoch upsampling (sampling.py additions):
share rebalancing, exact epoch fan-out, determinism, plan shape.
Oracle parity runs automatically via tests/test_oracle.py (both keys
are fully SQL-oracled)."""

from pyspark.sql import functions as F

from pythonql_spark.operators.sampling import (sample_temperature,
                                               upsample_epochs)


def _shares(df, col="lang"):
    rows = df.groupBy(col).count().collect()
    total = sum(r["count"] for r in rows)
    return {r[col]: r["count"] / total for r in rows}


def test_temperature_flattens_shares(spark, tables):
    docs = tables["documents"].select("doc_id", "lang")
    before = _shares(docs)
    after = _shares(sample_temperature(docs, "lang", alpha=0.5))
    # α=0.5 must strictly shrink the spread between the dominant and
    # the rarest language share
    spread_b = max(before.values()) - min(before.values())
    spread_a = max(after.values()) - min(after.values())
    assert spread_a < spread_b
    # smallest stratum is kept whole (cut = 10000)
    smallest = min(before, key=lambda k: before[k])
    n_before = docs.filter(F.col("lang") == smallest).count()
    n_after = (sample_temperature(docs, "lang", alpha=0.5)
               .filter(F.col("lang") == smallest).count())
    assert n_after == n_before


def test_temperature_alpha_one_keeps_everything(spark, tables):
    docs = tables["documents"].select("doc_id", "lang")
    kept = sample_temperature(docs, "lang", alpha=1.0)
    assert kept.count() == docs.count()


def test_upsample_epoch_counts_exact(spark, tables):
    docs = tables["documents"].select("doc_id", "lang")
    reps = {"en": 3.0, "de": 2.0}
    out = upsample_epochs(docs, "lang", reps, default_repeat=1.0)
    per = {r.lang: r["count"] for r in
           out.groupBy("lang").count().collect()}
    base = {r.lang: r["count"] for r in
            docs.groupBy("lang").count().collect()}
    # integer repeats are exact multiplication, no hash involvement
    assert per["en"] == 3 * base["en"]
    assert per["de"] == 2 * base["de"]
    for lang, n in base.items():
        if lang not in reps:
            assert per[lang] == n
    # epoch ids are dense 0..r-1 per row
    eps = (out.filter("lang = 'en'").groupBy("doc_id")
           .agg(F.sort_array(F.collect_list("epoch")).alias("e"))
           .select("e").distinct().collect())
    assert [list(r.e) for r in eps] == [[0, 1, 2]]


def test_upsample_fractional_is_deterministic_subset(spark, tables):
    docs = tables["documents"].select("doc_id", "lang")
    a = upsample_epochs(docs, "lang", {"en": 1.5})
    b = upsample_epochs(docs, "lang", {"en": 1.5})
    ra = sorted((r.doc_id, r.epoch) for r in a.collect())
    rb = sorted((r.doc_id, r.epoch) for r in b.collect())
    assert ra == rb
    n_en = docs.filter("lang = 'en'").count()
    n_extra = len([1 for d, e in ra if e == 1])
    # ~half the en docs get the fractional second epoch
    assert 0.3 * n_en < n_extra < 0.7 * n_en


def test_plans_stay_narrow(spark, tables):
    """Neither operator may shuffle the corpus: temperature's only
    exchange feeds the tiny count aggregate (then broadcast back);
    upsample has no exchange at all."""
    docs = tables["documents"].select("doc_id", "lang")
    plan_u = (upsample_epochs(docs, "lang", {"en": 2.0})
              ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan_u
    plan_t = (sample_temperature(docs, "lang")
              ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan_t
    assert "SortMergeJoin" not in plan_t


def test_snapshot_diff_verdicts(spark, tables):
    """added/removed/changed must match the planted construction and
    unchanged rows must produce nothing."""
    from pythonql_spark.operators.diff import snapshot_diff

    docs = tables["documents"].select("doc_id", "lang", "text")
    old = docs.filter("doc_id % 7 != 0")
    new = (docs.filter("doc_id % 5 != 0")
           .selectExpr("doc_id", "lang",
                       "CASE WHEN doc_id % 11 = 0 THEN upper(text) "
                       "ELSE text END AS text"))
    out = {r.doc_id: r.change
           for r in snapshot_diff(old, new, key_col="doc_id",
                                  compare_cols=["lang", "text"]).collect()}
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    for i in ids:
        in_old, in_new = i % 7 != 0, i % 5 != 0
        edited = i % 11 == 0
        if in_old and not in_new:
            expect = "removed"
        elif in_new and not in_old:
            expect = "added"
        elif in_old and in_new and edited:
            expect = "changed"
        else:
            expect = None
        assert out.get(i) == expect, (i, out.get(i), expect)
    assert set(out.values()) == {"added", "removed", "changed"}


def test_snapshot_diff_shuffles_hashes_not_bodies(spark, tables):
    """The join input projects (key, hash) only: no text column may
    survive into the Exchange."""
    from pythonql_spark.operators.diff import snapshot_diff

    docs = tables["documents"].select("doc_id", "lang", "text")
    plan = (snapshot_diff(docs, docs, key_col="doc_id",
                          compare_cols=["lang", "text"])
            ._jdf.queryExecution().executedPlan().toString())
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)
    # the projected shuffle payload is the hash, not the body
    assert "xxhash64" in plan


def test_resample_null_key_group_kept(spark):
    """A NULL-valued key is a real group: its bins must carry the real
    aggregates, not the fill value (the spine join is null-safe)."""
    from pythonql_spark.operators.timeseries import resample
    rows = [("h1", "2024-01-01 00:00:30"), ("h1", "2024-01-01 00:01:30"),
            (None, "2024-01-01 00:00:10"), (None, "2024-01-01 00:00:20")]
    df = spark.createDataFrame(rows, "host string, ts string") \
        .selectExpr("host", "cast(ts as timestamp) as ts")
    out = resample(df, "ts", 60, start="2024-01-01 00:00:00",
                   end="2024-01-01 00:02:00", keys=["host"])
    got = {(r.host, str(r.bin_start)): r.n_events for r in out.collect()}
    assert got[(None, "2024-01-01 00:00:00")] == 2
    assert got[(None, "2024-01-01 00:01:00")] == 0
    assert got[("h1", "2024-01-01 00:00:00")] == 1


def test_resample_bad_bounds_clear_error(spark):
    import pytest as _pytest
    from pythonql_spark.operators.timeseries import resample
    df = spark.createDataFrame([("2024-01-01 00:00:30",)], "ts string") \
        .selectExpr("cast(ts as timestamp) as ts")
    with _pytest.raises(ValueError, match="YYYY-MM-DD"):
        resample(df, "ts", 60, start="2024-13-01 00:00:00",
                 end="2024-01-02 00:00:00")
