"""Rows-only keys: the driver records only their row counts, so the
per-row ``checksum`` column (helpers.with_checksum, wrapped centrally
in benchqueries) is what binds their VALUES.  That only means anything
if the values are genuinely deterministic — independent of partition
layout, task scheduling, and batch boundaries — so every rows-only
key is executed at 2 vs 8 shuffle partitions and the full checksummed
output must match exactly."""

import pytest

from pythonql_spark.benchqueries import ORACLE, QUERIES

ROWS_ONLY = [k for k in QUERIES if k not in ORACLE]


def _canon(df):
    rows = df.collect()
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in rows)


def test_rows_only_keys_all_carry_checksum(spark, sf_dir):
    assert ROWS_ONLY, "registry wiring broke"
    for k in ROWS_ONLY:
        df = QUERIES[k](spark, sf_dir)
        assert "checksum" in df.columns, k


@pytest.mark.parametrize("key", ROWS_ONLY)
def test_rows_only_output_partition_invariant(spark, sf_dir, key):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        a = _canon(QUERIES[key](spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        b = _canon(QUERIES[key](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert len(a) > 0, key
    assert a == b, f"{key}: output depends on partitioning"
