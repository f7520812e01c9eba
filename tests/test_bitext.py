"""Margin-based bitext mining (operators/bitext.py): planted-pair
recovery, hub suppression vs absolute cosine, mutuality, oracle
parity at sf0.001."""

import duckdb
import numpy as np
import pytest

from pythonql_spark.operators.bitext import bitext_oracle_sql, mine_bitext

SF = "/root/testdata/sf0.001"


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")


def test_planted_pairs_mined_mutual(spark):
    """Each src vector's true translation is a noisy copy on the tgt
    side; mining must recover exactly the planted alignment."""
    rng = np.random.RandomState(11)
    base = rng.randn(20, 16)
    src = _mk(spark, [(i, base[i]) for i in range(20)])
    tgt = _mk(spark, [(100 + i, base[i] + 0.05 * rng.randn(16))
                      for i in range(20)])
    got = {(r.src_id, r.tgt_id)
           for r in mine_bitext(src, tgt, k=4, threshold=1.0).collect()}
    assert got == {(i, 100 + i) for i in range(20)}


def test_hub_suppressed_by_margin(spark):
    """A hub vector close to EVERYTHING has high absolute cosine but
    margin ≈ 1: the ratio criterion must rank the true pair above the
    hub pairing (the point of Artetxe & Schwenk over a threshold)."""
    rng = np.random.RandomState(5)
    d = 16
    base = rng.randn(6, d)
    hub = base.mean(axis=0) * 3          # near the centroid: hub-like
    src = _mk(spark, [(i, base[i]) for i in range(6)])
    tgt_rows = [(100 + i, base[i] + 0.05 * rng.randn(d))
                for i in range(6)] + [(999, hub)]
    tgt = _mk(spark, tgt_rows)
    out = mine_bitext(src, tgt, k=3, threshold=1.0).collect()
    got = {(r.src_id, r.tgt_id) for r in out}
    # every source pairs with its planted twin, never the hub
    assert got == {(i, 100 + i) for i in range(6)}
    assert all(r.tgt_id != 999 for r in out)


def test_mutuality_is_enforced(spark):
    """mutual=False may emit several pairs per src; mutual=True keeps
    a 1:1 matching (each id appears at most once per side)."""
    rng = np.random.RandomState(9)
    base = rng.randn(12, 16)
    src = _mk(spark, [(i, base[i]) for i in range(12)])
    tgt = _mk(spark, [(200 + i, base[(i // 2) * 2] + 0.1 * rng.randn(16))
                      for i in range(12)])     # tgt pairs share sources
    loose = mine_bitext(src, tgt, k=4, threshold=0.9,
                        mutual=False).collect()
    strict = mine_bitext(src, tgt, k=4, threshold=0.9).collect()
    s_src = [r.src_id for r in strict]
    s_tgt = [r.tgt_id for r in strict]
    assert len(s_src) == len(set(s_src))
    assert len(s_tgt) == len(set(s_tgt))
    assert len(strict) <= len(loose)


def test_oracle_parity_sf0001(spark, tables):
    out = mine_bitext(tables["embeddings"].filter("label % 2 = 0"),
                      tables["embeddings"].filter("label % 2 = 1"),
                      k=4, threshold=1.0)
    got = sorted((r.src_id, r.tgt_id, r.cosine, r.margin_e6)
                 for r in out.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF}/embeddings.parquet'")
    sql = bitext_oracle_sql(k=4, threshold=1.0,
                            src_where="label % 2 = 0",
                            tgt_where="label % 2 = 1", dim=64)
    assert got == sorted(map(tuple, con.execute(sql).fetchall()))
    assert len(got) > 0
