"""Duplicate-span (substring) dedup: stats, canonical-copy stripping,
plan shape."""

import pytest
from pyspark.sql import Row

from pythonql_spark.operators.spans import dup_span_stats, strip_dup_spans

SPAN = "one two three four five six seven eight"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([
        Row(doc_id=1, text=f"unique alpha words here {SPAN} tail a"),
        Row(doc_id=2, text=f"prefix tokens {SPAN} closing words x y"),
        Row(doc_id=3, text="totally unrelated content with no "
                           "duplication at all"),
        Row(doc_id=4, text="short doc"),
        Row(doc_id=5, text=f"{SPAN} and {SPAN}"),  # twice in one doc
    ])


def test_stats_flags_shared_span(corpus):
    stats = {r.doc_id: r for r in dup_span_stats(corpus, k=8).collect()}
    assert stats[1].n_dup_kgrams == 1
    assert stats[2].n_dup_kgrams == 1
    # an 8-gram over 14 tokens covers 8/14 positions
    assert stats[1].dup_token_frac == round(8 / 14, 6)
    # clean docs report zeros but are present
    assert stats[3].n_dup_kgrams == 0 and stats[3].dup_token_frac == 0.0
    # a doc shorter than k has no k-grams (sequence() descending guard)
    assert stats[4].n_tokens == 2 and stats[4].n_dup_kgrams == 0
    # within-doc repetition counts too
    assert stats[5].n_dup_kgrams == 2


def test_strip_keeps_canonical_copy(corpus):
    out = {r.doc_id: r for r in strip_dup_spans(corpus, k=8).collect()}
    # doc 1 is the min-id holder: span intact, nothing removed
    assert SPAN in out[1].text and out[1].n_removed_tokens == 0
    # doc 2 loses exactly the 8 span tokens
    assert SPAN not in out[2].text and out[2].n_removed_tokens == 8
    assert out[2].text == "prefix tokens closing words x y"
    # untouched docs round-trip (case-folded rejoin)
    assert out[3].text.split() == corpus.filter("doc_id = 3") \
        .collect()[0].text.lower().split()
    # doc 5 is not the holder: both occurrences removed
    assert out[5].n_removed_tokens > 0 and SPAN not in out[5].text


def test_strip_then_stats_is_clean(corpus):
    """After stripping, no cross-document duplicated k-gram remains
    except inside the canonical holder."""
    stripped = strip_dup_spans(corpus, k=8).select("doc_id", "text")
    stats = {r.doc_id: r.n_dup_kgrams
             for r in dup_span_stats(stripped, k=8).collect()}
    assert all(v == 0 for v in stats.values()), stats


def test_shuffles_carry_hashes_not_text(corpus):
    explained = dup_span_stats(corpus, k=8) \
        ._jdf.queryExecution().executedPlan().toString()
    import re
    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)",
                           explained):
        assert "text" not in keys, explained


def test_winnow_fingerprints(spark):
    import pytest as _pytest
    from pythonql_spark.operators.spans import winnow_fingerprints
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [(1, "one two three four " + shared + " five six seven eight"),
         (2, "red blue " + shared + " green yellow purple orange pink"),
         (3, "tiny doc")],                       # < w+k-1 tokens: none
        "doc_id long, text string")
    fp = winnow_fingerprints(docs, k=5, w=4).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r.doc_id, []).append((r.fp_hash, r.fp_start))
    # winnowing guarantee: a shared run of >= w + k - 1 = 8 tokens
    # must contribute at least one common fingerprint HASH
    h1 = {h for h, _ in by_doc[1]}
    h2 = {h for h, _ in by_doc[2]}
    assert h1 & h2
    assert 3 not in by_doc                       # no full window
    # density: selected positions never leave a w-gap uncovered
    for d in (1, 2):
        starts = sorted({s for _, s in by_doc[d]})
        gaps = [b - a for a, b in zip(starts, starts[1:])]
        assert all(g <= 4 for g in gaps)
    # partition invariance
    again = winnow_fingerprints(docs.repartition(4), k=5, w=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, fp))
    with _pytest.raises(ValueError):
        winnow_fingerprints(docs, k=0, w=4)


def test_clone_pairs(spark):
    import pytest as _pytest
    from pythonql_spark.operators.spans import clone_pairs
    shared = ("alpha beta gamma delta epsilon zeta eta theta iota "
              "kappa lam mu nu xi omicron pi")
    ubiq = "the quick brown fox jumps over the lazy dog again"
    docs = spark.createDataFrame(
        [(1, "one two three " + shared + " four five six"),
         (2, "seven eight " + shared + " nine ten eleven"),
         # every doc shares the ubiquitous phrase -> stop rule kills it
         (3, ubiq + " twelve thirteen fourteen fifteen sixteen"),
         (4, ubiq + " seventeen eighteen nineteen twenty twentyone"),
         (5, ubiq + " red green blue purple orange pink")],
        "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.shared
           for r in clone_pairs(docs, k=5, w=4, min_shared=2,
                                max_docs_per_fp=2).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 2    # the planted clone
    # the ubiquitous phrase is held by 3 docs > max_docs_per_fp=2, so
    # its fingerprints are excluded and docs 3/4/5 never pair up
    assert not any(set(p) <= {3, 4, 5} for p in got)
    with _pytest.raises(ValueError):
        clone_pairs(docs, min_shared=0)


def test_winnow_decontaminate(spark):
    from pythonql_spark.operators.spans import winnow_decontaminate
    leak = ("question one what is the capital of france answer paris "
            "question two name the largest planet answer jupiter")
    bench = spark.createDataFrame([(100, leak)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "clean document about cooking pasta with tomato sauce and basil"),
         (2, "intro text " + leak + " outro text"),      # verbatim leak
         (3, "another clean doc on gardening tips for growing herbs")],
        "doc_id long, text string")
    got = {r.doc_id: r.n_matched
           for r in winnow_decontaminate(corpus, bench, k=5, w=4).collect()}
    assert got[2] > 0                    # the planted leak is caught
    assert got[1] == 0 and got[3] == 0   # clean docs untouched
