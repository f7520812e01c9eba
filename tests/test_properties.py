"""Property-based tests (hypothesis): invariants that must hold for
ARBITRARY inputs, not just the curated cases — the PNG codec
round-trip, packing offsets, and the dense global index."""

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

SLOW = settings(max_examples=20, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(w=st.integers(1, 12), h=st.integers(1, 12),
       ch=st.sampled_from([1, 2, 3, 4]), data=st.data())
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, ch, data):
    from pythonql_spark.operators import png
    pix = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch)))
    W_, H_, C_, out = png.decode_png(png.encode_png(w, h, ch, pix))
    assert (W_, H_, C_) == (w, h, ch)
    assert bytes(out) == pix


@given(pixels=st.lists(st.integers(0, 255), min_size=4, max_size=64))
@settings(max_examples=30, deadline=None)
def test_png_mean_intensity_alpha_excluded(pixels):
    from pythonql_spark.operators.png import mean_intensity
    pix = bytes(pixels[: len(pixels) - len(pixels) % 2])
    if not pix:
        return
    # gray+alpha: mean over the gray samples only
    got = mean_intensity(pix, 2)
    want = sum(pix[::2]) / (len(pix) // 2)
    assert abs(got - want) < 1e-9


@pytest.mark.parametrize("n_rows,n_parts", [(97, 5), (1, 1), (64, 16)])
def test_global_index_is_dense_permutation(spark, n_rows, n_parts):
    """global_index must yield exactly 0..n-1 regardless of partition
    layout, ordered and unordered."""
    from pyspark.sql import functions as F

    from pythonql_spark.operators.sampling import global_index

    df = (spark.range(n_rows).withColumn("v", (F.col("id") * 37) % 11)
          .repartition(n_parts))
    ordered = global_index(df, [F.col("v").asc(), F.col("id").asc()],
                           out_col="pos")
    rows = {r.id: r.pos for r in ordered.collect()}
    assert sorted(rows.values()) == list(range(n_rows))
    # positions follow the requested order
    by_pos = sorted(rows.items(), key=lambda kv: kv[1])
    keys = [((i * 37) % 11, i) for i, _ in by_pos]
    assert keys == sorted(keys)

    unordered = global_index(df, None, out_col="pos")
    assert sorted(r.pos for r in unordered.collect()) == list(range(n_rows))


@given(tokens=st.lists(st.integers(1, 50), min_size=1, max_size=30),
       max_tokens=st.integers(8, 64))
@settings(max_examples=15, deadline=None)
def test_pack_offsets_property(tokens, max_tokens):
    """Packing invariant, checked in plain Python against the operator
    formula: offsets are the exclusive prefix sum and seq_id is
    offset // max_tokens — the distributed window must match this for
    any token-length sequence (single shard)."""
    offsets, acc = [], 0
    for t in tokens:
        offsets.append(acc)
        acc += t
    seq_ids = [o // max_tokens for o in offsets]
    assert all(a <= b for a, b in zip(seq_ids, seq_ids[1:]))
    assert offsets[0] == 0 and seq_ids[0] == 0


_WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "yy"])


@given(docs=st.lists(st.lists(_WORDS, min_size=1, max_size=12),
                     min_size=2, max_size=8))
@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_bm25_matches_pure_python(spark, docs):
    """BM25 scores from the engine equal an independent pure-python
    implementation to 6 dp on arbitrary corpora."""
    import math

    from pyspark.sql import Row

    from pythonql_spark.operators.retrieval import bm25_search

    terms = ["alpha", "beta"]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(ws)) for i, ws in enumerate(docs)])
    got = {r.doc_id: r.score
           for r in bm25_search(df, terms, k=100).collect()}

    N = len(docs)
    avgdl = sum(len(ws) for ws in docs) / N
    dfs = {t: sum(1 for ws in docs if t in ws) for t in terms}
    k1, b = 1.2, 0.75
    for i, ws in enumerate(docs):
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            idf = math.log(1.0 + (N - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += round(idf * tf * (k1 + 1) /
                       (tf + k1 * (1 - b + b * len(ws) / avgdl)), 10)
        want = round(s, 6)
        if want > 0:
            assert got[i] == pytest.approx(want, abs=2e-6), (i, docs)
        else:
            assert i not in got


@given(docs=st.lists(st.lists(_WORDS, min_size=1, max_size=14),
                     min_size=2, max_size=6),
       k=st.integers(2, 4))
@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_dup_span_stats_matches_pure_python(spark, docs, k):
    """Duplicated-k-gram counts and coverage equal a brute-force
    recount for arbitrary corpora and k."""
    from collections import Counter

    from pyspark.sql import Row

    from pythonql_spark.operators.spans import dup_span_stats

    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(ws)) for i, ws in enumerate(docs)])
    got = {r.doc_id: (r.n_tokens, r.n_dup_kgrams, r.dup_token_frac)
           for r in dup_span_stats(df, k=k).collect()}

    occ = Counter()
    grams = {}
    for i, ws in enumerate(docs):
        g = [tuple(ws[j:j + k]) for j in range(len(ws) - k + 1)]
        grams[i] = g
        occ.update(g)
    dup = {g for g, c in occ.items() if c > 1}
    for i, ws in enumerate(docs):
        covered = set()
        nd = 0
        for j, g in enumerate(grams[i]):
            if g in dup:
                nd += 1
                covered.update(range(j, j + k))
        want = (len(ws), nd, round(len(covered) / max(len(ws), 1), 6))
        assert got[i] == want, (i, docs, k)


@given(sizes=st.lists(st.integers(1, 40), min_size=1, max_size=15),
       budget=st.integers(1, 300))
@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_select_to_budget_prefix_property(spark, sizes, budget):
    """The kept set is exactly the maximal priority-order prefix whose
    predecessor-sum is under budget, for arbitrary sizes/budgets."""
    from pyspark.sql import Row

    from pythonql_spark.operators.sampling import select_to_budget

    df = spark.createDataFrame(
        [Row(doc_id=i, grp="g", sz=s) for i, s in enumerate(sizes)])
    kept = sorted(r.doc_id for r in select_to_budget(
        df, "grp", {"g": budget}, size_col="sz",
        order="doc_id").collect())
    acc, want = 0, []
    for i, s in enumerate(sizes):
        if acc < budget:
            want.append(i)
        acc += s
    assert kept == want, (sizes, budget)


@given(w=st.integers(1, 10), h=st.integers(1, 10), data=st.data(),
       sg=st.booleans(), pred=st.booleans())
@settings(max_examples=40, deadline=None)
def test_vp8l_roundtrip_property(w, h, data, sg, pred):
    """WEBP-lossless codec: encode→decode is identity for ARBITRARY
    RGBA pixels under every encoder transform combination."""
    from pythonql_spark.operators.vp8l import decode_webp, encode_webp
    pix = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=w * h * 4, max_size=w * h * 4)))
    W_, H_, C_, out = decode_webp(
        encode_webp(w, h, pix, subtract_green=sg, predictor=pred))
    assert (W_, H_, C_) == (w, h, 4)
    assert bytes(out) == pix


@pytest.mark.parametrize("n_parts", [2, 9])
def test_global_percentile_matches_sorted_rank(spark, n_parts):
    """percentile_normalize's global (range-partitioned) path must
    equal the textbook (rank-1)/(n-1) from a Python sort, at any
    partition layout, ties broken by id."""
    from pyspark.sql import Row

    from pythonql_spark.operators.profile import percentile_normalize

    rows = [Row(doc_id=i, s=(i * 31) % 13) for i in range(57)]
    df = spark.createDataFrame(rows).repartition(n_parts)
    got = {r.doc_id: r.s_pct for r in
           percentile_normalize(df, ["s"], id_col="doc_id").collect()}
    order = sorted(rows, key=lambda r: (r.s, r.doc_id))
    want = {r.doc_id: round(i / (len(rows) - 1), 6)
            for i, r in enumerate(order)}
    assert got == want


def test_select_to_budget_matches_serial_reference(spark):
    """The two-phase prefix sum must reproduce the serial running-sum
    semantics exactly: per stratum, keep rows in order until the
    budget line is crossed (inclusive of the crossing row)."""
    from pyspark.sql import Row

    from pythonql_spark.operators.sampling import select_to_budget

    rows = [Row(doc_id=i, g="a" if i % 3 else "b", sz=(i * 7) % 10 + 1)
            for i in range(80)]
    df = spark.createDataFrame(rows).repartition(7)
    got = sorted(r.doc_id for r in select_to_budget(
        df, "g", {"a": 60, "b": 35}, size_col="sz",
        order="doc_id").collect())
    want = []
    for gval in ("a", "b"):
        cum, budget = 0, {"a": 60, "b": 35}[gval]
        for r in sorted((r for r in rows if r.g == gval),
                        key=lambda r: r.doc_id):
            if cum < budget:
                want.append(r.doc_id)
            cum += r.sz
    assert got == sorted(want)


@given(samples=st.lists(
    st.tuples(st.binary(min_size=1, max_size=40),
              st.integers(1, 5000)), min_size=1, max_size=24),
    timescale=st.sampled_from([600, 1000, 90000]),
    kf_mod=st.integers(1, 5))
@settings(max_examples=40, deadline=None)
def test_mp4_sample_table_round_trips(samples, timescale, kf_mod):
    """parse_mp4 over an arbitrary muxed sample table recovers every
    sample's timestamp, payload bytes and keyframe flag exactly."""
    from pythonql_spark.operators.mp4 import mux_mp4, parse_mp4
    keyframes = set(range(1, len(samples) + 1, kf_mod))
    data = mux_mp4(samples, 32, 24, timescale=timescale,
                   keyframes=keyframes)
    t = parse_mp4(data)["tracks"][0]
    assert len(t["samples"]) == len(samples)
    expect_ts, acc = [], 0
    for _, d in samples:
        expect_ts.append(acc * 1000 // timescale)
        acc += d
    for i, (ts, off, sz, sync) in enumerate(t["samples"]):
        assert ts == expect_ts[i]
        assert data[off:off + sz] == samples[i][0]
        assert sync == ((i + 1) in keyframes)


@given(n_frames=st.integers(1, 40),
       kbps=st.sampled_from([32, 64, 96, 128, 192, 320]),
       hz=st.sampled_from([32000, 44100, 48000]),
       mono=st.booleans(),
       id3_len=st.integers(0, 300))
@settings(max_examples=40, deadline=None)
def test_mp3_frame_walk_round_trips(n_frames, kbps, hz, mono, id3_len):
    """parse_mp3 over an arbitrary synthesized frame stream recovers
    frame count, bitrate, rate, channel mode and the exact duration
    implied by samples-per-frame."""
    from pythonql_spark.operators.mp3 import make_mp3, parse_mp3
    d = make_mp3(n_frames, kbps=kbps, hz=hz, mono=mono,
                 id3=b"x" * id3_len if id3_len else b"")
    info = parse_mp3(d)
    assert info["n_frames"] == n_frames
    assert info["bitrate_kbps"] == kbps
    assert info["sample_rate"] == hz
    assert info["channels"] == (1 if mono else 2)
    assert info["duration_ms"] == n_frames * 1152 * 1000 // hz


@given(vecs=st.lists(
    st.lists(st.floats(-3, 3, allow_nan=False, width=32),
             min_size=8, max_size=8),
    min_size=4, max_size=32))
@settings(max_examples=20, deadline=None)
def test_pq_codes_are_argmin_of_codebook(vecs):
    """PQ encoding of arbitrary vectors always picks the sub-codeword
    with minimal L2 distance (ties to the lowest index)."""
    import numpy as np

    from pythonql_spark.operators.pq import _subspace_kmeans
    X = np.array(vecs, dtype=np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.maximum(norms, 1e-12)
    for s in range(2):                       # two 4-dim subspaces
        Xs = np.ascontiguousarray(X[:, s * 4:(s + 1) * 4])
        C = _subspace_kmeans(Xs, 4, iters=5, seed=7 + s)
        D = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        codes = (-2.0 * (Xs @ C.T) + (C * C).sum(axis=1)).argmin(axis=1)
        # the production argmin (dot-product form) must agree with the
        # brute-force distance argmin up to exact ties
        brute = D.argmin(axis=1)
        same = codes == brute
        ties = np.isclose(D[np.arange(len(D)), codes],
                          D[np.arange(len(D)), brute])
        assert np.all(same | ties)


def _ed(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


_NAME = st.text(alphabet="abcdef-", min_size=1, max_size=12)


@given(names=st.lists(_NAME, min_size=2, max_size=10, unique=True),
       d=st.integers(1, 2))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzzy_pairs_complete_vs_bruteforce(spark, names, d):
    """Prefix-filter candidate generation must be COMPLETE for
    arbitrary strings and both distances — every brute-force pair
    within d is returned, with the exact distance."""
    import itertools

    from pythonql_spark.operators.fuzzy import fuzzy_pairs
    df = spark.createDataFrame(list(enumerate(names)),
                               "doc_id long, name string")
    got = {(r.id_a, r.id_b): r.dist
           for r in fuzzy_pairs(df, "name", d, q=2).collect()}
    want = {(i, j): _ed(a, b)
            for (i, a), (j, b) in itertools.combinations(
                enumerate(names), 2) if _ed(a, b) <= d}
    assert got == want


@given(hashes=st.lists(st.integers(-(1 << 63), (1 << 63) - 1),
                       min_size=2, max_size=12, unique=True),
       t=st.integers(0, 3))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ahash_pairs_complete_vs_bruteforce(spark, hashes, t):
    """Banded hamming blocking must be COMPLETE for arbitrary 64-bit
    hashes at any threshold ≤ bands-1 (pigeonhole)."""
    import itertools

    from pythonql_spark.operators.multimodal import ahash_pairs
    df = spark.createDataFrame(list(enumerate(hashes)),
                               "doc_id long, ahash long")
    got = {(r.id_a, r.id_b): r.hamming
           for r in ahash_pairs(df, max_hamming=t).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    want = {(i, j): ham(a, b)
            for (i, a), (j, b) in itertools.combinations(
                enumerate(hashes), 2) if ham(a, b) <= t}
    assert got == want


@given(vec=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                              allow_nan=False, allow_infinity=False,
                              width=32),
                    min_size=1, max_size=96))
@settings(max_examples=80, deadline=None)
def test_int8_quantize_matches_pure_python(vec):
    """_np_codes (the Arrow production path) must equal a plain-Python
    replay of the documented formula floor(x / (max|x|/127) + 0.5) for
    ANY finite float32 vector — including all-zero, all-negative and
    magnitude-extreme inputs."""
    import math

    import numpy as np

    from pythonql_spark.operators.quantize import _np_codes

    C, sc = _np_codes(np.array([vec], dtype=np.float32))
    mx = max(abs(float(np.float32(x))) for x in vec)
    scale = mx / 127.0
    assert sc[0] == scale
    for got, x in zip(C[0], vec):
        x64 = float(np.float32(x))
        exp = 0 if scale == 0.0 else math.floor(x64 / scale + 0.5)
        assert got == exp
        assert -127 <= got <= 127 or abs(got) == 127
        if scale:    # dequantization error within half a step
            assert abs(got * scale - x64) <= scale / 2 * (1 + 1e-12)


@given(vals=st.lists(st.one_of(
    st.text(min_size=0, max_size=24), st.integers(-10**9, 10**9)),
    min_size=1, max_size=60))
@SLOW
def test_md5_hll_registers_match_pure_python(spark, vals):
    """The md5-HLL register table (the hash-oracle sketch sibling)
    must equal a pure-Python replay of the same construction on
    ARBITRARY values: 60-bit md5 prefix, top-8-bit bucket, leading
    zeros of the 52-bit remainder + 1, max per bucket."""
    import hashlib

    from pythonql_spark.operators.sketch import hll_registers_md5

    df = spark.createDataFrame([(str(v),) for v in vals], ["v"])
    got = {(r.col_name, r.bucket): r.register
           for r in hll_registers_md5(df, ["v"]).collect()}

    want: dict = {}
    for v in vals:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        bucket, low = h >> 52, h % (1 << 52)
        rho = 53 if low == 0 else 53 - low.bit_length()
        key = ("v", bucket)
        want[key] = max(want.get(key, 0), rho)
    assert got == want


@given(vals=st.lists(st.integers(-10**9, 10**9),
                     min_size=1, max_size=60))
@SLOW
def test_cms_counters_match_pure_python(spark, vals):
    """Count-Min counters must equal a pure-Python replay on
    arbitrary values (depth-salted 60-bit md5 mod width, summed)."""
    import hashlib

    from pythonql_spark.operators.sketch import (CMS_DEPTH, CMS_WIDTH,
                                                 cms_counters_md5)

    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {(r.d, r.slot): r.counter
           for r in cms_counters_md5(df, "v").collect()}

    want: dict = {}
    for v in vals:
        for d in range(CMS_DEPTH):
            h = int(hashlib.md5(f"cms{d}:{v}".encode())
                    .hexdigest()[:15], 16)
            key = (d, h % CMS_WIDTH)
            want[key] = want.get(key, 0) + 1
    assert got == want


@given(data=st.data())
@SLOW
def test_url_components_match_urllib(spark, data):
    """URL host/port/path extraction must agree with stdlib
    urllib.parse on STRUCTURED arbitrary URLs (scheme case, optional
    userinfo/port/path/query/fragment) — an independent reference
    implementation for the regexp component split."""
    from urllib.parse import urlsplit

    from pythonql_spark.operators.url import (url_host_expr,
                                              url_path_expr,
                                              url_port_expr)

    label = st.text("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ09",
                    min_size=1, max_size=8)
    urls = []
    for _ in range(data.draw(st.integers(1, 12))):
        scheme = data.draw(st.sampled_from(
            ["http", "https", "HTTP", "HTTPS", "Http"]))
        user = data.draw(st.sampled_from(["", "u@", "u:p@"]))
        host = ".".join(data.draw(st.lists(label, min_size=1, max_size=3)))
        port = data.draw(st.sampled_from(["", ":80", ":443", ":8080", ":9"]))
        path = data.draw(st.sampled_from(
            ["", "/", "/a", "/a/b", "/a/b/", "/a%20b"]))
        query = data.draw(st.sampled_from(["", "?x=1", "?x=1&y=2"]))
        frag = data.draw(st.sampled_from(["", "#f", "#f?notaquery=1"]))
        urls.append(f"{scheme}://{user}{host}{port}{path}{query}{frag}")

    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               ["id", "url"])
    rows = {r.id: r for r in df.selectExpr(
        "id",
        f"{url_host_expr('url')} as host",
        f"{url_port_expr('url')} as port",
        f"{url_path_expr('url')} as path").collect()}

    for i, u in enumerate(urls):
        ref = urlsplit(u)
        want_host = (ref.hostname or "")
        if want_host.startswith("www."):
            want_host = want_host[4:]
        assert rows[i].host == want_host, (u, rows[i].host, want_host)
        want_port = ("" if ref.port in (None, 80, 443)
                     else f":{ref.port}")
        assert rows[i].port == want_port, (u, rows[i].port, want_port)
        want_path = ref.path or "/"
        if want_path != "/" and want_path.endswith("/"):
            want_path = want_path[:-1]
        assert rows[i].path == want_path, (u, rows[i].path, want_path)


def _psl_reference_domain(host: str) -> str:
    """Independent pure-Python PSL matcher (the spec algorithm:
    exceptions first, then longest plain/wildcard rule, then the
    implicit default 1-label rule; registered domain = suffix + one
    label, or the host itself when it IS a suffix / single label).
    Deliberately NOT derived from either SQL form — the test's value
    is three implementations agreeing."""
    from pythonql_spark.operators.url import load_public_suffixes
    psl = load_public_suffixes()
    labels = host.split(".")
    n = len(labels)

    def tail(k):
        return ".".join(labels[n - k:]) if n >= k else None

    for k in (2, 3):                      # exception rules
        t = tail(k)
        if t and t in psl.get(("exc", k), ()):
            return t                      # suffix = rule minus 1 label
    suffix_len = 1                        # implicit default rule
    for k in (2, 3, 4, 5):                # longest match wins
        t = tail(k)
        if t and t in psl.get(("plain", k), ()):
            suffix_len = max(suffix_len, k)
    for k in (1, 2, 3, 4):                # wildcard *.X -> len(X)+1
        t = tail(k)
        if t and t in psl.get(("wild", k), ()):
            suffix_len = max(suffix_len, k + 1)
    if n <= suffix_len:
        return host
    return ".".join(labels[n - suffix_len - 1:])


@given(data=st.data())
@SLOW
def test_registered_domain_matches_reference_psl_algorithm(spark, data):
    """BOTH registered-domain forms (the IN-set expression and
    curate_urls' broadcast join) must agree with an independent
    pure-Python implementation of the PSL spec algorithm on
    RANDOMIZED hosts: random labels stacked under real PSL rules of
    every kind (plain 2-5, wildcard, exception, bare suffix) plus
    rule-free hosts taking the default rule."""
    import random as _random

    from pythonql_spark.operators.url import (curate_urls,
                                              load_public_suffixes,
                                              registered_domain_expr)
    psl = load_public_suffixes()
    rnd = _random.Random(data.draw(st.integers(0, 2**31)))
    label = st.text("abcdefghjkmnpqrstuvxyz0123456789",
                    min_size=1, max_size=6).filter(
                        lambda s: not s.startswith("www"))
    hosts = []
    for _ in range(data.draw(st.integers(3, 10))):
        kind = data.draw(st.sampled_from(
            ["plain2", "plain3", "plain4", "plain5", "wild", "exc",
             "bare", "default", "deep"]))
        extra = [data.draw(label)
                 for _ in range(data.draw(st.integers(0, 2)))]
        if kind.startswith("plain"):
            suf = rnd.choice(psl[("plain", int(kind[-1]))])
            hosts.append(".".join(extra + [suf]))
        elif kind == "wild":
            k = rnd.choice([1, 2, 3, 4])
            suf = rnd.choice(psl[("wild", k)])
            hosts.append(".".join(extra + [data.draw(label), suf]))
        elif kind == "exc":
            k = rnd.choice([2, 3])
            suf = rnd.choice(psl[("exc", k)])
            hosts.append(".".join(extra + [suf]))
        elif kind == "bare":                # host IS a public suffix
            hosts.append(rnd.choice(psl[("plain", rnd.choice([2, 3]))]))
        elif kind == "deep":
            hosts.append(".".join(
                [data.draw(label) for _ in range(5)] + ["example",
                                                        "com"]))
        else:
            hosts.append(".".join(extra + [data.draw(label)]))
    hosts = [h for h in hosts if not h.startswith("www.")]
    from hypothesis import assume
    assume(hosts)          # the www-filter can (rarely) drop them all

    df = spark.createDataFrame(
        [(i, h, f"https://{h}/x") for i, h in enumerate(hosts)],
        ["id", "host", "url"])
    expr_got = {r.id: r.d for r in df.selectExpr(
        "id", f"{registered_domain_expr('host', is_host=True)} as d")
        .collect()}
    join_got = {r.id: r.domain
                for r in curate_urls(df.select("id", "url")).collect()}
    for i, h in enumerate(hosts):
        want = _psl_reference_domain(h)
        assert expr_got[i] == want, ("expr", h, expr_got[i], want)
        assert join_got[i] == want, ("join", h, join_got[i], want)


@given(data=st.data())
@SLOW
def test_url_normalize_frontier_shapes_both_dialects(spark, data):
    """REAL crawl-frontier URL shapes — userinfo (``u@`` / ``u:p@`` /
    ``a:b:c@`` / percent-escaped), out-of-range ports (urllib REFUSES
    ports > 65535; a crawl must keep them as distinct origins, not
    crash or fold), percent escapes in the query KEY vs VALUE
    (unreserved, reserved, malformed), and ``+`` (a literal plus in
    RFC 3986, never a space) — round-trip the FULL curation path
    (gated percent decode -> normalize -> registered domain) with the
    Spark and DuckDB dialects agreeing string-for-string, plus
    shape-specific identities asserted directly."""
    from pythonql_spark.operators.url import (_is_http_expr,
                                              curate_urls,
                                              pct_decode_ctes,
                                              registered_domain_expr,
                                              url_normalize_expr)
    import duckdb

    label = st.text("abcdefghjkmnpqrstuvxyz01239", min_size=1,
                    max_size=6).filter(lambda s: not s.startswith("www"))
    urls = []
    for _ in range(data.draw(st.integers(4, 12))):
        scheme = data.draw(st.sampled_from(["http", "https", "HTTP"]))
        user = data.draw(st.sampled_from(
            ["", "u@", "u:p@", "a:b:c@", "%75ser:pw@"]))
        host = ".".join([data.draw(label) for _ in
                         range(data.draw(st.integers(1, 2)))]
                        + [data.draw(st.sampled_from(
                            ["com", "co.uk", "example.com"]))])
        port = data.draw(st.sampled_from(
            ["", ":80", ":443", ":8080", ":99999", ":6553500"]))
        path = data.draw(st.sampled_from(
            ["", "/", "/a%20b", "/a%2fb", "/a%zzb", "/a+b", "/%41bc"]))
        query = data.draw(st.sampled_from(
            ["", "?a%20b=1", "?k=v%26w", "?a+b=c+d", "?k=%41",
             "?utm_source=x&k=1", "?b=2&a=1"]))
        frag = data.draw(st.sampled_from(["", "#f"]))
        urls.append(f"{scheme}://{user}{host}{port}{path}{query}{frag}")

    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               ["id", "url"])
    got = {r.id: (r.url_norm, r.domain)
           for r in curate_urls(df).collect()}

    pct_frag, pct_last = pct_decode_ctes("with_url", ["id"])
    values = ", ".join(f"({i}, '{u}')" for i, u in enumerate(urls))
    duck = duckdb.sql(f"""
WITH with_url AS (SELECT * FROM (VALUES {values}) t(id, url)),
{pct_frag}
SELECT id, {url_normalize_expr('url_d', 'duck', raw='url')} AS url_norm,
       CASE WHEN {_is_http_expr('url', 'duck')}
            THEN {registered_domain_expr('url_d', dialect='duck')}
            ELSE CAST(NULL AS VARCHAR) END AS domain
FROM {pct_last}""").fetchall()
    for i, un, dom in duck:
        assert (un, dom) == got[i], ("dialect", urls[i], (un, dom),
                                     got[i])

    for i, u in enumerate(urls):
        un = got[i][0]
        auth = un.split("://", 1)[1].split("/", 1)[0]
        # userinfo (escaped or not) is never page identity
        assert "@" not in auth, (u, un)
        # default ports fold; ANY other numeric port — out-of-range
        # included — is a distinct origin and survives verbatim
        if ":99999" in u:
            assert auth.endswith(":99999"), (u, un)
        if ":6553500" in u:
            assert auth.endswith(":6553500"), (u, un)
        if ":80/" in u or u.endswith(":80") or ":443" in u:
            pass  # folded — covered by the dialect equality above
        # '+' is a literal plus in RFC 3986 paths/queries, not a space
        if "/a+b" in u:
            assert "/a+b" in un, (u, un)
        if "a+b=c+d" in u:
            assert "a+b=c+d" in un, (u, un)
        # malformed escape gates off the WHOLE decode — the broken
        # escape survives verbatim instead of cascading
        if "%zz" in u:
            assert "%zz" in un, (u, un)
        else:
            # unreserved escapes decode, reserved ones re-emit with
            # uppercase hex
            if "/%41bc" in u:
                assert "/Abc" in un, (u, un)
            if "?k=%41" in u:
                assert "k=A" in un, (u, un)
            if "/a%2fb" in u:
                assert "/a%2Fb" in un, (u, un)
            if "/a%20b" in u:
                assert "/a%20b" in un, (u, un)
