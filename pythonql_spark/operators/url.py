"""URL canonicalization and per-domain curation.

Web-crawl corpora (C4, RefinedWeb, Gopher's MassiveWeb) treat the URL
as a first-class curation signal: exact-dedup runs on the CANONICAL
url (scheme/host case, default ports, fragments, tracking params and
trailing slashes all denormalize the same page into many spellings),
and per-REGISTERED-DOMAIN caps stop a single template-heavy site from
dominating the mixture.  Reference scope: the reference engine has no
URL operators — this module is part of the beyond-reference
LLM-pipeline surface (SURVEY §2.5), like dedup.py and text.py.

Everything is scan-fused string expressions (no UDF, no shuffle until
the cap's WindowGroupLimit), written once and emitted for BOTH
dialects so the whole pipeline sits under the DuckDB value oracle:

* :func:`url_host_expr` / :func:`url_path_expr` / :func:`url_query_expr`
  — component extraction by regexp (identical regexp semantics in
  Spark and DuckDB).
* :func:`url_normalize_expr` — lowercase host, strip ``www.``, drop
  default ports / fragments, drop tracking params (``utm_*``,
  ``gclid``, ``fbclid``, ``ref``), SORT surviving params (param order
  is not page identity), strip the trailing slash except at root.
  Only ``http``/``https`` URLs are canonicalized: anything else in a
  real crawl frontier (``ftp:``, ``mailto:``, scheme-less garbage)
  passes through UNCHANGED, so distinct non-web strings never
  collapse onto one another (they would all have extracted an empty
  host and collided on ``https:///``).
* :func:`registered_domain_expr` — registered (pay-level) domain per
  the full Mozilla Public Suffix List, shipped as packaged data
  (``data/public_suffixes.csv``, compiled by scripts/compile_psl.py
  from the upstream ``public_suffix_list.dat``) and evaluated as
  flat ``IN`` sets — Spark turns a large ``IN`` into an O(1) hash
  ``InSet`` probe inside whole-stage codegen, so the lookup is
  scan-fused with no join and no shuffle at any corpus size.
* :func:`domain_cap` — keep the top-``n`` rows per registered domain
  (WindowGroupLimit: each map task ships at most n rows per domain).

CANONICAL-IDENTITY RULES (documented decisions, each tested):

* ``www.X`` and ``X`` are the same page (the ``www.`` prefix is
  stripped before anything else).  This intentionally extends to the
  PSL exception rule ``!www.ck`` — ``www.ck``'s registered domain
  computes from the stripped host ``ck``, a deliberate casualty of
  the www-folding identity.
* IDN hosts canonicalize to their LOWERCASE spelling as crawled:
  a punycode host (``XN--BCHER-KVA.example`` → ``xn--bcher-kva``...)
  is case-folded, but Unicode↔punycode conversion is NOT performed —
  full IDNA is not expressible as a scan-fused SQL expression, so
  the two encodings of one IDN host stay distinct identities.
* Percent-escapes are canonicalized (unreserved decoded, reserved
  hex-case-folded) ONLY for URLs whose every ``%`` starts a valid
  ``%XX`` escape.  A malformed URL (stray ``%``) passes through raw:
  decoding it could cascade (``%%341`` → ``%41`` → ``A``), making
  two byte-distinct malformed URLs collide; well-formedness also
  guarantees every ``%``-split piece the arithmetic decoder
  (:func:`pct_decode_expr`) sees starts with two hex digits.
"""

from __future__ import annotations

import csv
from functools import lru_cache
from pathlib import Path

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TRACKING_PARAM_RE = "^(utm_[a-z]+|gclid|fbclid|ref)="

_PSL_CSV = (Path(__file__).resolve().parent.parent
            / "data" / "public_suffixes.csv")


# every rule shape both registered-domain forms (the IN-set
# expression and curate_urls' broadcast join) know how to resolve —
# the current PSL uses exactly these; a future snapshot introducing
# a deeper rule must fail LOUDLY at load (extending the branch grid
# in registered_domain_expr + _psl_frame is a 3-line change each),
# never silently drop the rule in one form but crash the other
_PSL_SHAPES = frozenset(
    [("plain", n) for n in (2, 3, 4, 5)]
    + [("wild", n) for n in (1, 2, 3, 4)]
    + [("exc", n) for n in (2, 3)])


@lru_cache(maxsize=1)
def load_public_suffixes() -> dict:
    """The compiled Public Suffix List as ``{(kind, labels): (suffix,
    ...)}`` — ``kind`` is ``plain`` (exact rule), ``wild`` (the ``X``
    of a ``*.X`` rule) or ``exc`` (a ``!rule`` exception); values are
    SORTED tuples so the SQL emitted from them is deterministic
    across processes.  Swap ``data/public_suffixes.csv`` (recompile
    with scripts/compile_psl.py from a newer upstream snapshot) to
    update — it is data, not code; a snapshot with a rule shape
    outside ``_PSL_SHAPES`` raises here, in BOTH consumers, rather
    than resolving domains wrongly in one of them."""
    out: dict = {}
    with _PSL_CSV.open(newline="") as f:
        for row in csv.DictReader(f):
            key = (row["kind"], int(row["labels"]))
            if key not in _PSL_SHAPES:
                raise ValueError(
                    f"unsupported PSL rule shape {key} "
                    f"({row['suffix']!r}): extend the branch grid in "
                    "registered_domain_expr and _psl_frame for the "
                    "new depth, then update _PSL_SHAPES")
            out.setdefault(key, []).append(row["suffix"])
    return {k: tuple(sorted(v)) for k, v in out.items()}


def _is_http_expr(col: str, dialect: str = "spark") -> str:
    """Boolean: does the URL have an http/https scheme (the only URLs
    the canonicalizer claims — everything else passes through raw)."""
    if dialect == "spark":
        return f"{col} rlike '(?i)^https?://'"
    return f"regexp_matches({col}, '(?i)^https?://')"


def _hostport_expr(col: str) -> str:
    """``host[:port]`` of the URL: the authority component (scheme
    matched CASE-INSENSITIVELY — RFC 3986 schemes are; crawls contain
    ``HTTP://`` spellings) with any ``user:pass@`` userinfo stripped
    (everything up to the last ``@`` — credentials are not page
    identity, and naively stopping at the userinfo ``:`` would
    extract the username as the host)."""
    auth = f"regexp_extract({col}, '(?i)^https?://([^/?#]*)', 1)"
    return f"regexp_extract({auth}, '([^@]*)$', 1)"


def url_host_expr(col: str) -> str:
    """Lowercased host without a leading ``www.``, a port, or THE
    single trailing root dot (``example.com.`` is the FQDN spelling
    of ``example.com`` — same DNS name, same page; crawl frontiers
    contain both).  Exactly ONE dot is stripped: ``example.com..``
    is not a valid DNS name and must NOT fold onto the real page —
    only the one-root-dot spelling is an identity.  Bracketed IPv6
    literals extract whole (``[::1]`` — naively stopping at the
    first ``:`` would extract ``[`` and collide every IPv6 host onto
    one identity), and ONLY when the hostport is exactly ``[...]``
    or ``[...]:digits`` — anything after the ``]`` other than a
    numeric port (``[::1]x``, ``[::1]:abc``) is malformed and keeps
    the WHOLE hostport, so byte-distinct broken strings never
    collapse onto the real ``[::1]`` page.  The root-dot fold is a
    DNS-name identity and bracketed hosts are not DNS names, so it
    is skipped for ``[``-prefixed hosts (``[a::80.`` stays distinct
    from ``[a::80``).  The bracket scan uses standard
    ``position(...)`` because ``]`` cannot be spelled in one regex
    text both engines accept (Spark demands ``\\]``, DuckDB strings
    keep the backslash literal).  Valid in both dialects, never a
    UDF."""
    hp = _hostport_expr(col)
    plain = f"regexp_extract({hp}, '^([^:]*)', 1)"
    pos = f"position(']' in {hp})"
    # well-formed bracket literal: ']' is the last char, or followed
    # by a purely numeric ':port' (group 0 = whole match, '' if none
    # — identical semantics in Spark and DuckDB)
    tail_ok = (f"regexp_extract(substring({hp}, {pos} + 1), "
               f"'^:[0-9]+$', 0) != ''")
    raw = (f"case when {hp} like '[%' and {pos} > 0 "
           f"and ({pos} = length({hp}) or {tail_ok}) "
           f"then substring({hp}, 1, {pos}) "
           # unterminated or trailing-garbage bracket: keep the WHOLE
           # hostport, so two byte-distinct malformed '[...'-strings
           # never collide on a truncation
           f"when {hp} like '[%' then {hp} "
           f"else {plain} end")
    lowered = f"lower({raw})"
    host = (f"case when {lowered} like '[%' then {lowered} "
            f"else regexp_replace({lowered}, '[.]$', '') end")
    return (f"case when {host} like 'www.%' "
            f"then substring({host}, 5) else {host} end")


def url_port_expr(col: str) -> str:
    """Canonical port suffix: ``':8080'`` for an explicit NON-default
    port, ``''`` otherwise — distinct origins must stay distinct
    (``host:8080`` is not the same page as ``host``), while the
    default 80/443 spellings fold into the portless canonical."""
    port = f"regexp_extract({_hostport_expr(col)}, ':([0-9]+)$', 1)"
    return (f"case when {port} in ('', '80', '443') then '' "
            f"else concat(':', {port}) end")


def url_path_expr(col: str) -> str:
    """Path with the trailing slash stripped (except root ``/``);
    an empty path normalizes to ``/``.  http(s)-only, like every
    component extractor — non-web URLs never reach these (the
    normalizer passes them through raw)."""
    path = f"regexp_extract({col}, '(?i)^https?://[^/?#]*([^?#]*)', 1)"
    return (f"case when {path} = '' then '/' "
            f"when {path} != '/' and {path} like '%/' "
            f"then substring({path}, 1, length({path}) - 1) "
            f"else {path} end")


def url_query_expr(col: str, dialect: str = "spark") -> str:
    """Canonical query string: tracking params dropped, survivors
    sorted (param ORDER is not page identity), empty result -> ''.
    The ``?`` only counts BEFORE any ``#`` — a ``?`` inside the
    fragment (``/a#sec?b=2``) is fragment content, not a query."""
    q = f"regexp_extract({col}, '^[^#?]*[?]([^#]*)', 1)"
    if dialect == "spark":
        kept = (f"array_sort(filter(split({q}, '&'), "
                f"p -> p != '' and p not rlike '{TRACKING_PARAM_RE}'))")
        joined = f"array_join({kept}, '&')"
    else:
        kept = (f"list_sort(list_filter(string_split({q}, '&'), "
                f"p -> p != '' and not regexp_matches(p, "
                f"'{TRACKING_PARAM_RE}')))")
        joined = f"array_to_string({kept}, '&')"
    return f"coalesce({joined}, '')"


def url_normalize_expr(col: str, dialect: str = "spark",
                       raw: str | None = None) -> str:
    """Full canonical URL: ``https://host[:port]/path[?sorted-params]``
    — scheme folded to https and matched case-insensitively (crawls
    record both spellings of the same page), host lowercased /
    www-stripped, userinfo dropped, DEFAULT ports (80/443) dropped
    while explicit other ports are kept (different origin, different
    page), fragment dropped, query canonicalized.

    Non-http(s) input (``ftp:``, ``mailto:``, scheme-less strings)
    yields ``raw`` (default: ``col``) UNCHANGED — such strings have
    no https-authority, and canonicalizing them would collapse every
    distinct one onto ``https:///...`` (a real crawl frontier is full
    of them).  Pass ``raw`` when ``col`` is a pre-decoded staging of
    the original column so the fallback is the original bytes; the
    http test then runs on ``raw`` TOO: the scheme must be literal in
    the original string (``htt%70://x`` is not an http URL and must
    not decode its way into colliding with ``http://x`` — decoding
    never alters a genuinely literal scheme, so gating on the raw
    side costs nothing for real URLs)."""
    fallback = raw or col
    host = url_host_expr(col)
    port = url_port_expr(col)
    path = url_path_expr(col)
    q = url_query_expr(col, dialect)
    canonical = (f"concat('https://', {host}, {port}, {path}, "
                 f"case when {q} = '' then '' else concat('?', {q}) end)")
    return (f"case when {_is_http_expr(fallback, dialect)} "
            f"then {canonical} else {fallback} end")


def _is_ip_host_expr(host: str, dialect: str = "spark") -> str:
    """Boolean: the host is an IP literal — dotted-quad IPv4 or a
    bracketed IPv6 — which the PSL explicitly does not cover: an IP
    is its own registration identity, never 'last labels' (the
    default rule would group every 1.2.x.y crawl host under 'x.y')."""
    v4 = "^([0-9]{1,3}[.]){3}[0-9]{1,3}$"
    m = (f"{host} rlike '{v4}'" if dialect == "spark"
         else f"regexp_matches({host}, '{v4}')")
    return f"({m} or {host} like '[%')"


def _tail_expr(host: str, k: int) -> str:
    """The last ``k`` dot-separated labels of ``host`` ('' when the
    host has fewer than k labels) — ``$``-anchored regexp, so it is
    bounds-safe in both dialects (no element_at, which raises
    out-of-bounds under Spark's ANSI mode).  Leftmost-match semantics
    guarantee full labels: a match can only start at the string start
    or after a dot, because a mid-label start is always beaten by the
    same match extended left to the label start."""
    if k == 1:
        return f"regexp_extract({host}, '([^.]+)$', 1)"
    return (f"regexp_extract({host}, "
            f"'((?:[^.]+[.]){{{k - 1}}}[^.]+)$', 1)")


def registered_domain_expr(col_or_host: str, *, is_host: bool = False,
                           dialect: str = "spark") -> str:
    """Registered (pay-level) domain of a URL or host expression per
    the full Public Suffix List: the matched public suffix plus one
    more label — ``news.bbc.co.uk`` → ``bbc.co.uk``, ``foo.github.io``
    → ``foo.github.io`` (private-section rules included), any-label
    wildcards (``*.ck``) and exceptions (``!www.ck``, modulo the
    www-stripping identity documented in the module docstring)
    handled.  A host that IS a public suffix, or a single label
    (``localhost``), returns itself; so does an IP-LITERAL host
    (dotted-quad IPv4 or bracketed IPv6 — the PSL does not cover
    IPs, and the default rule would otherwise group every
    ``1.2.x.y`` crawl host under ``x.y``).

    Longest match wins, exceptions first (PSL algorithm); unmatched
    hosts take the implicit default rule (1-label suffix).  Each rule
    set is one flat ``IN`` list: Spark compiles it to an ``InSet``
    hash probe (O(1) per row, whole-stage codegen, no join), DuckDB
    binds it as a constant set — the ~8k-entry SQL text is a
    one-time driver parse, not a per-row cost."""
    host = col_or_host if is_host else url_host_expr(col_or_host)
    psl = load_public_suffixes()
    t = {k: _tail_expr(host, k) for k in range(1, 7)}

    def mem(kind: str, labels: int) -> str:
        vals = psl.get((kind, labels), ())
        if not vals:
            return "false"
        quoted = ", ".join("'" + v.replace("'", "''") + "'"
                           for v in vals)
        return f"{t[labels]} in ({quoted})"

    def reg(k: int) -> str:                # suffix of k labels matched
        return (f"case when {t[k + 1]} = '' then {host} "
                f"else {t[k + 1]} end")

    branches = [
        (_is_ip_host_expr(host, dialect), host),
        (mem("exc", 2), t[2]),
        (mem("exc", 3), t[3]),
        (f"{mem('plain', 5)} or {mem('wild', 4)}", reg(5)),
        (f"{mem('plain', 4)} or {mem('wild', 3)}", reg(4)),
        (f"{mem('plain', 3)} or {mem('wild', 2)}", reg(3)),
        (f"{mem('plain', 2)} or {mem('wild', 1)}", reg(2)),
    ]
    whens = " ".join(f"when {c} then {r}" for c, r in branches)
    return f"case {whens} else {reg(1)} end"


_PSL_FRAME_CACHE: dict = {}


def _psl_frame(spark):
    """The PSL as ONE broadcast-join build side for
    :func:`curate_urls`, keyed by each rule's last-2-label tail:
    ``(__pslk, __p2b, __w2b, __e2b, __ap3, __aw3, __ae3, __ap4,
    __aw4, __ap5)`` — the boolean columns are the 2-label rule kinds
    for the key itself, the arrays hold the ≥3-label rules sharing
    that tail (groups are tiny — a handful of geo/SaaS rules each),
    probed with ``array_contains`` against the host's longer tails.

    The join form exists because the 8k-literal ``InSet`` expression,
    while O(1) per row, makes a ~130 KB plan tree costing ~1 s of
    driver time PER EXECUTION once windows + AQE walk it, and five
    separate per-length broadcast joins cost ~0.2 s of exchange setup
    EACH (both measured at sf0.1); one ≤7k-row broadcast keeps plan
    and exchange overhead at a single small constant, stays stateless
    (stream-static joins work in append-mode streaming), and probes
    the same hash semantics.  Cached per session — ONE entry: a new
    session evicts (and best-effort unpersists) the previous one, so
    a long-lived process cycling sessions never accumulates dead
    session graphs behind id() keys."""
    key = id(spark)
    if key not in _PSL_FRAME_CACHE:
        for old_key in list(_PSL_FRAME_CACHE):
            old = _PSL_FRAME_CACHE.pop(old_key)
            try:
                old.unpersist()
            except Exception:
                pass                       # stale/stopped session
        from pyspark.sql.types import (ArrayType, BooleanType,
                                       StringType, StructField,
                                       StructType)
        psl = load_public_suffixes()
        by_key: dict = {}

        def ent(suffix: str) -> dict:
            tail2 = ".".join(suffix.split(".")[-2:])
            return by_key.setdefault(tail2, {
                "p2": False, "w2": False, "e2": False,
                "p3": [], "w3": [], "e3": [], "p4": [], "w4": [],
                "p5": []})

        for (kind, labels), suffixes in sorted(psl.items()):
            if labels == 1:
                continue                   # wild1 is a 9-entry IN list
            for s in suffixes:
                e = ent(s)
                if labels == 2:
                    e[kind[0] + "2"] = True
                else:
                    e[f"{kind[0]}{labels}"].append(s)
        schema = StructType(
            [StructField("__pslk", StringType())]
            + [StructField(f"__{f}b", BooleanType())
               for f in ("p2", "w2", "e2")]
            + [StructField(f"__a{f}", ArrayType(StringType()))
               for f in ("p3", "w3", "e3", "p4", "w4", "p5")])
        rows = [(k, e["p2"], e["w2"], e["e2"], e["p3"], e["w3"],
                 e["e3"], e["p4"], e["w4"], e["p5"])
                for k, e in sorted(by_key.items())]
        from pythonql_spark.helpers import local_rows_df
        frame = local_rows_df(spark, rows, schema).cache()
        frame.count()                      # materialize once per session
        _PSL_FRAME_CACHE[key] = frame
    return _PSL_FRAME_CACHE[key]


def pct_wellformed_expr(col: str, dialect: str = "spark") -> str:
    """Boolean: every ``%`` in the URL starts a valid ``%XX`` hex
    escape (remove all ``%XX`` and no ``%`` survives).  Gates the
    percent-canonicalization: decoding a malformed URL could cascade
    (an early replace synthesizing a new escape a later replace
    consumes), falsely colliding byte-distinct strings — malformed
    URLs therefore pass through raw."""
    flags = "" if dialect == "spark" else ", 'g'"
    return (f"not contains(regexp_replace({col}, "
            f"'%[0-9A-Fa-f]{{2}}', ''{flags}), '%')")


def curate_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``url_norm`` and ``domain`` columns — one scan, pure
    expressions, ready for exact dedup on ``url_norm`` (the canonical
    identity) and for :func:`domain_cap`.  Unreserved percent-escapes
    are decoded FIRST (one :func:`pct_decode_expr` pass staged as a
    column), gated on :func:`pct_wellformed_expr` so
    malformed escapes never cascade; escaped HOSTS fold too
    (``example%2Ecom`` → ``example.com`` — the decode runs on the
    whole string before component extraction).  Non-http(s) rows keep
    their raw string as ``url_norm`` and get a NULL ``domain``.

    ``domain`` resolves against the full PSL via ONE broadcast hash
    join (see :func:`_psl_frame` for why not the inline ``InSet``
    form :func:`registered_domain_expr` emits, nor per-length joins)
    — stateless, so the same plan runs unchanged inside append-mode
    streams; the plan-gate test asserts zero data exchanges and
    exactly one broadcast join."""
    staged = df.selectExpr(
        "*",
        f"case when {pct_wellformed_expr(url_col)} "
        f"then {pct_decode_expr(url_col)} else {url_col} end as __u")
    out = staged.selectExpr(
        "*", f"{url_normalize_expr('__u', raw=url_col)} as url_norm",
        f"{url_host_expr('__u')} as __h")
    out = out.selectExpr(
        "*", *[f"{_tail_expr('__h', k)} as __t{k}" for k in range(1, 7)])
    frame = _psl_frame(df.sparkSession)
    out = out.join(F.broadcast(frame),
                   out["__t2"] == frame["__pslk"], "left")

    def g(c: str) -> str:
        return f"coalesce({c}, false)"

    def arr(a: str, t: int) -> str:
        return f"coalesce(array_contains({a}, __t{t}), false)"

    def reg(k: int) -> str:
        return f"case when __t{k + 1} = '' then __h else __t{k + 1} end"

    wild1 = load_public_suffixes().get(("wild", 1), ())
    # SQL-quote with ''-escaping (same as registered_domain_expr's
    # mem() helper) — Python repr() would emit a DOUBLE-quoted
    # (identifier) literal for a suffix containing a quote
    quoted1 = ", ".join("'" + s.replace("'", "''") + "'"
                        for s in wild1)
    w1 = f"__t1 in ({quoted1})" if wild1 else "false"
    dom = (f"case when {_is_ip_host_expr('__h')} then __h "
           f"when {g('__e2b')} then __t2 "
           f"when {arr('__ae3', 3)} then __t3 "
           f"when {arr('__ap5', 5)} or {arr('__aw4', 4)} then {reg(5)} "
           f"when {arr('__ap4', 4)} or {arr('__aw3', 3)} then {reg(4)} "
           f"when {arr('__ap3', 3)} or {g('__w2b')} then {reg(3)} "
           f"when {g('__p2b')} or {w1} then {reg(2)} "
           f"else {reg(1)} end")
    return out.selectExpr(
        *df.columns, "url_norm",
        f"case when {_is_http_expr(url_col)} then {dom} "
        f"else cast(null as string) end as domain")


def domain_cap(df: DataFrame, n: int, *,
               url_col: str = "url",
               order: list[str] | None = None) -> DataFrame:
    """Keep at most ``n`` rows per REGISTERED DOMAIN, best-first —
    the RefinedWeb-style cap that stops template-heavy sites from
    dominating the corpus.  Plans as WindowGroupLimit: each map task
    ships at most n rows per domain, so the shuffle is bounded by
    n * |domains| * tasks regardless of corpus size.

    Non-http(s) rows have a NULL domain (see :func:`curate_urls`)
    and NULLs form ONE window partition, so ALL such rows share a
    single cap bucket: at most ``n`` pieces of schemeless/ftp/mailto
    frontier garbage survive in total.  That is the intended
    curation behavior — a crawl mixture should not carry unbounded
    non-web strings — and it is pinned by test; filter
    ``domain IS NOT NULL`` first to drop them entirely, or cap the
    raw frontier before canonicalization to keep them all."""
    from pythonql_spark.operators.topk import _order_cols
    out = curate_urls(df, url_col)
    w = Window.partitionBy("domain").orderBy(
        *_order_cols(order or [url_col]))
    return (out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n).drop("__rn"))


# ------------------- percent-encoding normalization (r9; r10 form)

def pct_decode_expr(col: str, dialect: str = "spark") -> str:
    """ONE expression computing the full percent-canonicalization
    ARITHMETICALLY — split on ``%``, then for each piece decide from
    the leading two hex digits' code point whether to

    1. decode (UNRESERVED characters, RFC 3986: A-Z a-z 0-9 - . _ ~;
       hex case folded — ``%41``/``%4a`` become the literal ``A``), or
    2. re-emit the escape with UPPERCASE hex (``%2f``/``%2F``
       spellings of the same reserved byte normalize to one form
       WITHOUT being decoded — RFC 3986 §6.2.2.1: escape hex digits
       are case-insensitive; decoding reserved bytes would change
       which characters act as delimiters).

    Apply only to escape-WELL-FORMED input (:func:`pct_wellformed_expr`
    gates it in every consumer): well-formedness guarantees every
    post-split piece starts with two hex digits.  This replaced the
    r9 ~450-literal replace chain, which needed parser-depth staging
    (Spark ~150 / DuckDB 128 nesting caps) and cost real per-batch
    incremental-planning time in streams; the arithmetic form is a
    single small expression with identical output (parity pinned by
    the pct test matrix in both dialects)."""
    if dialect == "spark":
        code = "conv(substring(p, 1, 2), 16, 10)"
        chrf, parts = "char", f"split({col}, '[%]')"
        rest = (f"slice({parts}, 2, "
                f"greatest(size({parts}) - 1, 0))")
        join = "array_join(transform({rest}, {piece}), '')"
        first = f"element_at({parts}, 1)"
    else:
        code = "cast(concat('0x', substring(p, 1, 2)) as int)"
        chrf, parts = "chr", f"string_split({col}, '%')"
        rest = f"{parts}[2:]"
        join = "array_to_string(list_transform({rest}, {piece}), '')"
        first = f"{parts}[1]"
    unres = (f"({code} between 48 and 57 or {code} between 65 and 90 "
             f"or {code} between 97 and 122 "
             f"or {code} in (45, 46, 95, 126))")
    piece = (f"p -> concat(case when {unres} then {chrf}({code}) "
             f"else concat('%', upper(substring(p, 1, 2))) end, "
             f"substring(p, 3))")
    return (f"concat({first}, "
            f"{join.format(rest=rest, piece=piece)})")


def pct_decode_ctes(source_cte: str, cols: list[str],
                    url_col: str = "url",
                    out_col: str = "url_d") -> tuple:
    """(cte_sql_fragment, final_cte_name) applying the gated decode
    in DuckDB SQL: ``out_col`` is the canonicalized url for
    escape-well-formed rows and the raw ``url_col`` otherwise —
    mirror of :func:`curate_urls`'s staging.  ``cols`` pass through
    unchanged, as does ``url_col`` itself (downstream gates test the
    raw string)."""
    passthru = ", ".join(dict.fromkeys(list(cols) + [url_col]))
    ok = pct_wellformed_expr(url_col, "duck")
    frag = (f"__pctg AS (SELECT {passthru}, "
            f"CASE WHEN {ok} THEN {pct_decode_expr(url_col, 'duck')} "
            f"ELSE {url_col} END AS {out_col} FROM {source_cte})")
    return frag, "__pctg"
