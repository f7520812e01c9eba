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
* :func:`registered_domain_expr` — last-two-labels heuristic with an
  explicit multi-part-suffix list (``co.uk`` …): the deterministic
  core of the public-suffix rule (the full PSL is a data file, not an
  algorithm — swap the list for it in production).
* :func:`domain_cap` — keep the top-``n`` rows per registered domain
  (WindowGroupLimit: each map task ships at most n rows per domain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# multi-part public suffixes the last-two-label rule would get wrong.
# Deliberately a SMALL explicit list (deterministic, oracle-mirrorable);
# production swaps in the full public-suffix list as a data file.
MULTIPART_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.in", "co.kr", "com.br", "com.mx", "com.cn",
)

TRACKING_PARAM_RE = "^(utm_[a-z]+|gclid|fbclid|ref)="


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
    """Lowercased host without a leading ``www.`` or port — valid in
    both dialects (regexp component split, never a UDF)."""
    host = f"lower(regexp_extract({_hostport_expr(col)}, '^([^:]*)', 1))"
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
    an empty path normalizes to ``/``."""
    path = f"regexp_extract({col}, '(?i)^[a-z]+://[^/?#]*([^?#]*)', 1)"
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


def url_normalize_expr(col: str, dialect: str = "spark") -> str:
    """Full canonical URL: ``https://host[:port]/path[?sorted-params]``
    — scheme folded to https and matched case-insensitively (crawls
    record both spellings of the same page), host lowercased /
    www-stripped, userinfo dropped, DEFAULT ports (80/443) dropped
    while explicit other ports are kept (different origin, different
    page), fragment dropped, query canonicalized."""
    host = url_host_expr(col)
    port = url_port_expr(col)
    path = url_path_expr(col)
    q = url_query_expr(col, dialect)
    return (f"concat('https://', {host}, {port}, {path}, "
            f"case when {q} = '' then '' else concat('?', {q}) end)")


def registered_domain_expr(col_or_host: str, *, is_host: bool = False,
                           dialect: str = "spark") -> str:
    """Registered (pay-level) domain of a URL or host expression:
    last two labels, or last THREE when the two-label tail is a
    known multi-part public suffix (``foo.co.uk`` → ``foo.co.uk``,
    not ``co.uk``)."""
    host = col_or_host if is_host else url_host_expr(col_or_host)
    if dialect == "spark":
        labels = f"split({host}, '[.]')"
        el = lambda i: f"element_at({labels}, {i})"  # noqa: E731
        size = f"size({labels})"
    else:
        labels = f"string_split({host}, '.')"
        el = lambda i: f"{labels}[{i}]"              # noqa: E731
        size = f"len({labels})"
    tail2 = f"concat({el(-2)}, '.', {el(-1)})"
    tail3 = f"concat({el(-3)}, '.', {tail2})"
    suffixes = ", ".join(f"'{s}'" for s in MULTIPART_SUFFIXES)
    return (f"case when {size} >= 3 and {tail2} in ({suffixes}) "
            f"then {tail3} "
            f"when {size} >= 2 then {tail2} else {host} end")


def curate_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``url_norm`` and ``domain`` columns — one scan, pure
    expressions, ready for exact dedup on ``url_norm`` (the canonical
    identity) and for :func:`domain_cap`.  Unreserved percent-escapes
    are decoded FIRST (one :func:`pct_decode_expr` pass staged as a
    column so the replace chain evaluates once per row, not once per
    component extractor), so ``%41``/``%61`` spellings fold into the
    same canonical page as their literal characters."""
    staged, cur = df, url_col
    for i in range(N_PCT_STAGES):
        staged = staged.selectExpr(
            "*", f"{pct_decode_stage_expr(cur, i)} as __pd{i}")
        cur = f"__pd{i}"
    return staged.selectExpr(
        *df.columns,
        f"{url_normalize_expr(cur)} as url_norm",
        f"{registered_domain_expr(cur)} as domain")


def domain_cap(df: DataFrame, n: int, *,
               url_col: str = "url",
               order: list[str] | None = None) -> DataFrame:
    """Keep at most ``n`` rows per REGISTERED DOMAIN, best-first —
    the RefinedWeb-style cap that stops template-heavy sites from
    dominating the corpus.  Plans as WindowGroupLimit: each map task
    ships at most n rows per domain, so the shuffle is bounded by
    n * |domains| * tasks regardless of corpus size."""
    from pythonql_spark.operators.topk import _order_cols
    out = curate_urls(df, url_col)
    w = Window.partitionBy("domain").orderBy(
        *_order_cols(order or [url_col]))
    return (out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n).drop("__rn"))


# ---------------------------- percent-encoding normalization (r9)

def _pct_replaces() -> list:
    """The full percent-canonicalization replace list, in a FIXED
    deterministic order (sorted byte then spelling — a Python set
    here would randomize the emitted SQL text per process via
    PYTHONHASHSEED even though the values agree):

    1. decode ``%XX`` escapes of UNRESERVED characters (RFC 3986:
       A-Z a-z 0-9 - . _ ~), hex case folded — ``%41``/``%4a`` become
       the literal ``A``;
    2. fold the hex-digit case of every REMAINING escape to uppercase
       — ``%2f``/``%2F`` spellings of the same reserved byte
       normalize to one form WITHOUT being decoded (RFC 3986
       §6.2.2.1: escape hex digits are case-insensitive; decoding
       reserved bytes would change which characters act as
       delimiters, so they stay encoded but case-canonical).
    """
    out = []
    unreserved = sorted(
        list(range(0x41, 0x5B)) + list(range(0x61, 0x7B))
        + list(range(0x30, 0x3A)) + [0x2D, 0x2E, 0x5F, 0x7E])
    for b in unreserved:
        for h in sorted({f"{b:02X}", f"{b:02x}"}):
            out.append((f"%{h}", chr(b)))
    for b in range(0x100):
        if b in unreserved:
            continue
        hi, lo = f"{b:02X}"[0], f"{b:02X}"[1]
        canonical = hi + lo
        for v in sorted({hi.lower() + lo, hi + lo.lower(),
                         hi.lower() + lo.lower()} - {canonical}):
            out.append((f"%{v}", f"%{canonical}"))
    return out


# Spark's SQL parser rejects expression trees much deeper than ~150
# nested calls ([FAILED_TO_PARSE_TOO_COMPLEX]), so the ~450-replace
# chain is applied in bounded STAGES: each stage is one expression a
# parser handles, chained through staged columns (Spark) or CTEs
# (the DuckDB oracle).
_PCT_STAGE_SIZE = 120
N_PCT_STAGES = (len(_pct_replaces()) + _PCT_STAGE_SIZE - 1) \
    // _PCT_STAGE_SIZE


def pct_decode_stage_expr(expr: str, stage: int) -> str:
    """The ``stage``-th bounded slice of the percent-canonicalization
    replace chain, applied to ``expr`` — identical in both dialects.
    Apply stages 0..N_PCT_STAGES-1 in order (each to the previous
    stage's output) for the full canonicalization."""
    out = expr
    lo = stage * _PCT_STAGE_SIZE
    for pat, rep in _pct_replaces()[lo:lo + _PCT_STAGE_SIZE]:
        rep_sql = rep.replace("'", "''")
        out = f"replace({out}, '{pat}', '{rep_sql}')"
    return out


def pct_decode_ctes(source_cte: str, cols: list[str],
                    url_col: str = "url",
                    out_col: str = "url_d") -> tuple:
    """(cte_sql_fragment, final_cte_name) applying the full staged
    chain in SQL — Spark's parser AND DuckDB's binder both cap
    expression nesting (~150 / 128), so the single-expression form of
    the ~450-replace chain is not parseable anywhere; every consumer
    goes through stages.  ``cols`` are passed through unchanged."""
    passthru = ", ".join(cols)
    frags, prev, cur_col = [], source_cte, url_col
    for i in range(N_PCT_STAGES):
        name = f"__pct{i}"
        alias = out_col if i == N_PCT_STAGES - 1 else f"__pd{i}"
        frags.append(
            f"{name} AS (SELECT {passthru}, "
            f"{pct_decode_stage_expr(cur_col, i)} AS {alias} "
            f"FROM {prev})")
        prev, cur_col = name, alias
    return ",\n".join(frags), prev
