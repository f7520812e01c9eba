"""Text-analysis operators for training-data pipelines.

All of these are pure JVM-side column expressions (whole-stage
codegen, no Python in the hot path).  Every formula is emitted in two
dialects — ``spark`` and ``duck`` — from the same definition, so the
driver's DuckDB oracle hash-matches values exactly.  Dialect deltas:
``size``/``len``, ``array_contains``/``list_contains``, regex escapes
and DuckDB's explicit ``'g'`` flag on regexp_replace.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic per-language stopword lists for the stopword-hit
# language-ID heuristic (ASCII, lower-case)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "une", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "den", "mit", "auf", "ist"],
}

# BPE-ish token regex: letter runs, single digits, punctuation marks
_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def _ws(dialect: str) -> str:
    # whitespace regex as it must appear inside a SQL string literal
    return "\\\\s+" if dialect == "spark" else "\\s+"


def words(col: str = "text", dialect: str = "spark") -> str:
    if dialect == "spark":
        return f"split(trim({col}), '{_ws(dialect)}')"
    return f"str_split_regex(trim({col}), '{_ws(dialect)}')"


def token_count(col: str = "text", dialect: str = "spark") -> str:
    """Whitespace token count (bigint in both dialects)."""
    fn = "size" if dialect == "spark" else "len"
    return f"cast({fn}({words(col, dialect)}) as bigint)"


def bpe_token_count(col: str = "text", dialect: str = "spark") -> str:
    """BPE-ish token estimate via regex extraction."""
    if dialect == "spark":
        return f"cast(size(regexp_extract_all({col}, '{_TOKEN_RE}', 0)) as bigint)"
    return f"cast(len(regexp_extract_all({col}, '{_TOKEN_RE}')) as bigint)"


def stopword_hits(col: str, lang: str, dialect: str = "spark") -> str:
    """Count of the language's stopwords present (per-word containment
    sum — no set-semantics pitfalls)."""
    contains = "array_contains" if dialect == "spark" else "list_contains"
    w = words(col, dialect)
    terms = " + ".join(
        f"cast({contains}({w}, '{s}') as int)" for s in STOPWORDS[lang])
    return f"({terms})"


def lang_id(col: str = "text", dialect: str = "spark") -> str:
    """Argmax of per-language stopword hits; ties go to the first
    language code in sorted order; 'und' when nothing matches."""
    scores = {lang: stopword_hits(col, lang, dialect)
              for lang in sorted(STOPWORDS)}
    best = f"greatest({', '.join(scores.values())})"
    return (f"CASE WHEN {best} = 0 THEN 'und' "
            + " ".join(f"WHEN {scores[lang]} = {best} THEN '{lang}'"
                       for lang in sorted(STOPWORDS))
            + " ELSE 'und' END")


def _regexp_replace(col: str, pat: str, rep: str, dialect: str) -> str:
    if dialect == "spark":
        return f"regexp_replace({col}, '{pat}', '{rep}')"
    return f"regexp_replace({col}, '{pat}', '{rep}', 'g')"


def quality_score(col: str = "text", dialect: str = "spark") -> str:
    """Heuristic quality in [0,1]: length factor, word-count factor,
    alpha ratio, English-stopword factor.  Single deterministic double
    ops in a fixed order — bit-identical across engines."""
    n_chars = f"length({col})"
    n_words = token_count(col, dialect)
    alpha = f"length({_regexp_replace(col, '[^A-Za-z]', '', dialect)})"
    stop = stopword_hits(col, "en", dialect)
    return (
        f"cast(round("
        f"0.25 * least(cast({n_chars} as double) / 500.0, 1.0) + "
        f"0.25 * least(cast({n_words} as double) / 100.0, 1.0) + "
        f"0.25 * (cast({alpha} as double) / cast(greatest({n_chars}, 1) as double)) + "
        f"0.25 * least(cast({stop} as double) / 5.0, 1.0)"
        f", 6) as double)"
    )


def _pat(p: str, dialect: str) -> str:
    # a regex as it must appear inside a SQL string literal: Spark's
    # parser consumes one level of backslash escaping, DuckDB's doesn't
    return p.replace("\\", "\\\\") if dialect == "spark" else p


def ngram_list(col: str = "text", n: int = 3, dialect: str = "spark") -> str:
    """Word n-gram shingles of case-folded text as an array/list
    expression (docs shorter than ``n`` words yield one whole-text
    shingle).  The Spark form binds the word array once as a lambda
    variable — higher-order functions run interpreted with no common
    subexpression elimination, so a bare CASE referencing the split
    four times would re-split per reference."""
    if dialect == "spark":
        body = (f"CASE WHEN size(w) < {n} THEN array(concat_ws(' ', w)) "
                f"ELSE transform(sequence(1, size(w) - {n} + 1), "
                f"i -> concat_ws(' ', slice(w, i, {n}))) END")
        return (f"transform(array(split(trim(lower({col})), '{_ws('spark')}')), "
                f"w -> {body})[0]")
    w = f"str_split_regex(trim(lower({col})), '{_ws('duck')}')"
    return (f"CASE WHEN len({w}) < {n} THEN [array_to_string({w}, ' ')] "
            f"ELSE list_transform(range(1, len({w}) - {n} + 2), "
            f"i -> array_to_string(list_slice({w}, i, i + {n} - 1), ' ')) END")


# PII / noise patterns (plain regex; _pat handles literal escaping).
# Kept to constructs with identical semantics in Java regex and RE2.
_URL_PAT = "https?://[^\\s]+"
_EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_PAT = "\\+?[0-9][0-9() -]{6,}[0-9]"


def scrub_pii(col: str = "text", dialect: str = "spark") -> str:
    """Mask emails and phone-number-shaped runs with typed tokens."""
    e = _regexp_replace(col, _pat(_EMAIL_PAT, dialect), "<EMAIL>", dialect)
    return _regexp_replace(e, _pat(_PHONE_PAT, dialect), "<PHONE>", dialect)


def clean_text(col: str = "text", dialect: str = "spark") -> str:
    """Pipeline normalization: drop URLs, mask PII, collapse
    whitespace, trim."""
    no_url = _regexp_replace(col, _pat(_URL_PAT, dialect), "", dialect)
    scrubbed = scrub_pii(no_url, dialect)
    collapsed = _regexp_replace(scrubbed, _ws(dialect), " ", dialect)
    return f"trim({collapsed})"


def repetition_ratio(col: str = "text", dialect: str = "spark",
                     unit: str = "word") -> str:
    """Repeated-content ratio in [0,1]: 1 - distinct/total over words
    (case-folded) or lines.  High values flag boilerplate/spam docs."""
    if unit == "word":
        parts = words(f"lower({col})", dialect)
    elif unit == "line":
        nl = _pat("\\n+", dialect)
        if dialect == "spark":
            parts = f"split(trim({col}), '{nl}')"
        else:
            parts = f"str_split_regex(trim({col}), '{nl}')"
    else:
        raise ValueError(f"unit must be word|line, got {unit!r}")
    fn = "size" if dialect == "spark" else "len"
    distinct = "array_distinct" if dialect == "spark" else "list_distinct"
    return (f"cast(round(1.0 - cast({fn}({distinct}({parts})) as double) / "
            f"cast(greatest({fn}({parts}), 1) as double), 6) as double)")


def fingerprint(col: str = "text", dialect: str = "spark") -> str:
    """Document fingerprint: md5 of case-folded, whitespace-collapsed
    text (the exact-dedup key)."""
    inner = _regexp_replace(col, _ws(dialect), " ", dialect)
    return f"md5(lower(trim({inner})))"


def unigram_logprob(df, text_col: str = "text",
                    id_col: str = "doc_id") -> "DataFrame":
    """Per-document mean unigram log-probability under the corpus's
    own unigram LM — the classic cheap perplexity proxy for quality
    filtering (low = rare-token gibberish, high = common fluent text).

    Spark shape: ONE explode of lowered whitespace tokens feeds both
    the frequency table (groupBy token, map-side combined) and the
    scoring join (shuffle on token, then groupBy doc).  All arithmetic
    is JVM expressions; the per-token log-prob is rounded to
    decimal(20,10) before the exact decimal sum so results are
    bit-identical to the DuckDB oracle regardless of summation order
    or libm ulp differences.
    """
    from pyspark.sql import functions as F
    toks = (df.select(id_col, F.explode(
        F.expr(words(f"lower({text_col})"))).alias("tok"))
        .filter("tok != ''"))
    toks = toks.localCheckpoint(eager=False)  # explode once, use twice
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    # total token count straight from toks — NOT sum(freq.cnt), which
    # would re-run the by-token shuffle a second time (freq feeds the
    # broadcast join below and isn't checkpointed)
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    scored = (toks.join(freq, "tok")
              .crossJoin(F.broadcast(total))
              .select(id_col, F.expr(
                  "cast(ln(cnt / total) as decimal(20,10))").alias("lp")))
    return (scored.groupBy(id_col)
            .agg(F.expr("cast(cast(sum(lp) as double) / count(lp) as double)")
                 .alias("mean_logprob"),
                 F.count(F.lit(1)).cast("bigint").alias("n_tokens")))


def unigram_logprob_oracle_sql(text_col: str = "text",
                               id_col: str = "doc_id",
                               table: str = "documents") -> str:
    """DuckDB mirror of `unigram_logprob` (same rounding, exact sums)."""
    w = words(f"lower({text_col})", "duck")
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({w}) AS tok FROM {table}),
t2 AS (SELECT * FROM toks WHERE tok <> ''),
freq AS (SELECT tok, count(*) AS cnt FROM t2 GROUP BY tok),
total AS (SELECT sum(cnt) AS total FROM freq),
scored AS (
  SELECT {id_col}, cast(ln(cnt / total) as decimal(20,10)) AS lp
  FROM t2 JOIN freq USING (tok) CROSS JOIN total)
SELECT {id_col}, cast(cast(sum(lp) as double) / count(lp) as double) AS mean_logprob,
       cast(count(lp) as bigint) AS n_tokens
FROM scored GROUP BY {id_col}"""


def remove_boilerplate(df, id_col: str = "doc_id",
                       text_col: str = "text", *,
                       min_doc_frac: float = 0.2,
                       min_docs: int = 2,
                       delim: str = "\n") -> "DataFrame":
    """Corpus-level boilerplate removal (C4/RefinedWeb-style): drop
    text segments (lines by default) that appear, normalized, in at
    least ``min_doc_frac`` of docs (and ``min_docs`` absolutely) —
    nav bars, cookie banners, license footers.

    Scale shape: explode segments → per-segment distinct-doc count via
    ONE groupBy on the segment hash (map-side partial agg; the
    shuffle carries hashes, not text) → the frequent-segment set is
    tiny and broadcasts back → each doc filters its own segment array
    JVM-side.  Returns the df with ``text_col`` rewritten and a
    ``n_removed`` count per doc."""
    d = delim.replace("\\", "\\\\").replace("'", "\\'")
    segs = f"split({text_col}, '{d}')"
    seg_rows = (df.select(F.col(id_col).alias("__id"),
                          F.explode(F.expr(segs)).alias("seg"))
                .select("__id", F.expr(
                    "xxhash64(lower(trim(seg)))").alias("sh"))
                .distinct())
    n_docs = df.count()
    cut = max(int(min_doc_frac * n_docs), min_docs)
    frequent = (seg_rows.groupBy("sh")
                .agg(F.count(F.lit(1)).alias("nd"))
                .filter(F.col("nd") >= cut)
                .select("sh"))
    freq_set = F.broadcast(
        frequent.agg(F.collect_set("sh").alias("bad")))
    return (df.crossJoin(freq_set)
            .withColumn("__segs", F.expr(segs))
            .withColumn("__kept", F.expr(
                "filter(__segs, s -> NOT array_contains("
                "bad, xxhash64(lower(trim(s)))))"))
            .withColumn("n_removed",
                        F.size("__segs") - F.size("__kept"))
            .withColumn(text_col, F.array_join("__kept", delim))
            .drop("bad", "__segs", "__kept"))


def as_col(e: str) -> Column:
    return F.expr(e)
