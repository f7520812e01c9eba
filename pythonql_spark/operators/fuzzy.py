"""Edit-distance similarity join (fuzzy matching / entity
resolution): all pairs with ``levenshtein(a, b) <= max_dist``,
without the O(n²) cross join.

Design (the ED-Join / prefix-filtering family — Gravano et al. 2001,
Xiao et al. 2008, both public):

* a pair with edit distance ≤ d destroys at most ``q·d`` of either
  string's positional q-grams, so strings of length ≥ q·(d+1) must
  share at least one q-gram — and, under ANY fixed global ordering of
  grams, must share one among each string's ``q·d + 1`` FIRST grams
  in that order (the prefix-filter theorem).  Ordering by ascending
  corpus frequency makes those prefix grams the RAREST ones, so the
  candidate join avoids ubiquitous-gram buckets (shared prefixes like
  "Supplier#000000" never generate candidates by themselves).
* candidates then verify with the exact ``levenshtein`` built-in
  (JVM-side), behind the free ``|len(a) − len(b)| ≤ d`` filter.

Scale shape: one groupBy on grams (corpus-sized but narrow — two
longs per gram), one WindowGroupLimit per string (≤ q·d+1 rows per
string leave each map task), one equi-join on the rare grams, exact
verify on the candidate set only.  Strings shorter than ``q·(d+1)``
fall outside the theorem's guarantee: they pair among themselves via
a length-band join over the (bounded, documented) short-string
subset, so the result is EXACT for every length.

Choosing ``q`` (the real scale lever): candidate volume is
~n²/|gram vocabulary| — every pair sharing a rare gram is a
candidate, and the vocabulary bounds how many distinct buckets
exist.  q=2 over hex/numeric keys gives ≤256/100 values and goes
quadratic fast (measured: per-unit cost RISING through the 4×
octave); q=3 over natural-language keys gives a vocabulary that
grows with the data and keeps buckets bounded.  The rule is now
CODE, not documentation: ``q=None`` (default) runs
:func:`choose_q` — grow q until observed-alphabet^q ≥ 4·corpus
size, capped by key length, raising loudly when the constraints
conflict instead of silently going quadratic.

Dual-dialect caveat: DuckDB's levenshtein is byte-based while
Spark's is codepoint-based — identical on ASCII; the oracle-checked
key feeds ASCII input.

The reference engine has no fuzzy-join surface (brief: similarity
extension); cites none of its files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _grams_expr(col: str, q: int) -> str:
    """Distinct q-grams of ``col`` (SQL, dual-dialect shape)."""
    return (f"array_distinct(transform("
            f"sequence(1, greatest(length({col}) - {q - 1}, 1)), "
            f"i -> substring({col}, i, {q})))")


def _prefix_candidate_mass(df: DataFrame, str_col: str, q: int,
                           max_dist: int) -> int:
    """MEASURED candidate-pair count the prefix filter would generate
    at this ``q``: build the frequency-ranked gram prefixes exactly as
    :func:`fuzzy_pairs` does (grams hashed to longs — the probe
    shuffles only (long, long) pairs, never strings) and sum
    c·(c−1)/2 over the buckets."""
    prefix_n = q * max_dist + 1
    grams = df.select(
        F.col(str_col).alias("__s"),
        F.monotonically_increasing_id().alias("__rid")).filter(
        "__s IS NOT NULL").select(
        "__rid",
        F.explode(F.expr(
            f"array_distinct(transform("
            f"sequence(1, greatest(length(__s) - {q - 1}, 1)), "
            f"i -> xxhash64(substring(__s, i, {q}))))")).alias("g"))
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__f"))
    ranked = (grams.join(freq, "g")
              .withColumn("__r", F.row_number().over(
                  W.partitionBy("__rid").orderBy("__f", "g")))
              .filter(F.col("__r") <= prefix_n))
    row = (ranked.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
           .selectExpr("cast(sum(c * (c - 1) / 2) as bigint) as m")
           .collect()[0])
    return int(row.m or 0)


def choose_q(df: DataFrame, str_col: str, max_dist: int, *,
             sample_rows: int = 2048,
             cand_per_row: float = 8.0) -> int:
    """Derive the gram width ``q`` so the prefix-filter candidate
    join stays bounded — the guardrail that keeps a fixed default
    from silently going quadratic on low-entropy key columns (hex
    IDs, digit keys, shared-prefix corpora).

    Two stages, because the failure mode is about the DISTRIBUTION of
    rare grams, not just the global character alphabet (measured: a
    mixed text+hex key passes ``alphabet^q ≥ 4n`` at q=4 yet
    generates 32 M candidates — the discriminating region is hex,
    16 symbols):

    1. cheap lower bound from a bounded sample: smallest q with
       observed-``alphabet^q ≥ 4·n``;
    2. MEASURE the actual prefix-bucket collision mass at that q
       (:func:`_prefix_candidate_mass` — one hashed-gram aggregate,
       the same cost class as the frequency pass the join itself
       runs) and grow q until measured candidates ≤ ``cand_per_row·n``.

    Capped so ≥ ~75 % of strings stay under the prefix-filter theorem
    (``q·(max_dist+1) ≤ p25 length``); if no q satisfies both, this
    RAISES with the rule instead of silently going quadratic.

    Driver cost: one bounded sample collect + one count + 1–3 narrow
    probe aggregates — a plan-build-time contract like the BPE /
    k-means training samples."""
    rows = (df.select(F.substring(F.col(str_col), 1, 256).alias("s"))
            .filter("s IS NOT NULL").limit(sample_rows).collect())
    sample = [r.s for r in rows if r.s]
    if not sample:
        return 2
    alphabet = max(len(set("".join(sample))), 2)
    lens = sorted(len(s) for s in sample)
    p25_len = lens[len(lens) // 4]
    n = df.count()
    q = 2
    while alphabet ** q < 4 * max(n, 1) and q < 8:
        q += 1
    q_cap = max(2, p25_len // (max_dist + 1))
    # absolute floor: a tiny corpus whose ALL-pairs volume is trivial
    # must not raise just because its per-row rate is high (n=10
    # zero-padded supplier names: mass 45, rate 4.5/row)
    budget = max(int(cand_per_row * max(n, 1)), 100_000)
    measured: list[tuple[int, int]] = []
    while q <= q_cap:
        mass = _prefix_candidate_mass(df, str_col, q, max_dist)
        measured.append((q, mass))
        if mass <= budget:
            return q
        q += 1
    raise ValueError(
        f"fuzzy_pairs: no gram width bounds the candidate join over "
        f"n={n} rows (observed alphabet {alphabet}, p25 key length "
        f"{p25_len} caps q at {q_cap} for max_dist={max_dist}; "
        f"measured prefix-candidate mass {measured} vs budget "
        f"{budget}). Pass q= explicitly to accept the cost, or use "
        f"the MinHash path for approximate matching.")


def fuzzy_pairs(df: DataFrame, str_col: str, max_dist: int, *,
                id_col: str = "doc_id", q: int | None = None) -> DataFrame:
    """All (id_a, id_b, dist) with ``id_a < id_b`` and
    ``levenshtein ≤ max_dist`` over a single corpus (self-join).
    ``q=None`` (default) derives the gram width from the observed
    alphabet via :func:`choose_q`."""
    if q is None:
        q = choose_q(df, str_col, max_dist)
    prefix_n = q * max_dist + 1
    short_len = q * (max_dist + 1)
    base = df.select(F.col(id_col).alias("__id"),
                     F.col(str_col).alias("__s")).filter("__s IS NOT NULL")

    grams = base.select(
        "__id", "__s",
        F.explode(F.expr(_grams_expr("__s", q))).alias("g"))
    # referenced by both the frequency pass and the rank join — cut
    # lineage so the explode runs once
    grams = grams.localCheckpoint(eager=False)
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__f"))
    ranked = (grams.join(freq, "g")
              .withColumn("__r", F.row_number().over(
                  W.partitionBy("__id").orderBy("__f", "g")))
              .filter(F.col("__r") <= prefix_n)
              .select("__id", "__s", "g"))
    a = ranked.select(F.col("__id").alias("id_a"),
                      F.col("__s").alias("s_a"), "g")
    b = ranked.select(F.col("__id").alias("id_b"),
                      F.col("__s").alias("s_b"), "g")
    long_cand = (a.join(b, "g")
                 .filter("id_a < id_b")
                 .select("id_a", "id_b", "s_a", "s_b")
                 .dropDuplicates(["id_a", "id_b"])
                 .filter(f"length(s_a) >= {short_len} "
                         f"AND length(s_b) >= {short_len}"))

    # short strings (outside the prefix-filter guarantee): a bounded
    # subset by construction — band-join on length, then verify; a
    # short×long pair needs the long side within max_dist of short
    shorts = base.filter(f"length(__s) < {short_len + max_dist}")
    sa = shorts.select(F.col("__id").alias("id_a"),
                       F.col("__s").alias("s_a"))
    sb = shorts.select(F.col("__id").alias("id_b"),
                       F.col("__s").alias("s_b"))
    short_cand = (sa.join(sb, F.col("id_a") < F.col("id_b"))
                  .filter(f"length(s_a) < {short_len} "
                          f"OR length(s_b) < {short_len}"))

    cand = long_cand.unionByName(short_cand)
    return (cand
            .filter(f"abs(length(s_a) - length(s_b)) <= {max_dist}")
            .withColumn("dist", F.expr("levenshtein(s_a, s_b)"))
            .filter(F.col("dist") <= max_dist)
            .select("id_a", "id_b", "dist"))


def fuzzy_pairs_oracle_sql(str_expr: str, max_dist: int, *,
                           id_col: str = "doc_id", q: int = 2,
                           table: str = "documents") -> str:
    """DuckDB mirror of :func:`fuzzy_pairs` — identical gram prefix
    selection (frequency order, gram tie-break), candidate join,
    short-string band and levenshtein verify."""
    prefix_n = q * max_dist + 1
    short_len = q * (max_dist + 1)
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {str_expr} AS s FROM {table}
  WHERE {str_expr} IS NOT NULL),
grams AS (
  SELECT DISTINCT id, s, substring(s, i, {q}) AS g
  FROM base, (SELECT unnest(range(1, 10000)) AS i) ii
  WHERE i <= greatest(length(s) - {q - 1}, 1)),
freq AS (SELECT g, count(*) AS f FROM grams GROUP BY g),
ranked AS (
  SELECT id, s, g FROM (
    SELECT grams.id, grams.s, grams.g,
           row_number() OVER (PARTITION BY grams.id
                              ORDER BY freq.f, grams.g) AS r
    FROM grams JOIN freq USING (g)) WHERE r <= {prefix_n}),
long_cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.s AS s_a, b.s AS s_b
  FROM ranked a JOIN ranked b ON a.g = b.g AND a.id < b.id
  WHERE length(a.s) >= {short_len} AND length(b.s) >= {short_len}),
shorts AS (
  SELECT id, s FROM base WHERE length(s) < {short_len + max_dist}),
short_cand AS (
  SELECT a.id AS id_a, b.id AS id_b, a.s AS s_a, b.s AS s_b
  FROM shorts a JOIN shorts b ON a.id < b.id
  WHERE length(a.s) < {short_len} OR length(b.s) < {short_len}),
cand AS (SELECT * FROM long_cand UNION SELECT * FROM short_cand)
SELECT id_a, id_b, cast(levenshtein(s_a, s_b) AS INTEGER) AS dist
FROM cand
WHERE abs(length(s_a) - length(s_b)) <= {max_dist}
  AND levenshtein(s_a, s_b) <= {max_dist}"""
