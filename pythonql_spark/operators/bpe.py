"""Real byte-pair-encoding tokenizer: driver-trained merge table,
Arrow-batched distributed encode.

The reference engine's text stack stops at token *counting*
(reference: pythonql helpers expose only whitespace splitting); a
training-data pipeline needs the real thing — a learned subword
vocabulary and the per-document token ids/counts under it.  Classic
BPE (Sennrich et al. 2016): start from characters with an end-of-word
marker, repeatedly merge the most frequent adjacent symbol pair;
encoding replays merges in rank order (GPT-2 style greedy loop).

Scale shape:
- ``train_bpe`` collects a BOUNDED deterministic sample of documents
  (md5-ordered, ``sample_docs`` cap — same documented contract as the
  IVF k-means trainer in similarity.py): merge training is a
  corpus-statistics estimation problem, not a full pass.  At 100 TB
  you train on ~10k docs and the merge table converges the same.
- ``bpe_encode`` broadcasts the merge-rank dict (a few KB) and encodes
  via ``mapInPandas`` — Arrow batches in, one Python pass per batch,
  with a per-word LRU dict so repeated words (Zipf: most of them)
  encode once per batch.  No shuffle at all: tokenization is a
  narrow map fused behind the scan.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, functions as F

_EOW = "</w>"


def train_bpe(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", *, num_merges: int = 200,
              sample_docs: int = 256) -> list[tuple[str, str]]:
    """Learn a BPE merge list from a bounded deterministic sample.

    Ties in pair frequency break to the lexicographically smallest
    pair, so the merge table is identical at any parallelism."""
    rows = (df.select(F.col(text_col).alias("t"))
            .orderBy(F.md5(F.concat_ws("§", F.col(text_col),
                                       F.col(id_col).cast("string"))))
            .limit(sample_docs)
            .collect())
    wc: Counter = Counter()
    for (t,) in rows:
        for w in (t or "").lower().split():
            wc[w] += 1
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (_EOW,): c for w, c in wc.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for word, c in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, c in vocab.items():
            out, i = [], 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word (lowest-rank pair merges first —
    the exact replay order of training)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id",
               *, preview_tokens: int = 8) -> DataFrame:
    """Encode every document under a trained merge table.

    Returns (id, n_bpe_tokens, vocab_used, preview) — counts and a
    deterministic head sample of the token stream.  The merge dict is
    closure-captured (broadcast once per executor by Spark's task
    serializer); encoding is one Arrow-batched Python pass with a
    per-batch word cache, no shuffle."""
    ranks = {p: i for i, p in enumerate(merges)}
    out_schema = (f"{id_col} long, n_bpe_tokens long, "
                  f"vocab_used long, preview string")

    def run(batches):
        import pandas as pd
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            ids, counts, vocabs, previews = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in (text or "").lower().split():
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                ids.append(did)
                counts.append(len(toks))
                vocabs.append(len(set(toks)))
                previews.append(" ".join(toks[:preview_tokens]))
            yield pd.DataFrame({id_col: ids, "n_bpe_tokens": counts,
                                "vocab_used": vocabs, "preview": previews})

    return (df.select(id_col, text_col)
            .mapInPandas(run, out_schema))


# ----------------------------------------------- fixed-merge oracle path

#: A fixed merge table for the dual-dialect oracle key (r9): chain-safe
#: by construction — no merge OUTPUT equals an element of a lower-rank
#: pair, so greedy lowest-rank-first encoding (encode_word) equals
#: applying each merge to fixpoint in rank order, which a SQL fold can
#: replay exactly.  Production tokenization stays on the TRAINED
#: train_bpe path (text_bpe, rows-only + replay/determinism tests).
FIXED_MERGES: list[tuple[str, str]] = [
    ("e", "</w>"), ("d", "</w>"), ("g", "</w>"), ("f", "</w>"),
    ("t", "h"), ("i", "n"), ("a", "n"),
    ("th", "e</w>"), ("in", "g</w>"), ("an", "d</w>"),
    ("o", "f</w>"), ("e", "r"),
]


def _enc_word_sql(word_var: str,
                  merges: list[tuple[str, str]]) -> str:
    """DuckDB expression encoding one word under ``merges``: chars +
    the end-of-word marker, each token prefixed with ``|``; one
    left-to-right fold per merge (merging = append WITHOUT the
    separator, so token boundaries stay unambiguous — tokens never
    contain ``|``)."""
    cur = (f"list_transform(list_append("
           f"[{word_var}[i] for i in generate_series(1, "
           f"length({word_var}))], '{_EOW}'), t -> '|' || t)")
    for a, b in merges:
        la = len("|" + a)
        red = (f"list_reduce(list_prepend('', {cur}), "
               f"(acc, x) -> CASE WHEN right(acc, {la}) = '|{a}' "
               f"AND x = '|{b}' THEN acc || '{b}' ELSE acc || x END)")
        cur = (f"list_transform(list_filter(string_split({red}, '|'), "
               f"t -> t != ''), t -> '|' || t)")
    return f"array_to_string({cur}, '')"


def bpe_fixed_oracle_sql(*, merges: list[tuple[str, str]] | None = None,
                         table: str = "documents",
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         preview_tokens: int = 8,
                         doc_filter: str = "TRUE") -> str:
    """DuckDB mirror of ``bpe_encode(df, FIXED_MERGES)`` over
    ASCII-normalized text — token count, per-doc distinct vocab and
    the preview replay the Arrow encoder bit-for-bit."""
    merges = FIXED_MERGES if merges is None else merges
    enc = _enc_word_sql("w", merges)
    return f"""
WITH norm AS (
  SELECT {id_col},
         lower(regexp_replace({text_col}, '[^A-Za-z ]', ' ', 'g')) AS t
  FROM {table} WHERE {doc_filter}),
wrds AS (
  SELECT {id_col},
         list_filter(string_split(t, ' '), x -> x != '') AS words
  FROM norm),
enc AS (
  SELECT {id_col},
         array_to_string(list_transform(words, w -> {enc}), '') AS stream
  FROM wrds),
tok AS (
  SELECT {id_col},
         list_filter(string_split(stream, '|'), t -> t != '') AS toks
  FROM enc)
SELECT {id_col},
       cast(len(toks) as bigint) AS n_bpe_tokens,
       cast(len(list_distinct(toks)) as bigint) AS vocab_used,
       array_to_string(toks[1:{preview_tokens}], ' ') AS preview
FROM tok
"""
