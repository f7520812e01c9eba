"""Johnson–Lindenstrauss random projection for embedding columns —
the dimensionality-reduction step before ANN / clustering at scale
(Achlioptas 2003 sign-matrix variant: entries ±1/√k preserve pairwise
distances within (1±ε) for k = O(log n / ε²)).

Scale shape: the projection matrix is DERIVED, not stored — each ±1
sign is the parity of md5(seed:j:i), computed in Python at PLAN BUILD
time and embedded as expression literals.  The per-row work is
``out_dim`` fixed-order multiply-add chains over ``element_at`` reads:
pure whole-stage-codegen arithmetic, no UDF, no shuffle, no broadcast,
nothing to persist or ship — any engine that can evaluate the same
expression reproduces the projection bit-for-bit, which is exactly how
the DuckDB oracle verifies it (same literal signs, same fixed
evaluation order, both sides cast each float32 element to double
before the identical IEEE sum).
"""

from __future__ import annotations

import hashlib
import math


def jl_signs(d_in: int, out_dim: int, seed: int = 0) -> list[list[int]]:
    """out_dim × d_in matrix of ±1: parity of md5(seed:j:i) — a pure
    function of (seed, j, i), identical everywhere."""
    return [[1 if hashlib.md5(f"{seed}:{j}:{i}".encode()).digest()[0] & 1
             else -1
             for i in range(d_in)]
            for j in range(out_dim)]


def jl_exprs(d_in: int, out_dim: int, *, vec_col: str = "embedding",
             seed: int = 0, dialect: str = "spark",
             prefix: str = "jl_") -> list[str]:
    """One SQL expression per output dimension: the signed fixed-order
    sum over the input elements, scaled by 1/√out_dim, rounded to 6 dp
    (both dialects run the identical IEEE double chain, so the
    rounding is cosmetic, not a tolerance)."""
    signs = jl_signs(d_in, out_dim, seed)
    scale = repr(1.0 / math.sqrt(out_dim))
    out = []
    for j in range(out_dim):
        terms = []
        for i in range(d_in):
            el = (f"cast(element_at({vec_col}, {i + 1}) as double)"
                  if dialect == "spark"
                  else f"cast({vec_col}[{i + 1}] as double)")
            terms.append(("+ " if signs[j][i] > 0 else "- ") + el)
        body = " ".join(terms).lstrip("+ ")
        out.append(f"cast(round(({body}) * {scale}, 6) as double) "
                   f"AS {prefix}{j}")
    return out


def jl_project(df, d_in: int, out_dim: int, *,
               vec_col: str = "embedding", seed: int = 0,
               keep_cols: list[str] | None = None,
               prefix: str = "jl_"):
    """Project ``vec_col`` (array<float> of length ``d_in``) to
    ``out_dim`` scalar columns ``prefix0..``.  Narrow codegen'd
    projection — composes directly with brute/LSH/IVF ANN on the
    reduced vectors."""
    keep = keep_cols if keep_cols is not None else df.columns
    keep = [c for c in keep if c != vec_col]
    return df.selectExpr(
        *keep, *jl_exprs(d_in, out_dim, vec_col=vec_col, seed=seed,
                         dialect="spark", prefix=prefix))


def jl_project_oracle_sql(d_in: int, out_dim: int, *,
                          vec_col: str = "embedding", seed: int = 0,
                          select: str = "vec_id, label",
                          table: str = "embeddings",
                          prefix: str = "jl_") -> str:
    """DuckDB mirror of :func:`jl_project`."""
    cols = ", ".join(jl_exprs(d_in, out_dim, vec_col=vec_col, seed=seed,
                              dialect="duck", prefix=prefix))
    return f"SELECT {select}, {cols} FROM {table}"
