"""Blocked Cholesky + triangular inverse: GEMM-dominant SPD inversion.

VERDICT round-4 Next #5: the monolithic factorization path
(gp/gram.py regularized_factorization) sits at 0.30 of the MXU fp32
roofline — `jnp.linalg.cholesky` at 0.207 and the phi-RHS
`triangular_solve` at 0.137 — while the trailing-update syrk GEMM runs at
1.55 of fp32-rate (153 TF; reports/factorization_probe.json).  XLA:TPU's
cholesky/triangular_solve primitives are the limit, not the algorithm
space: this module restructures the SPD inverse so that almost all cubic
work is GEMM.

Recursive right-looking scheme, computing the Cholesky factor and its
inverse JOINTLY (the explicit inverse is what the dense Newton trainer
consumes):

    chol_inv(S):                       # S = [[A, B^T], [B, C]], SPD
        LA, LAi = chol_inv(A)          # recurse on the leading block
        Lb  = B @ LAi^T                #   GEMM      (panel)
        S'  = C - Lb Lb^T              #   syrk GEMM (trailing update)
        LC, LCi = chol_inv(S')         # recurse on the Schur complement
        L   = [[LA, 0], [Lb, LC]]
        Li  = [[LAi, 0], [-LCi Lb LAi, LCi]]   # two GEMMs

with the recursion bottoming out at base-size panels (`block`) that use
the XLA primitives — the only non-GEMM cubic work is O(n_blocks) panels of
size block^3 on the critical path.  The final M^{-1} = Li^T Li is one more
syrk-rate GEMM (already how gp/gram.py computes it, via potri).

All shapes are static (Python-level recursion at trace time, no dynamic
control flow), so this inlines into the same jitted training graph as the
monolithic path.  The jittered-retry semantics of gp/gram.py are
preserved by `blocked_spd_inverse` (escalating jitter under
`lax.while_loop`; retries execute only on a non-finite factor).

Measured on TPU in scripts/blocked_cholesky_probe.py; adoption (or the
negative result) recorded in reports/blocked_cholesky.md.  Replaces the
last remnant of reference models/GP.py:258-266's fp64 SVD economics.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _gemm(a, b, precision):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )


def _split_point(n: int, block: int) -> int:
    """Largest multiple of ``block`` at or below n/2 (>= block)."""
    h = (n // 2 + block - 1) // block * block
    if h >= n:
        h = max(n - block, block)
    return h


def chol_inv(S: jax.Array, block: int = 512,
             precision=jax.lax.Precision.HIGHEST,
             ) -> Tuple[jax.Array, jax.Array]:
    """(L, L^{-1}) of an SPD matrix, GEMM-dominant recursion (see module
    docstring).  ``S`` must be symmetric positive definite; shapes are
    static, so this traces into a fixed graph.

    ``precision`` applies to the panel/Schur/inverse GEMMs.  On TPU the
    DEFAULT fp32 dot runs reduced-precision passes, which loses the
    trailing Schur complement's positive-definiteness on the real training
    operand (measured: non-finite factor -> jitter retry -> 2.5x slower
    AND a different inverse); HIGHEST keeps the factorization at true-fp32
    accuracy (CPU-reference agreement ~1e-5)."""
    n = S.shape[0]
    if n <= block:
        L = jnp.linalg.cholesky(S)
        Li = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(n, dtype=S.dtype), lower=True
        )
        return L, Li
    h = _split_point(n, block)
    LA, LAi = chol_inv(S[:h, :h], block, precision)
    Lb = _gemm(S[h:, :h], LAi.T, precision)         # panel, GEMM
    Schur = S[h:, h:] - _gemm(Lb, Lb.T, precision)  # trailing update, syrk
    LC, LCi = chol_inv(Schur, block, precision)
    zero = jnp.zeros((h, n - h), dtype=S.dtype)
    L = jnp.block([[LA, zero], [Lb, LC]])
    Li = jnp.block(
        [[LAi, zero], [-_gemm(LCi, _gemm(Lb, LAi, precision), precision),
                       LCi]]
    )
    return L, Li


@partial(jax.jit, static_argnames=("block", "precision"))
def blocked_spd_inverse(M: jax.Array, block: int = 512,
                        precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """M^{-1} for SPD M via the blocked joint factorization, with the same
    escalating-jitter retry semantics as gp/gram.py's monolithic path
    (retries only execute when the plain factorization produced a
    non-finite factor)."""
    eye = jnp.eye(M.shape[0], dtype=M.dtype)

    def inv_of(Mj):
        _, Li = chol_inv(Mj, block, precision)
        return _gemm(Li.T, Li, precision)

    def cond(carry):
        Minv, jitter, tries = carry
        return jnp.logical_and(~jnp.all(jnp.isfinite(Minv)), tries < 3)

    def body(carry):
        Minv, jitter, tries = carry
        return inv_of(M + jitter * eye), jitter * 100.0, tries + 1

    Minv0 = inv_of(M)
    Minv, _, _ = jax.lax.while_loop(
        cond, body, (Minv0, jnp.float32(1e-3), jnp.int32(0))
    )
    return Minv
