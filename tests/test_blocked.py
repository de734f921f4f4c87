"""Blocked GEMM-dominant SPD inverse (gp/blocked.py) — the archived
round-5 factorization experiment (reports/blocked_cholesky.md).  Kept
correct even though not adopted: the module documents the measured
negative result and must stay runnable."""

import jax
import jax.numpy as jnp
import numpy as np

from scasml_gp_tpu.gp.blocked import blocked_spd_inverse, chol_inv


def _spd(n, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.randn(n, n).astype(np.float32)
    return A @ A.T / n + np.eye(n, dtype=np.float32)


def test_chol_inv_matches_reference():
    M = _spd(300)
    L, Li = chol_inv(jnp.asarray(M), block=128)
    Lref = np.linalg.cholesky(M)
    np.testing.assert_allclose(np.asarray(L), Lref, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(L) @ np.asarray(Li), np.eye(300), atol=2e-4
    )


def test_blocked_spd_inverse_uneven_split():
    # n not a multiple of block exercises _split_point's uneven recursion
    M = _spd(437, seed=3)
    Minv = np.asarray(blocked_spd_inverse(jnp.asarray(M), block=128))
    np.testing.assert_allclose(M @ Minv, np.eye(437), atol=5e-4)
