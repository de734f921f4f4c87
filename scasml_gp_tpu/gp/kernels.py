"""Closed-form space-time RBF derivative kernel algebra.

The reference builds every Gram/cross-kernel block by nesting ``jax.grad``
per point pair and estimating Laplacians with a frozen-subset Hutchinson
estimator (reference ``models/GP.py:28-179``).  Here every operator block has
an exact closed form, expressed as an elementwise polynomial (in four pair
statistics) times the base kernel:

    kappa(x, y) = exp(-|x - y|^2 / (2 sigma_k^2)),   sigma_k = eq.sigma()*sqrt(d)
                   (reference models/GP.py:25,41-43)

With gamma = 1/sigma_k^2 and delta = x - y (full space-time difference):

    r2 = |delta|^2,  dt = delta_time,  q = sum_spatial delta_i^2 = r2 - dt^2,
    s  = sum_spatial delta_i.

Every block D_x^a D_y^b kappa for a, b in {ID, LAP (spatial Laplacian),
DT (time derivative), DIV (spatial divergence)} is poly(q, s, dt) * kappa.
The statistics come from ONE x @ y^T matmul (MXU) plus rank-1 terms, so a
whole Gram tile is a matmul followed by fused elementwise math — no autodiff,
no Hutchinson bias, O(1) kernel evals per pair.

Derivative identities used (all verified against jax.grad in
tests/test_kernels.py):

    d kappa/dx_i           = -g delta_i kappa
    d kappa/dy_i           = +g delta_i kappa
    d2 kappa/dx_i dy_j     = (g I_ij - g^2 delta_i delta_j) kappa
    Lap_x kappa            = (g^2 q - g d) kappa            [spatial]
    Lap_x Lap_y kappa      = g^2 (g^2 q^2 - g q (2d+4) + d(d+2)) kappa
    Div_x Div_y kappa      = (g d - g^2 s^2) kappa
    Div_x Lap_y kappa      = +g^2 s (2 + d - g q) kappa
    Lap_x Div_y kappa      = -g^2 s (2 + d - g q) kappa
    DT_x DT_y kappa        = g (1 - g dt^2) kappa
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# y-side feature operators defining phi, in the reference's column order
# (reference models/GP.py:251-258): [ID@dom, ID@bdy, LAP@dom, DT@dom, DIV@dom].
ID, LAP, DT, DIV = "id", "lap", "dt", "div"
PHI_OPS = (ID, ID, LAP, DT, DIV)          # operator per phi block
PHI_SETS = ("dom", "bdy", "dom", "dom", "dom")  # source point set per phi block


class PairStats(NamedTuple):
    """Pairwise statistics between rows of x (n, d+1) and y (m, d+1)."""

    kappa: jax.Array  # (n, m) base RBF values
    q: jax.Array      # (n, m) squared spatial distance
    s: jax.Array      # (n, m) sum of spatial differences
    dt: jax.Array     # (n, m) time difference x_t - y_t


def pair_stats(x: jax.Array, y: jax.Array, gamma: float) -> PairStats:
    """Compute pair statistics via one matmul; fp32 accumulation on the MXU."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    # Full space-time squared distance via |x|^2 + |y|^2 - 2 x.y (MXU matmul).
    xy = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    r2 = (
        jnp.sum(x * x, axis=1)[:, None]
        + jnp.sum(y * y, axis=1)[None, :]
        - 2.0 * xy
    )
    r2 = jnp.maximum(r2, 0.0)
    dt = x[:, -1][:, None] - y[:, -1][None, :]
    s = jnp.sum(x[:, :-1], axis=1)[:, None] - jnp.sum(y[:, :-1], axis=1)[None, :]
    q = jnp.maximum(r2 - dt * dt, 0.0)
    kappa = jnp.exp(-0.5 * gamma * r2)
    return PairStats(kappa=kappa, q=q, s=s, dt=dt)


def op_block(a: str, b: str, st: PairStats, gamma: float, d: int) -> jax.Array:
    """The (n, m) matrix of (D_x^a D_y^b kappa)(x_i, y_j).

    Closed forms replace the reference's per-pair autodiff blocks
    (reference models/GP.py:55-179 and the vmapped maps at :196-248).
    """
    g = gamma
    k, q, s, dt = st.kappa, st.q, st.s, st.dt
    lap = g * g * q - g * d  # common factor: one-sided spatial Laplacian / kappa

    key = (a, b)
    if key == (ID, ID):
        return k
    if key in ((ID, LAP), (LAP, ID)):
        return lap * k
    if key == (ID, DT):
        return g * dt * k
    if key == (DT, ID):
        return -g * dt * k
    if key == (ID, DIV):
        return g * s * k
    if key == (DIV, ID):
        return -g * s * k
    if key == (DT, DT):
        return g * (1.0 - g * dt * dt) * k
    if key in ((DT, DIV), (DIV, DT)):
        return -g * g * s * dt * k
    if key == (DIV, DIV):
        return (g * d - g * g * s * s) * k
    if key == (LAP, DT):
        return g * dt * lap * k
    if key == (DT, LAP):
        return -g * dt * lap * k
    if key == (DIV, LAP):
        return g * g * s * (2.0 + d - g * q) * k
    if key == (LAP, DIV):
        return -g * g * s * (2.0 + d - g * q) * k
    if key == (LAP, LAP):
        return g * g * (g * g * q * q - g * q * (2.0 * d + 4.0) + d * (d + 2.0)) * k
    raise ValueError(f"unknown operator pair {key}")


class GradCoeffs(NamedTuple):
    """Coefficients of grad_x (D_y^b kappa) in the basis
    {delta, delta_spatial, ones_spatial, e_time}:

        grad_x (D_y^b kappa)(x, y) =
            a * (x - y) + b_sp * (x - y)|_spatial + c * 1_spatial + e * e_t

    Each coefficient is an (n, m) array. This basis turns the posterior
    gradient into matmuls: sum_j A_ij y_j is an (n,m)@(m,d+1) MXU contraction.
    """

    a: jax.Array
    b_sp: jax.Array
    c: jax.Array
    e: jax.Array


def grad_coeffs(b: str, st: PairStats, gamma: float, d: int) -> GradCoeffs:
    """Coefficients of the x-gradient of the y-side family ``b``."""
    g = gamma
    k, q, s, dt = st.kappa, st.q, st.s, st.dt
    zero = jnp.zeros_like(k)
    if b == ID:
        return GradCoeffs(a=-g * k, b_sp=zero, c=zero, e=zero)
    if b == LAP:
        lap = g * g * q - g * d
        return GradCoeffs(a=-g * lap * k, b_sp=2.0 * g * g * k, c=zero, e=zero)
    if b == DT:
        return GradCoeffs(a=-g * g * dt * k, b_sp=zero, c=zero, e=g * k)
    if b == DIV:
        return GradCoeffs(a=-g * g * s * k, b_sp=zero, c=g * k, e=zero)
    raise ValueError(f"unknown family {b}")


def kernel_gamma(eq_sigma: float, dim: int) -> float:
    """gamma = 1/sigma_k^2 with sigma_k = eq.sigma()*sqrt(d)
    (reference models/GP.py:25)."""
    return 1.0 / (eq_sigma * eq_sigma * dim)
