"""Closed-form space-time RBF derivative kernel algebra.

The reference builds every Gram/cross-kernel block by nesting ``jax.grad``
per point pair and estimating Laplacians with a frozen-subset Hutchinson
estimator (reference ``models/GP.py:28-179``).  Here every operator block has
an exact closed form, expressed as an elementwise polynomial (in four pair
statistics) times the base kernel.

The kernel is a SEPARABLE space/time RBF (a strict generalization of the
reference's isotropic kernel, models/GP.py:25,41-43):

    kappa(x, y) = exp(-gs * q / 2 - gt * dt^2 / 2)

with q = |x_sp - y_sp|^2, dt = x_t - y_t, gs = 1/sigma_k^2,
gt = 1/(time_scale * sigma_k)^2 and sigma_k = eq.sigma()*sqrt(d).  With
``time_scale = 1`` (the default) this is EXACTLY the reference kernel; a
smaller time scale resolves the short [0, T] time axis that the reference's
width sigma_k ~ 0.25 sqrt(d) cannot see at large d.

Every block D_x^a D_y^b kappa for a, b in {ID, LAP (spatial Laplacian),
DT (time derivative), DIV (spatial divergence)} is poly(q, s, dt) * kappa.
The statistics come from ONE x @ y^T matmul (MXU) plus rank-1 terms, so a
whole Gram tile is a matmul followed by fused elementwise math — no autodiff,
no Hutchinson bias, O(1) kernel evals per pair.

Derivative identities used (all verified against jax.grad in
tests/test_kernels.py; delta = x - y):

    d kappa/dx_i           = -gs delta_i kappa   (spatial i)
    d kappa/dx_t           = -gt dt kappa
    Lap_x kappa            = (gs^2 q - gs d) kappa
    Lap_x Lap_y kappa      = gs^2 (gs^2 q^2 - gs q (2d+4) + d(d+2)) kappa
    Div_x Div_y kappa      = (gs d - gs^2 s^2) kappa
    Div_x Lap_y kappa      = +gs^2 s (2 + d - gs q) kappa
    DT_x DT_y kappa        = gt (1 - gt dt^2) kappa
    DT_x Div_y kappa       = -gs gt s dt kappa
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# y-side feature operators defining phi, in the reference's column order
# (reference models/GP.py:251-258): [ID@dom, ID@bdy, LAP@dom, DT@dom, DIV@dom].
ID, LAP, DT, DIV = "id", "lap", "dt", "div"
PHI_OPS = (ID, ID, LAP, DT, DIV)          # operator per phi block
PHI_SETS = ("dom", "bdy", "dom", "dom", "dom")  # source point set per phi block


def split_gamma(gamma) -> Tuple[jax.Array, jax.Array]:
    """Normalize gamma to (gs, gt): accepts a scalar (isotropic, reference
    semantics) or a length-2 [gs, gt] array/tuple."""
    g = jnp.atleast_1d(jnp.asarray(gamma, jnp.float32))
    return g[0], g[-1]


class PairStats(NamedTuple):
    """Pairwise statistics between rows of x (n, d+1) and y (m, d+1)."""

    kappa: jax.Array  # (n, m) base RBF values
    q: jax.Array      # (n, m) squared spatial distance
    s: jax.Array      # (n, m) sum of spatial differences
    dt: jax.Array     # (n, m) time difference x_t - y_t


def pair_stats(x: jax.Array, y: jax.Array, gamma) -> PairStats:
    """Compute pair statistics via one matmul; fp32 accumulation on the MXU."""
    gs, gt = split_gamma(gamma)
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
    kappa = jnp.exp(-0.5 * (gs * q + gt * dt * dt))
    return PairStats(kappa=kappa, q=q, s=s, dt=dt)


def op_block(a: str, b: str, st: PairStats, gamma, d: int) -> jax.Array:
    """The (n, m) matrix of (D_x^a D_y^b kappa)(x_i, y_j).

    Closed forms replace the reference's per-pair autodiff blocks
    (reference models/GP.py:55-179 and the vmapped maps at :196-248).
    """
    gs, gt = split_gamma(gamma)
    k, q, s, dt = st.kappa, st.q, st.s, st.dt
    lap = gs * gs * q - gs * d  # one-sided spatial Laplacian / kappa

    key = (a, b)
    if key == (ID, ID):
        return k
    if key in ((ID, LAP), (LAP, ID)):
        return lap * k
    if key == (ID, DT):
        return gt * dt * k
    if key == (DT, ID):
        return -gt * dt * k
    if key == (ID, DIV):
        return gs * s * k
    if key == (DIV, ID):
        return -gs * s * k
    if key == (DT, DT):
        return gt * (1.0 - gt * dt * dt) * k
    if key in ((DT, DIV), (DIV, DT)):
        return -gs * gt * s * dt * k
    if key == (DIV, DIV):
        return (gs * d - gs * gs * s * s) * k
    if key == (LAP, DT):
        return gt * dt * lap * k
    if key == (DT, LAP):
        return -gt * dt * lap * k
    if key == (DIV, LAP):
        return gs * gs * s * (2.0 + d - gs * q) * k
    if key == (LAP, DIV):
        return -gs * gs * s * (2.0 + d - gs * q) * k
    if key == (LAP, LAP):
        return (
            gs * gs
            * (gs * gs * q * q - gs * q * (2.0 * d + 4.0) + d * (d + 2.0))
            * k
        )
    raise ValueError(f"unknown operator pair {key}")


class GradCoeffs(NamedTuple):
    """Coefficients of grad_x (D_y^b kappa) in the basis
    {delta_spatial, dt * e_t, ones_spatial, e_t}:

        grad_x (D_y^b kappa)(x, y) =
            a_sp * (x - y)|_sp + a_t * dt * e_t + c * 1_sp + e * e_t

    Each coefficient is an (n, m) array.  This basis turns the posterior
    gradient into matmuls: sum_j a_sp(i,j) y_j is an (n,m)@(m,d) MXU
    contraction, the time terms are matvecs.
    """

    a_sp: jax.Array
    a_t: jax.Array
    c: jax.Array
    e: jax.Array


def grad_coeffs(b: str, st: PairStats, gamma, d: int) -> GradCoeffs:
    """Coefficients of the x-gradient of the y-side family ``b``."""
    gs, gt = split_gamma(gamma)
    k, q, s, dt = st.kappa, st.q, st.s, st.dt
    zero = jnp.zeros_like(k)
    if b == ID:
        return GradCoeffs(a_sp=-gs * k, a_t=-gt * k, c=zero, e=zero)
    if b == LAP:
        lap = gs * gs * q - gs * d
        return GradCoeffs(
            a_sp=(2.0 * gs * gs - gs * lap) * k,
            a_t=-gt * lap * k,
            c=zero,
            e=zero,
        )
    if b == DT:
        return GradCoeffs(
            a_sp=-gs * gt * dt * k, a_t=-gt * gt * dt * k, c=zero, e=gt * k
        )
    if b == DIV:
        return GradCoeffs(
            a_sp=-gs * gs * s * k, a_t=-gs * gt * s * k, c=gs * k, e=zero
        )
    raise ValueError(f"unknown family {b}")


def kernel_gamma(eq_sigma: float, dim: int) -> float:
    """Isotropic gamma = 1/sigma_k^2 with sigma_k = eq.sigma()*sqrt(d)
    (reference models/GP.py:25)."""
    return 1.0 / (eq_sigma * eq_sigma * dim)


def kernel_gammas(eq_sigma: float, dim: int, time_scale: float = 1.0):
    """(gs, gt) for the separable kernel: sigma_t = time_scale * sigma_k.
    time_scale = 1 reproduces the reference's isotropic kernel exactly."""
    gs = kernel_gamma(eq_sigma, dim)
    return (gs, gs / (time_scale * time_scale))
