"""Fused GP posterior evaluation: mean, gradient and PDE-operator features.

This is the #1 hot path of the whole framework: ScaSML evaluates the GP
posterior (and its gradient / PDE residual) at every node of the Picard
sample tree (reference ``solvers/ScaSML.py:29-63,274-280``; SURVEY.md §3.4).
The reference computes these with three separate nested-vmap autodiff passes
(``predict``, ``compute_gradient``, ``compute_PDE_loss``, models/GP.py:
653-687,746-769), re-materializing the (N_infer x phi_dim) kernel matrix each
time.

TPU-native design: all five phi families and all their x-side derivatives are
elementwise polynomials (in the pair statistics q, s, dt) times the base RBF
(see :mod:`scasml_gp_tpu.gp.kernels`).  Folding the representer weights into
the polynomial coefficients turns each output into

    out(x_i) = rowsum( kappa(x_i, Y) * P(q, s, dt; r) )   (+ matmul terms for
                                                            the gradient)

so one pass computes u, grad u, dt_u, div_u and lap_u with ONE kappa
evaluation per (x, y) pair, one (n,m)@(m,d+1) MXU matmul for the gradient,
and XLA-fused elementwise math for everything else.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from scasml_gp_tpu.gp.kernels import pair_stats


class PosteriorOut(NamedTuple):
    u: jax.Array                # (n,)
    grad: Optional[jax.Array]   # (n, d+1) full space-time gradient, or None
    dt_u: Optional[jax.Array]   # (n,) time derivative, or None
    div_u: Optional[jax.Array]  # (n,) spatial divergence, or None
    lap_u: Optional[jax.Array]  # (n,) spatial Laplacian, or None


def _split_r(r: jax.Array, n_dom: int, n_bdy: int):
    """Split representer weights by phi block (order: models/GP.py:251-258)."""
    r1 = r[:n_dom]
    r2 = r[n_dom : n_dom + n_bdy]
    r3 = r[n_dom + n_bdy : 2 * n_dom + n_bdy]
    r4 = r[2 * n_dom + n_bdy : 3 * n_dom + n_bdy]
    r5 = r[3 * n_dom + n_bdy :]
    return r1, r2, r3, r4, r5


@partial(jax.jit, static_argnames=("dim", "want_grad", "want_ops"))
def _posterior_block(
    x: jax.Array,
    x_dom: jax.Array,
    x_bdy: jax.Array,
    r: jax.Array,
    gamma: jax.Array,
    dim: int,
    want_grad: bool,
    want_ops: bool,
) -> PosteriorOut:
    """Single-pass posterior for one block of evaluation points x (n, d+1)."""
    g = gamma
    d = dim
    n_dom = x_dom.shape[0]
    n_bdy = x_bdy.shape[0]
    r1, r2, r3, r4, r5 = _split_r(r.astype(jnp.float32), n_dom, n_bdy)
    x = x.astype(jnp.float32)

    st = pair_stats(x, x_dom, g)          # (n, N) statistics vs interior set
    stb = pair_stats(x, x_bdy, g)         # (n, Nb) statistics vs boundary set
    k, q, s, dt = st.kappa, st.q, st.s, st.dt
    kb, sb, dtb = stb.kappa, stb.s, stb.dt
    lap = g * g * q - g * d               # one-sided Laplacian factor

    # ---- posterior mean: u = sum_j kappa * (r1 + lap r3 + g dt r4 + g s r5) ----
    P_u = r1[None, :] + lap * r3[None, :] + g * dt * r4[None, :] + g * s * r5[None, :]
    u = jnp.sum(k * P_u, axis=1) + kb @ r2

    grad = None
    if want_grad:
        # grad_x of each family in the basis {delta, delta_sp, 1_sp, e_t}
        # (kernels.grad_coeffs), with weights folded in:
        #   A: coefficient of delta = x - y (all families contribute)
        #   B: coefficient of delta restricted to spatial coords (LAP family)
        #   C: coefficient of the all-ones spatial vector (DIV family)
        #   E: coefficient of e_t (DT family)
        A = (
            -g * k * P_u
        )  # every family's delta-coefficient is (-g) * its mean integrand
        B = 2.0 * g * g * k * r3[None, :]
        C = g * k * r5[None, :]
        E = g * k * r4[None, :]
        Ab = -g * kb * r2[None, :]

        rsA = jnp.sum(A, axis=1) + jnp.sum(Ab, axis=1)     # (n,)
        AY = jax.lax.dot_general(
            A, x_dom, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            Ab, x_bdy, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        grad = x * rsA[:, None] - AY                        # sum A_ij (x_i - y_j)

        rsB = jnp.sum(B, axis=1)
        BY = jax.lax.dot_general(
            B, x_dom, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta_sp = x * rsB[:, None] - BY                    # then mask to spatial
        grad = grad.at[:, :-1].add(delta_sp[:, :-1])

        grad = grad.at[:, :-1].add(jnp.sum(C, axis=1)[:, None])  # ones_spatial
        grad = grad.at[:, -1].add(jnp.sum(E, axis=1))            # e_t

    dt_u = div_u = lap_u = None
    if want_ops:
        # Apply DT/DIV/LAP on the x side of every family (closed forms from
        # kernels.op_block, weights folded into the polynomials).
        # DT_x: (DT,ID)=-g dt; (DT,LAP)=-g dt lap; (DT,DT)=g(1-g dt^2);
        #       (DT,DIV)=-g^2 s dt.
        P_dt = (
            -g * dt * r1[None, :]
            - g * dt * lap * r3[None, :]
            + g * (1.0 - g * dt * dt) * r4[None, :]
            - g * g * s * dt * r5[None, :]
        )
        dt_u = jnp.sum(k * P_dt, axis=1) + (-g) * jnp.sum(kb * dtb * r2[None, :], axis=1)

        # DIV_x: (DIV,ID)=-g s; (DIV,LAP)=+g^2 s(2+d-gq); (DIV,DT)=-g^2 s dt;
        #        (DIV,DIV)=g d - g^2 s^2.
        P_div = (
            -g * s * r1[None, :]
            + g * g * s * (2.0 + d - g * q) * r3[None, :]
            - g * g * s * dt * r4[None, :]
            + (g * d - g * g * s * s) * r5[None, :]
        )
        div_u = jnp.sum(k * P_div, axis=1) + (-g) * jnp.sum(
            kb * sb * r2[None, :], axis=1
        )

        # LAP_x: (LAP,ID)=lap; (LAP,LAP)=g^2(g^2 q^2 - gq(2d+4) + d(d+2));
        #        (LAP,DT)=g dt lap; (LAP,DIV)=-g^2 s(2+d-gq).
        P_lap = (
            lap * r1[None, :]
            + g * g * (g * g * q * q - g * q * (2.0 * d + 4.0) + d * (d + 2.0))
            * r3[None, :]
            + g * dt * lap * r4[None, :]
            - g * g * s * (2.0 + d - g * q) * r5[None, :]
        )
        qb = stb.q
        lapb = g * g * qb - g * d
        lap_u = jnp.sum(k * P_lap, axis=1) + jnp.sum(kb * lapb * r2[None, :], axis=1)

    return PosteriorOut(u=u, grad=grad, dt_u=dt_u, div_u=div_u, lap_u=lap_u)


def select_posterior_fn(backend: str, dim: int):
    """Pick the posterior implementation.

    'xla' -> :func:`posterior_eval`; 'pallas' -> the hand-tiled VMEM kernel
    (:mod:`scasml_gp_tpu.gp.pallas_posterior`); 'auto' -> pallas on TPU for
    d+1 >= 64 (where it measures faster; see bench notes in that module),
    else XLA.
    """
    if backend == "xla":
        return posterior_eval
    from scasml_gp_tpu.gp.pallas_posterior import posterior_eval_fused

    if backend == "pallas":
        return posterior_eval_fused
    if backend == "auto":
        if jax.default_backend() != "cpu" and dim + 1 >= 64:
            return posterior_eval_fused
        return posterior_eval
    raise ValueError(f"unknown posterior backend {backend!r}")


def posterior_eval(
    x: jax.Array,
    x_dom: jax.Array,
    x_bdy: jax.Array,
    r: jax.Array,
    gamma,
    dim: int,
    want_grad: bool = False,
    want_ops: bool = False,
    chunk: Optional[int] = None,
) -> PosteriorOut:
    """Fused posterior over x (n, d+1).

    ``chunk`` bounds the (chunk x N_train) intermediate size; when set, the
    batch is padded to a multiple and processed with ``lax.map`` (static
    shapes, single compiled body).
    """
    gamma = jnp.asarray(gamma, jnp.float32)
    n = x.shape[0]
    if chunk is None or n <= chunk:
        return _posterior_block(
            x, x_dom, x_bdy, r, gamma, dim, want_grad, want_ops
        )
    pad = (-n) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xp = xp.reshape(-1, chunk, x.shape[1])
    out = jax.lax.map(
        lambda xc: _posterior_block(
            xc, x_dom, x_bdy, r, gamma, dim, want_grad, want_ops
        ),
        xp,
    )
    def unchunk(v):
        if v is None:
            return None
        return v.reshape((-1,) + v.shape[2:])[:n]
    return PosteriorOut(*(unchunk(v) for v in out))
