"""Pallas TPU kernel for the fused GP posterior evaluation.

The XLA path (:mod:`scasml_gp_tpu.gp.posterior`) materializes several
(n x N_train) coefficient matrices in HBM per output (u, dt, div, lap, grad
coefficients); at large n (every Picard tree node) and large N_train this is
HBM-bandwidth bound.  This kernel computes everything in one pass over
(TI x TJ) VMEM tiles:

  - ONE MXU matmul per tile pair produces the pairwise inner products;
  - the pair statistics (r2, q, s, dt) and all weighted polynomial blocks are
    VPU elementwise math on the tile, never touching HBM;
  - row-reductions accumulate the outputs [u, dt_u, div_u, lap_u, and the
    gradient's rank-1 coefficients] into an (8, n) block revisited across the
    y-tile grid axis; the gradient's dense terms (A_sp @ Y, A_t @ Y) are two
    more MXU matmuls per tile.

Memory traffic drops from O(n*N) per output to O(n*N_feature_tiles) input reads
+ O(n) outputs — the speed-of-light layout for this contraction.

Supports the separable space/time kernel (gs, gt) of
:mod:`scasml_gp_tpu.gp.kernels`.  Interface: :func:`dom_posterior_tiles`
computes the interior-set contribution; the (small) boundary-set contribution
and the final gradient assembly stay in XLA (:func:`posterior_eval_fused`),
giving results identical to the reference semantics (models/GP.py
predict/compute_gradient/compute_PDE_loss).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scasml_gp_tpu.gp.kernels import pair_stats, split_gamma
from scasml_gp_tpu.gp.posterior import PosteriorOut, _split_r

# Output row layout of the (8, n) ops block.
ROW_U, ROW_DT, ROW_DIV, ROW_LAP, ROW_ASP, ROW_AT, ROW_C, ROW_E = range(8)

_TI = 256   # x-tile (eval points)
_TJ = 256   # y-tile (training points)


def _cdiv(a, b):
    return -(-a // b)


def _round_up(a, b):
    return _cdiv(a, b) * b


def _kernel(
    g_ref, x_ref, xs_ref, y_ref, r_ref, ops_ref, *grad_refs,
    d: int, want_ops: bool, want_grad: bool,
):
    j = pl.program_id(1)
    gs = g_ref[0, 0]
    gt = g_ref[0, 1]
    gr = g_ref[0, 2]
    G = gs + d * gr
    beta = 2.0 * gs * gr + d * gr * gr

    y = y_ref[:]                                    # (TJ, Fp)
    x = x_ref[:]                                    # (TI, Fp)
    # Pair inner products on the MXU; everything else is VPU math.
    xyT = jax.lax.dot_general(
        y, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                               # (TJ, TI)

    yn2 = jnp.sum(y * y, axis=1, keepdims=True)     # (TJ, 1)
    yt = y[:, d : d + 1]                            # (TJ, 1)
    ys = jnp.sum(y, axis=1, keepdims=True) - yt     # spatial sum
    xn2 = xs_ref[0:1, :]                            # (1, TI)
    xs = xs_ref[1:2, :]
    xt = xs_ref[2:3, :]

    r2 = jnp.maximum(yn2 + xn2 - 2.0 * xyT, 0.0)
    dt = xt - yt                                    # x_t - y_t, (TJ, TI)
    s = xs - ys
    q = jnp.maximum(r2 - dt * dt, 0.0)
    kappa = jnp.exp(-0.5 * (gs * q + gr * s * s + gt * dt * dt))
    lapf = gs * gs * q + beta * s * s - d * (gs + gr)

    r1 = r_ref[:, 0:1]
    r3 = r_ref[:, 1:2]
    r4 = r_ref[:, 2:3]
    r5 = r_ref[:, 3:4]

    P_u = r1 + lapf * r3 + gt * dt * r4 + G * s * r5
    kPu = kappa * P_u

    @pl.when(j == 0)
    def _():
        ops_ref[:] = jnp.zeros_like(ops_ref)

    ops_ref[ROW_U : ROW_U + 1, :] += jnp.sum(kPu, axis=0, keepdims=True)

    if want_ops:
        P_dt = (
            -gt * dt * r1
            - gt * dt * lapf * r3
            + gt * (1.0 - gt * dt * dt) * r4
            - G * gt * s * dt * r5
        )
        P_div = (
            -G * s * r1
            + G * s * (2.0 * G - lapf) * r3
            - G * gt * s * dt * r4
            + G * (d - G * s * s) * r5
        )
        LL = (
            2.0 * d * (gs * gs + beta)
            - 4.0 * gs**3 * q
            - 4.0 * s * s * (gs * gs * gr + beta * G)
            + lapf * lapf
        )
        P_lap = (
            lapf * r1
            + LL * r3
            + gt * dt * lapf * r4
            - G * s * (2.0 * G - lapf) * r5
        )
        ops_ref[ROW_DT : ROW_DT + 1, :] += jnp.sum(kappa * P_dt, 0, keepdims=True)
        ops_ref[ROW_DIV : ROW_DIV + 1, :] += jnp.sum(kappa * P_div, 0, keepdims=True)
        ops_ref[ROW_LAP : ROW_LAP + 1, :] += jnp.sum(kappa * P_lap, 0, keepdims=True)

    if want_grad:
        asy_ref, aty_ref = grad_refs
        A_sp = -gs * kPu + 2.0 * gs * gs * kappa * r3   # delta_sp coefficient
        B_s = -gr * kPu + 2.0 * beta * kappa * r3       # s * 1_sp coefficient
        A_t = -gt * kPu                                 # dt * e_t coefficient
        ops_ref[ROW_ASP : ROW_ASP + 1, :] += jnp.sum(A_sp, 0, keepdims=True)
        ops_ref[ROW_AT : ROW_AT + 1, :] += jnp.sum(A_t, 0, keepdims=True)
        # b_s * s and the 1_sp coefficient collapse into one row scalar
        ops_ref[ROW_C : ROW_C + 1, :] += jnp.sum(
            G * kappa * r5 + B_s * s, 0, keepdims=True
        )
        ops_ref[ROW_E : ROW_E + 1, :] += jnp.sum(gt * kappa * r4, 0, keepdims=True)

        @pl.when(j == 0)
        def _():
            asy_ref[:] = jnp.zeros_like(asy_ref)
            aty_ref[:] = jnp.zeros_like(aty_ref)

        # A_sp @ Y: spatial columns used downstream; A_t @ Y: column d gives
        # the a_t . y_t matvec (the rest is discarded — MXU makes it free).
        asy_ref[:] += jax.lax.dot_general(
            A_sp, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )                                            # (TI, Fp)
        aty_ref[:] += jax.lax.dot_general(
            A_t, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )


@partial(
    jax.jit,
    static_argnames=("d", "want_ops", "want_grad", "interpret"),
)
def dom_posterior_tiles(
    x: jax.Array,       # (n, d+1) eval points
    y: jax.Array,       # (N, d+1) interior training points
    r_dom: jax.Array,   # (N, 4) columns [r1, r3, r4, r5]
    gamma,              # scalar or (2,) [gs, gt]
    d: int,
    want_ops: bool = False,
    want_grad: bool = False,
    interpret: bool = False,
):
    """Interior-set posterior contributions via the fused Pallas kernel.

    Returns (ops8 (8, n), ASY (n, Fp) | None, ATY (n, Fp) | None); Fp is the
    128-padded feature dim (slice [:, :d] / [:, d] for the true columns).
    """
    n, f = x.shape
    N = y.shape[0]
    fp = _round_up(f, 128)
    # Adaptive tiles.  When one j-tile covers every training point the y/r
    # block index is constant over the whole grid, so Pallas DMAs them into
    # VMEM exactly once; with the j-axis inner this is the speed-of-light
    # traffic layout (x streamed once, y resident).  Cap TJ so VMEM holds
    # double-buffered y+r tiles comfortably.
    # (tj*ti is capped by the ~16 MB scoped-VMEM budget: the all-outputs
    # kernel keeps ~16 (tj, ti) f32 elementwise temporaries live — 1024x256
    # tiles sit right at the limit and OOM when embedded in larger programs,
    # so cap tj at 512 there; the mean-only kernel (~9 temps) fits 1024.)
    tj_cap = 512 if (want_ops or want_grad) else 1024
    tj = min(_round_up(max(N, 8), 256), tj_cap)
    N_pad = _round_up(max(N, 8), tj)
    ti = _TI
    n_pad = _round_up(max(n, 8), ti)

    xp = jnp.zeros((n_pad, fp), jnp.float32).at[:n, :f].set(x.astype(jnp.float32))
    yp = jnp.zeros((N_pad, fp), jnp.float32).at[:N, :f].set(y.astype(jnp.float32))
    # padded r rows are zero => padded training points contribute nothing
    rp = jnp.zeros((N_pad, 128), jnp.float32).at[:N, :4].set(
        r_dom.astype(jnp.float32)
    )
    xt_col = xp[:, d]
    xs_stats = jnp.zeros((8, n_pad), jnp.float32)
    xs_stats = xs_stats.at[0].set(jnp.sum(xp * xp, axis=1))
    xs_stats = xs_stats.at[1].set(jnp.sum(xp, axis=1) - xt_col)
    xs_stats = xs_stats.at[2].set(xt_col)

    grid = (n_pad // ti, N_pad // tj)
    kernel = partial(_kernel, d=d, want_ops=want_ops, want_grad=want_grad)
    gs, gt, gr = split_gamma(gamma)
    g_arr = jnp.stack([gs, gt, gr, jnp.zeros_like(gs)]).reshape(1, 4)
    out_shapes = [jax.ShapeDtypeStruct((8, n_pad), jnp.float32)]
    out_specs = [
        pl.BlockSpec((8, ti), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    ]
    if want_grad:
        # Gradient matmul accumulators exist ONLY when asked for — an output
        # block is DMA'd to HBM every grid step whether or not the kernel
        # wrote it, which at large n is pure wasted bandwidth.
        out_shapes += [jax.ShapeDtypeStruct((n_pad, fp), jnp.float32)] * 2
        out_specs += [
            pl.BlockSpec((ti, fp), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        ] * 2

    flops_tile = 2 * ti * tj * fp * (3 if want_grad else 1)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ti, fp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ti), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tj, fp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tj, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=grid[0] * grid[1] * flops_tile,
            bytes_accessed=(n_pad * fp + N_pad * fp) * 4 * grid[1],
            transcendentals=grid[0] * grid[1] * ti * tj,
        ),
        interpret=interpret,
    )(g_arr, xp, xs_stats, yp, rp)

    ops8 = outs[0][:, :n]
    if want_grad:
        return ops8, outs[1][:n], outs[2][:n]
    return ops8, None, None


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


@partial(jax.jit, static_argnames=("dim", "want_grad", "want_ops"))
def _posterior_block_fused(
    x, x_dom, x_bdy, r, gamma, dim: int, want_grad: bool, want_ops: bool
) -> PosteriorOut:
    """Pallas interior contribution + XLA boundary contribution + assembly.

    Semantics identical to posterior._posterior_block (validated in
    tests/test_pallas.py)."""
    gs, gt, gr = split_gamma(gamma)
    d = dim
    G = gs + d * gr
    beta = 2.0 * gs * gr + d * gr * gr
    n_dom = x_dom.shape[0]
    n_bdy = x_bdy.shape[0]
    r1, r2, r3, r4, r5 = _split_r(r.astype(jnp.float32), n_dom, n_bdy)
    x = x.astype(jnp.float32)
    r_dom = jnp.stack([r1, r3, r4, r5], axis=1)

    ops8, asy, aty = dom_posterior_tiles(
        x, x_dom, r_dom, gamma, d,
        want_ops=want_ops, want_grad=want_grad,
        interpret=_use_interpret(),
    )

    # Boundary contribution (Nb is small) in plain XLA.
    stb = pair_stats(x, x_bdy, gamma)
    kb, sb, dtb, qb = stb.kappa, stb.s, stb.dt, stb.q
    u = ops8[ROW_U] + kb @ r2

    grad = None
    if want_grad:
        Ab_sp = -gs * kb * r2[None, :]
        Bb_s = -gr * kb * r2[None, :]
        Ab_t = -gt * kb * r2[None, :]
        rs_sp = ops8[ROW_ASP] + jnp.sum(Ab_sp, axis=1)
        AY_sp = asy[:, :d] + jax.lax.dot_general(
            Ab_sp, x_bdy[:, :-1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        c_row = ops8[ROW_C] + jnp.sum(Bb_s * sb, axis=1)
        grad_sp = x[:, :-1] * rs_sp[:, None] - AY_sp + c_row[:, None]
        rs_t = ops8[ROW_AT] + jnp.sum(Ab_t, axis=1)
        aty_full = aty[:, d] + Ab_t @ x_bdy[:, -1]
        grad_t = x[:, -1] * rs_t - aty_full + ops8[ROW_E]
        grad = jnp.concatenate([grad_sp, grad_t[:, None]], axis=1)

    dt_u = div_u = lap_u = None
    if want_ops:
        lapfb = gs * gs * qb + beta * sb * sb - d * (gs + gr)
        dt_u = ops8[ROW_DT] + (-gt) * jnp.sum(kb * dtb * r2[None, :], axis=1)
        div_u = ops8[ROW_DIV] + (-G) * jnp.sum(kb * sb * r2[None, :], axis=1)
        lap_u = ops8[ROW_LAP] + jnp.sum(kb * lapfb * r2[None, :], axis=1)

    return PosteriorOut(u=u, grad=grad, dt_u=dt_u, div_u=div_u, lap_u=lap_u)


def posterior_eval_fused(
    x: jax.Array,
    x_dom: jax.Array,
    x_bdy: jax.Array,
    r: jax.Array,
    gamma,
    dim: int,
    want_grad: bool = False,
    want_ops: bool = False,
    chunk: Optional[int] = None,
    operand_dtype: str = "float32",
    shard_dom=None,
) -> PosteriorOut:
    """Drop-in replacement for posterior.posterior_eval using the Pallas tile
    kernel for the interior set. ``chunk`` is accepted for API parity; the
    kernel's own tiling already bounds VMEM, so it is ignored.
    ``operand_dtype`` is likewise accepted for signature parity but the tile
    kernel keeps fp32 operands: its bottleneck is VMEM-resident elementwise
    math, not the HBM operand traffic the bf16 policy targets (and the XLA
    path is the measured-faster default anyway, reports/posterior_probe.md).
    ``shard_dom`` (model-axis contraction sharding) is accepted for parity
    but unsupported here — a pallas_call is opaque to GSPMD partitioning;
    use the XLA backend for distributed inference."""
    del chunk, operand_dtype, shard_dom
    return _posterior_block_fused(
        x, x_dom, x_bdy, r, jnp.asarray(gamma, jnp.float32), dim,
        want_grad, want_ops,
    )
