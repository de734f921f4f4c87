"""Honest kernel timing through a remote-device relay.

Host-side protocols are unreliable here:

- strict per-call sync includes the host<->device round trip (~20 ms through
  the axon relay), swamping sub-millisecond kernels;
- the queued protocol (enqueue N calls, block once) under-reports through the
  relay — measured 0.04 ms for a call whose output traffic alone needs
  >= 0.16 ms of HBM time (see reports/posterior_probe.md).

``device_loop_time`` instead chains ``iters`` data-dependent invocations of
the kernel inside ONE jitted program (a ``lax.fori_loop`` whose carry
perturbs the input, so XLA can neither CSE the calls nor overlap them), and
differences two loop lengths to cancel the fixed dispatch/RTT cost:

    t_per_call = (t(iters) - t(base_iters)) / (iters - base_iters)
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("fn", "iters"))
def _chained(fn: Callable, x: jax.Array, iters: int):
    """Run ``fn`` ``iters`` times with a serial data dependency through x."""

    def body(_, carry):
        acc, x_cur = carry
        out = fn(x_cur)
        # Reduce EVERY output element to one scalar and fold it (at epsilon
        # scale) back into the input.  Consuming every element matters: a
        # partial reduction (e.g. out.u[0]) lets XLA dead-code-eliminate the
        # rest of the computation, silently benchmarking a fraction of the
        # kernel — while an opaque pallas_call cannot be DCE'd, making any
        # comparison unfair.  The full reductions are O(outputs), negligible
        # next to the O(n*N) kernel work.
        s = sum(
            jnp.sum(leaf.astype(jnp.float32))
            for leaf in jax.tree_util.tree_leaves(out)
        )
        return acc + s, x_cur + s * jnp.float32(1e-30)

    acc, _ = jax.lax.fori_loop(
        0, iters, body, (jnp.float32(0.0), x.astype(jnp.float32))
    )
    return acc


def _timed_call(fn, x, iters, reps):
    """Time the chained loop, forcing completion by FETCHING the scalar
    result (``float(...)``), not ``block_until_ready``: through the axon
    relay, block_until_ready on a device scalar returns at ~dispatch time
    for fast programs (measured: a 128x-longer loop took the same 0.07 ms
    "blocked" wall time; fetching the value scaled linearly as it must).
    The fetch adds one 4-byte round trip per call — a fixed cost the
    two-loop-length differencing cancels exactly."""
    float(_chained(fn, x, iters))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(_chained(fn, x, iters))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def device_loop_time(
    fn: Callable, x: jax.Array, iters: int = 96, base_iters: int = 32,
    reps: int = 5,
) -> float:
    """Per-call device seconds of ``fn(x)``, dispatch cost cancelled.

    ``fn`` must take the (perturbable, float) array ``x`` as its only
    positional argument — close over everything else.

    Both loop lengths should be LARGE (defaults 96/32): the relay's
    dispatch-cost variance is a few ms, so the differenced span
    ``(iters - base_iters) * t_call`` must dominate it.  Measured on the
    fused posterior (n=8192, d=20): slopes over (8,32), (32,96), (96,256)
    agree within 8%% at these sizes, while the old (32,2) pairing
    under-reported by ~28%%.
    """
    if base_iters >= iters:
        base_iters = max(iters // 3, 1)
    t_hi = _timed_call(fn, x, iters, reps)
    t_lo = _timed_call(fn, x, base_iters, reps)
    return max(t_hi - t_lo, 1e-9) / (iters - base_iters)
