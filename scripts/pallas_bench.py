"""Microbenchmark: XLA fused posterior vs Pallas tile kernel.

Sweeps (d, n_eval, N_train) over the regimes that matter — the ScaSML tree
node batch (moderate n, every op) and the bulk-predict path (large n) — and
prints steady-state wall-clock per call for both backends plus the speedup.
Used to set the 'auto' backend crossover in gp/posterior.select_posterior_fn
and to evaluate kernel tiling changes.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_bench.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=20, **kw):
    out = jax.block_until_ready(fn(*args, **kw))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from scasml_gp_tpu.gp.pallas_posterior import posterior_eval_fused
    from scasml_gp_tpu.gp.posterior import posterior_eval

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    rows = []
    for d in (20, 100, 250):
        for n in (1200, 8192, 65536):
            for N, Nb in ((1000, 200),):
                ks = jax.random.split(key, 4)
                x = jax.random.uniform(ks[0], (n, d + 1), minval=-0.5,
                                       maxval=0.5)
                x_dom = jax.random.uniform(ks[1], (N, d + 1), minval=-0.5,
                                           maxval=0.5)
                x_bdy = jax.random.uniform(ks[2], (Nb, d + 1), minval=-0.5,
                                           maxval=0.5)
                r = jax.random.normal(ks[3], (4 * N + Nb,)) * 0.1
                gamma = jnp.array([1.0 / (0.0625 * d)] * 2 + [0.0],
                                  jnp.float32)
                for want_grad, want_ops, tag in (
                    (True, True, "all"),     # ScaSML tree-node regime
                    (False, False, "mean"),  # bulk predict
                ):
                    t_x = timeit(posterior_eval, x, x_dom, x_bdy, r, gamma,
                                 d, want_grad=want_grad, want_ops=want_ops,
                                 chunk=8192)
                    t_p = timeit(posterior_eval_fused, x, x_dom, x_bdy, r,
                                 gamma, d, want_grad=want_grad,
                                 want_ops=want_ops)
                    row = {"d": d, "n": n, "N": N, "outputs": tag,
                           "xla_ms": round(t_x * 1e3, 3),
                           "pallas_ms": round(t_p * 1e3, 3),
                           "speedup": round(t_x / t_p, 2)}
                    rows.append(row)
                    print(json.dumps(row), flush=True)
    wins = [r for r in rows if r["speedup"] > 1.0]
    print(f"# pallas wins {len(wins)}/{len(rows)} regimes",
          file=sys.stderr)


if __name__ == "__main__":
    main()
