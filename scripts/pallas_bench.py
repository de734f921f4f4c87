"""Microbenchmark: XLA fused posterior vs Pallas tile kernel.

Sweeps (d, n_eval, N_train) over the regimes that matter — the ScaSML tree
node batch (moderate n, every op) and the bulk-predict path (large n) — and
prints per-call DEVICE time for both backends plus the speedup.  Used to set
the 'auto' backend crossover in gp/posterior.select_posterior_fn and to
evaluate kernel tiling changes.

Timing is the in-graph chained-loop protocol (utils/timing.device_loop_time):
host-side protocols are unreliable through the remote device relay — the
queued protocol under-reports (it produced the physically impossible
0.04-0.1 ms rows of the round-1 reports/pallas_bench.json, including the
"pallas 4-5 orders faster at n=65536" claim), and the round-1 5,497 ms XLA
outlier was an eager-closure re-compile through the remote-compile tunnel,
fixed by jitting posterior_eval at top level (see
reports/posterior_probe.md).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_bench.py
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

from scasml_gp_tpu.utils.timing import device_loop_time


def main():
    from scripts.pallas_posterior import posterior_eval_fused
    from scasml_gp_tpu.gp.posterior import posterior_eval

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    rows = []
    for d in (20, 100, 250):
        for n in (1200, 8192, 65536):
            # enough chained iterations that the loop body dwarfs relay
            # round-trip jitter (~ms): target >= 10 ms of device work
            iters = {1200: 256, 8192: 64}.get(n, 16)
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
                    def xla_fn(xx, wg=want_grad, wo=want_ops):
                        return posterior_eval(
                            xx, x_dom, x_bdy, r, gamma, d,
                            want_grad=wg, want_ops=wo, chunk=8192,
                        )

                    def pallas_fn(xx, wg=want_grad, wo=want_ops):
                        return posterior_eval_fused(
                            xx, x_dom, x_bdy, r, gamma, d,
                            want_grad=wg, want_ops=wo,
                        )

                    t_x = device_loop_time(xla_fn, x, iters=iters)
                    t_p = device_loop_time(pallas_fn, x, iters=iters)
                    row = {"d": d, "n": n, "N": N, "outputs": tag,
                           "xla_ms": round(t_x * 1e3, 4),
                           "pallas_ms": round(t_p * 1e3, 4),
                           "speedup": round(t_x / t_p, 2)}
                    rows.append(row)
                    print(json.dumps(row), flush=True)
    wins = [r for r in rows if r["speedup"] > 1.0]
    print(f"# pallas wins {len(wins)}/{len(rows)} regimes",
          file=sys.stderr)


if __name__ == "__main__":
    main()
