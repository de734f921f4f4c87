"""Probe the large-n posterior-path timings and validate the Pallas kernel.

Round-1 VERDICT flagged the n=65536 XLA chunked-path number (5,497 ms,
reports/pallas_bench.json) as an unexplained 4-orders-of-magnitude cliff and
the headline speedups as unaccounted.  This script settles it empirically:

  - times each backend with BOTH the queued protocol of scripts/pallas_bench.py
    (enqueue `reps` calls, sync once) and a strict per-call sync protocol, so
    any asynchronous-dispatch artifact through the device relay is visible;
  - checks the Pallas kernel's outputs against the XLA path AT LARGE n ON
    DEVICE (the CI equivalence tests run in interpret mode on CPU only);
  - reports achieved FLOP/s per measurement so physically impossible numbers
    are self-evident.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/posterior_probe.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def queued_time(fn, *args, reps=10, **kw):
    """pallas_bench.py protocol: enqueue reps calls, block on the last."""
    jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def synced_time(fn, *args, reps=10, **kw):
    """Strict protocol: block_until_ready inside the timed region per call."""
    jax.block_until_ready(fn(*args, **kw))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from scripts.pallas_posterior import posterior_eval_fused
    from scasml_gp_tpu.gp.posterior import posterior_eval

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    d, N, Nb = 20, 1000, 200
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    x_dom = jax.random.uniform(ks[1], (N, d + 1), minval=-0.5, maxval=0.5)
    x_bdy = jax.random.uniform(ks[2], (Nb, d + 1), minval=-0.5, maxval=0.5)
    r = jax.random.normal(ks[3], (4 * N + Nb,)) * 0.1
    gamma = jnp.array([1.0 / (0.0625 * d)] * 2 + [0.0], jnp.float32)

    for n in (8192, 65536):
        x = jax.random.uniform(ks[0], (n, d + 1), minval=-0.5, maxval=0.5)
        # analytic pair-work: pair matmul + ~60 VPU flops per pair for the
        # all-outputs variant, plus 2 gradient matmuls
        pair_flops = 2 * n * (N + Nb) * (d + 1)
        grad_flops = 2 * 2 * n * N * (d + 1)
        vpu_flops = 60 * n * (N + Nb)
        total_flops = pair_flops + grad_flops + vpu_flops

        cases = {
            "xla_nochunk": lambda x=x: posterior_eval(
                x, x_dom, x_bdy, r, gamma, d, want_grad=True, want_ops=True,
                chunk=None),
            "xla_chunk8192": lambda x=x: posterior_eval(
                x, x_dom, x_bdy, r, gamma, d, want_grad=True, want_ops=True,
                chunk=8192),
            "pallas": lambda x=x: posterior_eval_fused(
                x, x_dom, x_bdy, r, gamma, d, want_grad=True, want_ops=True),
        }
        outs = {}
        for name, fn in cases.items():
            tq = queued_time(fn)
            tsy = synced_time(fn)
            outs[name] = fn()
            print(json.dumps({
                "n": n, "case": name,
                "queued_ms": round(tq * 1e3, 3),
                "synced_ms": round(tsy * 1e3, 3),
                "synced_tflops": round(total_flops / tsy / 1e12, 2),
            }), flush=True)

        # device-side correctness at this n: pallas vs unchunked XLA
        ux = np.asarray(outs["xla_nochunk"].u)
        up = np.asarray(outs["pallas"].u)
        gx = np.asarray(outs["xla_nochunk"].grad)
        gp_ = np.asarray(outs["pallas"].grad)
        print(json.dumps({
            "n": n, "case": "pallas_vs_xla",
            "u_rel": float(np.linalg.norm(up - ux) / np.linalg.norm(ux)),
            "grad_rel": float(np.linalg.norm(gp_ - gx) / np.linalg.norm(gx)),
            "u_max_abs": float(np.abs(up - ux).max()),
        }), flush=True)


if __name__ == "__main__":
    main()
