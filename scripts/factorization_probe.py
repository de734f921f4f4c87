"""Component-wise timing of the dense factorization (the 0.3-of-roofline
path): is the gap OUR composition or XLA's primitives?

The factorization = ONE cholesky (phi^3/3 MACs) + ONE triangular solve with
phi RHS (phi^3/2) + ONE syrk-shaped matmul (phi^3) + elementwise scaling.
This script times each XLA primitive in isolation at the production size and
compares the composition against their sum: if sum(parts) ~= whole, the
remaining roofline gap is the efficiency of XLA:TPU's cholesky/
triangular-solve primitives (blocked algorithms with serialized diagonal
panels), not anything this repo can re-arrange — the written limit argument
VERDICT round-3 Next #2 allows.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/factorization_probe.py
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp

from scasml_gp_tpu.gp.gram import gram_matrix, regularized_factorization
from scasml_gp_tpu.utils.timing import device_loop_time

PHI_N, PHI_NB, PHI_D = 1000, 200, 20  # production flagship sizes


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    x_dom = jax.random.uniform(ks[0], (PHI_N, PHI_D + 1), minval=-0.5,
                               maxval=0.5)
    x_bdy = jax.random.uniform(ks[1], (PHI_NB, PHI_D + 1), minval=-0.5,
                               maxval=0.5)
    gamma = jnp.asarray([1.0 / (0.0625 * PHI_D)] * 2 + [0.0], jnp.float32)
    K = gram_matrix(x_dom, x_bdy, gamma, PHI_D)
    phi = 4 * PHI_N + PHI_NB
    eye = jnp.eye(phi, dtype=jnp.float32)
    Ksym = 0.5 * (K + K.T) + 1e-2 * eye
    L = jnp.linalg.cholesky(Ksym)
    mxu_fp32 = 98.5e12  # v5e bf16 peak / 2 for fp32 operands

    rows = {}

    def add(name, t_s, macs):
        rows[name] = {
            "time_ms": round(t_s * 1e3, 4),
            "gflops": round(2 * macs / 1e9, 2),
            "achieved_tflops": round(2 * macs / t_s / 1e12, 2),
            "frac_of_mxu_fp32": round(2 * macs / t_s / mxu_fp32, 4),
        }

    # components (each consumed via a matvec so nothing is DCE'd)
    v = jax.random.normal(jax.random.PRNGKey(3), (phi,))
    t = device_loop_time(lambda M: jnp.linalg.cholesky(M) @ v, Ksym,
                         iters=48, base_iters=16)
    add("cholesky", t, phi**3 / 3)

    t = device_loop_time(
        lambda Lm: jax.scipy.linalg.solve_triangular(Lm, eye, lower=True) @ v,
        L, iters=48, base_iters=16,
    )
    add("triangular_solve_phi_rhs", t, phi**3 / 2)

    t = device_loop_time(
        lambda Lm: jax.lax.dot_general(
            Lm, Lm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) @ v,
        L, iters=48, base_iters=16,
    )
    add("syrk_matmul", t, phi**3)

    t = device_loop_time(
        lambda M: regularized_factorization(M, jnp.float32(1e-2))[1] @ v,
        K, iters=48, base_iters=16,
    )
    add("full_factorization", t, phi**3 / 3 + phi**3 / 2 + phi**3)

    parts = sum(
        rows[k]["time_ms"]
        for k in ("cholesky", "triangular_solve_phi_rhs", "syrk_matmul")
    )
    out = {
        "phi": phi,
        "components": rows,
        "sum_of_parts_ms": round(parts, 4),
        "whole_ms": rows["full_factorization"]["time_ms"],
        "composition_overhead": round(
            rows["full_factorization"]["time_ms"] / max(parts, 1e-9), 4
        ),
    }
    os.makedirs("reports", exist_ok=True)
    with open("reports/factorization_probe.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2), file=sys.stderr)


if __name__ == "__main__":
    main()
