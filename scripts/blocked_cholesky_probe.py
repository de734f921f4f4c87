"""Measure the blocked GEMM-dominant SPD inverse against the monolithic
factorization path on the real training operand (VERDICT round-4 Next #5).

The monolithic path (gp/gram.py): jnp.linalg.cholesky (0.207 of MXU fp32)
+ phi-RHS triangular_solve (0.137) + potri syrk (1.55) = 9.25 ms at
phi = 4200.  The blocked path (gp/blocked.py) turns the panel solves and
the triangular inverse into syrk-rate GEMMs, leaving only ~n/block
block-sized cholesky panels on the critical path.  This script times both
on the equilibrated Gram of the flagship training problem
(GradDependentNonlinear d=20, N = 1000+200 -> phi = 4200) with the
honest in-graph chained-loop protocol, sweeping the base block size.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python \
        scripts/blocked_cholesky_probe.py [--out reports/blocked_cholesky.json]
"""

from __future__ import annotations

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="reports/blocked_cholesky.json")
    ap.add_argument("--blocks", type=int, nargs="*",
                    default=[350, 525, 700, 1050, 2100])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from scasml_gp_tpu.equations import GradDependentNonlinear
    from scasml_gp_tpu.gp import GPGradDependentNonlinear
    from scasml_gp_tpu.gp.blocked import blocked_spd_inverse
    from scasml_gp_tpu.gp.gram import gram_matrix, regularized_factorization
    from scasml_gp_tpu.utils.timing import device_loop_time

    err = lambda *a: print(*a, file=sys.stderr, flush=True)
    err("devices:", jax.devices())

    d = 20
    eq = GradDependentNonlinear(n_input=d + 1)
    gp = GPGradDependentNonlinear(eq)
    x_dom, x_bdy = eq.generate_data(1000, 200, key=jax.random.PRNGKey(1234))
    gamma = jnp.asarray(gp.gamma, jnp.float32)
    K = gram_matrix(x_dom, x_bdy, gamma, d)
    K = 0.5 * (K + K.T)
    phi = K.shape[0]
    nugget = jnp.float32(gp.nugget)
    # the equilibrated operand the factorization actually sees
    diag = jnp.maximum(jnp.diagonal(K), 1e-12)
    scale = jax.lax.rsqrt(diag + nugget)
    eyeK = jnp.eye(phi, dtype=K.dtype)
    M = scale[:, None] * (K + nugget * eyeK) * scale[None, :]
    M = jax.block_until_ready(M)
    err(f"phi = {phi}")

    out = {"phi": int(phi), "rows": []}

    # reference: the full monolithic regularized_factorization (what the
    # trainer runs today), timed end to end
    def mono(Kin):
        _, C = regularized_factorization(Kin, nugget)
        return C
    t_mono = device_loop_time(mono, K, iters=24, base_iters=8)
    C_ref = np.asarray(mono(K))
    out["monolithic_ms"] = round(t_mono * 1e3, 4)
    err(f"monolithic regularized_factorization: {t_mono*1e3:.3f} ms")

    # blocked sweep on the equilibrated operand (same algebraic object the
    # monolith factors internally).  Precision matters: TPU DEFAULT fp32
    # dots run reduced-precision passes that lose the Schur complement's
    # positive-definiteness on this operand (first probe run: non-finite
    # factor -> jitter retry -> 24 ms AND a different inverse); sweep the
    # explicit precision levels alongside the block size.
    best = None
    precisions = [("high", jax.lax.Precision.HIGH),
                  ("highest", jax.lax.Precision.HIGHEST)]
    for prec_name, prec in precisions:
        for blk in args.blocks:
            fn = lambda Mi, b=blk, p=prec: blocked_spd_inverse(
                Mi, block=b, precision=p
            )
            t = device_loop_time(fn, M, iters=24, base_iters=8)
            Minv = np.asarray(fn(M))
            C_blk = (np.asarray(scale)[:, None] * Minv
                     * np.asarray(scale)[None, :])
            rel = float(
                np.linalg.norm(C_blk - C_ref) / np.linalg.norm(C_ref)
            )
            row = {"block": blk, "precision": prec_name,
                   "time_ms": round(t * 1e3, 4), "rel_vs_monolith": rel}
            out["rows"].append(row)
            err(json.dumps(row))
            ok = rel < 1e-2
            if ok and (best is None or t < best[1]):
                best = ((blk, prec_name), t)

    if best is None:
        out["best_block"] = None
        out["note"] = "no accurate blocked configuration"
    else:
        out["best_block"] = best[0]
        out["best_ms"] = round(best[1] * 1e3, 4)
        out["speedup_vs_monolith"] = round(t_mono / best[1], 3)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
