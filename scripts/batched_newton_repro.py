"""Minimal repro for the batched-Newton TPU runtime fault (VERDICT r1 #8).

gp/marginal.py's validation pass runs candidates SEQUENTIALLY because a
``vmap`` of the Newton trainer at the validation-split shapes killed the TPU
worker during round 1 ("batch-4 at the full shapes works, batch-5 at
4*800+160 kills the worker", gp/marginal.py).  This script bisects batch size
at those exact shapes, executing each batch size in a SUBPROCESS so a worker
crash is recorded instead of fatal, and dumps the lowered HLO of each program
BEFORE execution so the failing module is captured even if the run dies.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/batched_newton_repro.py
    # child mode (internal): ... batched_newton_repro.py --child B

Outcome JSON -> reports/batched_newton_repro.json; HLO dumps -> results/.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_DOM, N_BDY, DIM = 800, 160, 20   # the faulting validation-split shapes
GN_STEPS = 8


def child(batch: int) -> None:
    import jax
    import jax.numpy as jnp

    from scasml_gp_tpu.config import GPConfig
    from scasml_gp_tpu.equations import GradDependentNonlinear
    from scasml_gp_tpu.gp import GPGradDependentNonlinear

    # progress markers discriminate a relay/client wedge (hang before
    # 'data ready') from the batched-program fault (hang after 'executing')
    print("phase: client init", flush=True)
    print("devices:", jax.devices(), flush=True)
    eq = GradDependentNonlinear(n_input=DIM + 1)
    base = GPConfig(gn_steps=GN_STEPS)
    gp = GPGradDependentNonlinear(eq, base)
    x_dom, x_bdy = eq.generate_data(N_DOM, N_BDY, key=jax.random.PRNGKey(0))
    bdy_g = eq.g(x_bdy)[:, 0].astype(jnp.float32)
    rhs = gp.form.rhs_f(x_dom).astype(jnp.float32)
    jax.block_until_ready(rhs)
    print("phase: data ready", flush=True)

    gammas = jnp.stack([
        jnp.asarray(gp.gamma, jnp.float32) * (1.0 + 0.1 * i)
        for i in range(batch)
    ])
    nuggets = jnp.full((batch,), 1e-2, jnp.float32)

    op = os.environ.get("REPRO_OP", "full")
    if op == "factorization":
        from scasml_gp_tpu.gp.gram import (
            gram_matrix,
            regularized_factorization,
        )

        def one(gamma, nugget):
            K = gram_matrix(x_dom, x_bdy, gamma, DIM)
            return regularized_factorization(K, nugget)[1][0]
    elif op == "newton":
        from scasml_gp_tpu.gp.gram import gram_matrix

        # factor ONE C outside the vmap; vmap only the Newton body
        K0 = gram_matrix(x_dom, x_bdy, jnp.asarray(gp.gamma, jnp.float32),
                         DIM)
        from scasml_gp_tpu.gp.gram import regularized_factorization

        _, C0 = regularized_factorization(K0, jnp.float32(1e-2))
        C0 = jax.block_until_ready(C0)

        def one(gamma, nugget):
            # gamma only perturbs the rhs so each lane differs
            return gp._train_from_C(
                C0, bdy_g * (1.0 + 0.0 * gamma[0]), rhs,
                steps=GN_STEPS, damping=base.damping,
                grad_tol=base.grad_tol, init_scale=base.init_scale,
            ).right_vector
    else:
        def one(gamma, nugget):
            return gp._train_jit(
                x_dom, x_bdy, bdy_g, rhs, gamma, nugget,
                steps=GN_STEPS, damping=base.damping, grad_tol=base.grad_tol,
                init_scale=base.init_scale,
            ).right_vector

    batched = jax.jit(jax.vmap(one))
    lowered = batched.lower(gammas, nuggets)
    os.makedirs("results", exist_ok=True)
    suffix = "" if op == "full" else f"_{op}"
    hlo_path = f"results/batched_newton_hlo_b{batch}{suffix}.txt"
    with open(hlo_path, "w") as fh:
        fh.write(lowered.as_text())
    print(f"HLO dumped: {hlo_path}", flush=True)

    print("phase: executing", flush=True)
    out = jax.block_until_ready(batched(gammas, nuggets))
    finite = bool(jnp.all(jnp.isfinite(out)))
    print(json.dumps({"batch": batch, "finite": finite,
                      "shape": list(out.shape)}), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return

    batches = [int(b) for b in sys.argv[1:]] or [1, 2, 4, 5, 6, 8]
    results = []
    for b in batches:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 str(b)],
                capture_output=True, text=True, timeout=900,
                env=dict(os.environ),
            )
            rc, out, errtxt = proc.returncode, proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as e:
            rc = "timeout"
            out = (e.stdout or b"").decode() if isinstance(
                e.stdout, bytes) else (e.stdout or "")
            errtxt = (e.stderr or b"").decode() if isinstance(
                e.stderr, bytes) else (e.stderr or "")
        ok = rc == 0 and '"finite": true' in out
        results.append({
            "batch": b,
            "returncode": rc,
            "ok": ok,
            "last_phase": ([ln for ln in out.splitlines()
                            if ln.startswith(("phase:", "HLO"))] or ["none"])[-1],
            "stdout_tail": out.strip().splitlines()[-2:],
            "stderr_tail": errtxt.strip().splitlines()[-3:],
        })
        print(json.dumps(results[-1]), flush=True)

    os.makedirs("reports", exist_ok=True)
    with open("reports/batched_newton_repro.json", "w") as fh:
        json.dump({
            "shapes": {"N_dom": N_DOM, "N_bdy": N_BDY, "dim": DIM,
                       "gn_steps": GN_STEPS},
            "results": results,
        }, fh, indent=2)


if __name__ == "__main__":
    main()
