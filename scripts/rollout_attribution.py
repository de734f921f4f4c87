"""Attribute the flagship ScaSML rollout's roofline gap (VERDICT round-4 #4).

reports/mfu.json has `scasml_rollout(B=1200,d=20,n=2,M=3)` at 0.67 of the
three-ceiling roofline; every other VPU row got an attribution or a fix.
This script decomposes the rollout into its phases, times each IN ISOLATION
with the same in-graph chained-loop protocol, and scores each against its
own roofline — plus measures the built-but-never-reported
``path_dtype='bfloat16'`` variant (picard/core.py:69).

Phase inventory for the full-history ScaSML tree (n = 2, M = 3, B rows,
``f_zero_at_zero`` skipping level-0 f sweeps), derived from
picard/core.py build_full_history_uz:

  - terminal g_breve posterior (u only):   rows B*M^2 (top) + B*M*M (inner)
  - leaf residual posterior (u + ops):     rows B*M^2 (l=0) + B*M*M (inner)
  - f_breve posterior (u + grad):          rows B*M   (l=1 positive term)
  - path skeleton: Brownian sampling, z accumulation, clips — measured as
    the plain-MLP rollout of the same schedule (its f/g are a few fused
    elementwise ops, negligible next to the path work)

The sum of isolated phases vs the fused whole bounds what fusion already
buys; the per-phase roofline fractions say which phase owns the missing
third.  Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/rollout_attribution.py
Writes reports/rollout_attribution.json.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "scripts")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mfu import chip_peaks, entry, vpu_peaks, xla_costs
    from scasml_gp_tpu.config import GPConfig, PrecisionPolicy
    from scasml_gp_tpu.equations import GradDependentNonlinear
    from scasml_gp_tpu.gp import GPGradDependentNonlinear
    from scasml_gp_tpu.picard.mlp import MLPFullHistory
    from scasml_gp_tpu.picard.scasml import ScaSMLFullHistory
    from scasml_gp_tpu.utils.timing import device_loop_time

    err = lambda *a: print(*a, file=sys.stderr, flush=True)
    kind, (peak_tf, peak_bw) = chip_peaks()
    vpu_tf, exp_rate, overlap = vpu_peaks()
    peaks = (peak_tf, peak_bw, vpu_tf, exp_rate, overlap)
    err(f"device {kind}")

    B, d, n, M = 1200, 20, 2, 3
    eq = GradDependentNonlinear(n_input=d + 1)
    gp = GPGradDependentNonlinear(eq, GPConfig(gn_steps=8))
    x_dom, x_bdy = eq.generate_data(1000, 200, key=jax.random.PRNGKey(0))
    gp.GPsolver(x_dom, x_bdy)
    sca = ScaSMLFullHistory(eq, gp)
    x_t = eq.geometry().sample_domain(jax.random.PRNGKey(1), B)
    params = sca._params()
    key = jax.random.PRNGKey(2)

    rows = []
    out = {"workload": f"B={B},d={d},n={n},M={M}", "phases": rows}

    def measure(name, fn, x):
        t = device_loop_time(fn, x, iters=96, base_iters=32)
        total, trans, bytes_ = xla_costs(fn, x)
        # MXU flops: every dot in these phases is a posterior pair-stat /
        # contraction matmul; reuse mfu's analytic counts where needed.
        return t, total, trans, bytes_

    # ---- full rollout (the mfu row, re-measured for a same-day baseline)
    fn_full = sca._get_fn((n, M))
    full = lambda xt: fn_full(xt, key, params)
    t_full = device_loop_time(full, x_t, iters=96, base_iters=32)
    err(f"full rollout: {t_full*1e3:.3f} ms")
    out["full_ms"] = round(t_full * 1e3, 4)

    # ---- bf16 path variant (the knob nothing ever measured)
    sca16 = ScaSMLFullHistory(
        eq, gp, precision=PrecisionPolicy(rollout="bfloat16")
    )
    fn16 = sca16._get_fn((n, M))
    full16 = lambda xt: fn16(xt, key, params)
    t16 = device_loop_time(full16, x_t, iters=96, base_iters=32)
    u32 = np.asarray(full(x_t))
    u16 = np.asarray(full16(x_t))
    exact = np.asarray(eq.exact_solution(x_t)).ravel()
    u_hat = np.asarray(gp.predict(x_t)).ravel()
    rel32 = np.linalg.norm(u_hat + u32[:, 0] - exact) / np.linalg.norm(exact)
    rel16 = np.linalg.norm(u_hat + u16[:, 0] - exact) / np.linalg.norm(exact)
    out["bf16_path"] = {
        "time_ms": round(t16 * 1e3, 4),
        "speedup_vs_fp32": round(t_full / t16, 3),
        "rel_L2_fp32": float(rel32),
        "rel_L2_bf16": float(rel16),
    }
    err(f"bf16 path: {t16*1e3:.3f} ms ({t_full/t16:.2f}x), "
        f"rel {rel32:.4f} -> {rel16:.4f}")

    # ---- phase: posterior calls in isolation (same shapes/chunking)
    mf_top, mf_in = M ** n, M * M

    def g_phase(xt):
        big = jnp.tile(xt, (mf_top, 1))
        a = gp.posterior_u(params, big).u
        b = gp.posterior_u(params, jnp.tile(xt, (mf_in, 1))).u
        return a.sum() + b.sum()

    def leaf_phase(xt):
        a = gp.residual_u(params, jnp.tile(xt, (mf_top, 1)))
        b = gp.residual_u(params, jnp.tile(xt, (mf_in, 1)))
        return a.sum() + b.sum()

    def f_phase(xt):
        o = gp.posterior_u(params, jnp.tile(xt, (M, 1)), want_grad=True)
        return o.u.sum() + o.grad.sum()

    mlp = MLPFullHistory(eq)
    fn_mlp = mlp._get_fn((n, M))
    skel = lambda xt: fn_mlp(xt, key, None)

    for name, fn in (("posterior_g_breve(u)", g_phase),
                     ("posterior_leaf(u+ops)", leaf_phase),
                     ("posterior_f_breve(u+grad)", f_phase),
                     ("path_skeleton(mlp_rollout)", skel)):
        # phase-level MXU flop counts from mfu's analytic posterior model
        from mfu import _posterior_mxu_flops
        N, Nb = 1000, 200
        if name.startswith(("posterior_g", "posterior_leaf")):
            mxu = _posterior_mxu_flops(B * mf_top, N, Nb, d, False) + \
                _posterior_mxu_flops(B * mf_in, N, Nb, d, False)
        elif name.startswith("posterior_f"):
            mxu = _posterior_mxu_flops(B * M, N, Nb, d, True)
        else:
            mxu = 0.0
        for attempt in range(3):  # relay-noise gate violations: remeasure
            try:
                t, total, trans, bytes_ = measure(name, fn, x_t)
                row = entry(name, t, mxu, total, trans, bytes_, peaks)
                break
            except AssertionError as e:
                err(f"gate violation on {name} (attempt {attempt+1}): {e}")
        else:
            raise RuntimeError(f"phase {name} kept violating the gate")
        rows.append(row)
        err(json.dumps(row))

    t_sum = sum(r["time_ms"] for r in rows)
    out["sum_of_phases_ms"] = round(t_sum, 4)
    out["fusion_gain"] = round(t_sum / (t_full * 1e3), 3)
    with open("reports/rollout_attribution.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
