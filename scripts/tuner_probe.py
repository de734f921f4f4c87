"""Judge-score vs test-error audit for the grid tuner.

For every candidate in the flagless tuner grid, train ONCE at full size
and record (a) the single-rollout ScaSML correction-energy score
E[u_breve^2] (the round-5 selection rule), (b) the two-rollout
cross-product score E[ub1*ub2] — an unbiased estimate of the squared
error field with no additive MC-variance term — and (c) the true test
rel-L2 against the exact solution (reporting only; the tuner never sees
it).  This audits the selection rule at a given dimension: a healthy
judge's picked candidate should be within noise of the test-optimal one.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tuner_probe.py \
        --dim 100 [--equation GradDependentNonlinear] [--out reports/...]
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import json

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--equation", default="GradDependentNonlinear")
    p.add_argument("--dim", type=int, default=100)
    p.add_argument("--num-domain", type=int, default=1000)
    p.add_argument("--num-boundary", type=int, default=200)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--judge-M", type=int, default=8)
    p.add_argument("--judge-n", type=int, default=2)
    p.add_argument("--val-sets", type=int, default=3)
    p.add_argument("--val-fraction", type=float, default=0.4)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from scasml_gp_tpu.config import GPConfig
    from scasml_gp_tpu.equations import EQUATIONS
    from scasml_gp_tpu.gp.state import GPState
    from scasml_gp_tpu.harness.runner import GP_CLASSES
    from scasml_gp_tpu.picard.scasml import ScaSMLFullHistory

    eq = EQUATIONS[args.equation](n_input=args.dim + 1)
    x_dom, x_bdy = eq.generate_data(
        args.num_domain, args.num_boundary, key=jax.random.PRNGKey(args.seed)
    )
    x_test, _ = eq.generate_test_data(1000, 200,
                                      key=jax.random.PRNGKey(args.seed + 1))
    exact = np.asarray(eq.exact_solution(x_test), np.float64).ravel()

    gp_cls = GP_CLASSES[args.equation]
    base = GPConfig()
    n_dom = x_dom.shape[0]

    gp = gp_cls(eq, base)
    bg = eq.g(x_bdy)[:, 0].astype(jnp.float32)
    rhs = gp.form.rhs_f(x_dom).astype(jnp.float32)

    judge_gp = gp_cls(eq, base)
    judge = ScaSMLFullHistory(eq, judge_gp, variance_guard=False)
    geom = eq.geometry()
    n_val = max(64, int(n_dom * args.val_fraction))
    val_sets = [
        geom.sample_domain(jax.random.PRNGKey(args.seed + 7 * (i + 1)), n_val)
        for i in range(args.val_sets)
    ]

    rows = []
    # same grid as the flagless runner/campaign path
    for rs, gsc in itertools.product((0.0, 10.0, 30.0, 100.0, 300.0),
                                     (1.0, 0.3, 0.1, 0.05)):
        config = dataclasses.replace(base, ridge_scale=rs, gamma_scale=gsc)
        gamma = jnp.asarray(gp_cls(eq, config).gamma, jnp.float32)
        state = gp._train_jit(
            x_dom, x_bdy, bg, rhs, gamma, jnp.float32(base.nugget),
            steps=base.gn_steps, damping=base.damping,
            grad_tol=base.grad_tol, init_scale=base.init_scale,
        )
        judge_gp.state = GPState(
            x_dom=x_dom, x_bdy=x_bdy, right_vector=state.right_vector,
            sol=jnp.zeros((3 * n_dom,), jnp.float32), gamma=gamma,
            loss_history=jnp.zeros((1,), jnp.float32),
        )
        energy = cross = 0.0
        for si, val_d in enumerate(val_sets):
            judge.key = jax.random.PRNGKey(args.seed + 101 * (si + 1))
            ub1 = judge.uz_solve(args.judge_n, None, val_d, M=args.judge_M)[:, :1]
            judge.key = jax.random.PRNGKey(args.seed + 101 * (si + 1) + 53)
            ub2 = judge.uz_solve(args.judge_n, None, val_d, M=args.judge_M)[:, :1]
            energy += float(jnp.mean(ub1 * ub1))
            cross += float(jnp.mean(ub1 * ub2))
        pred = np.asarray(judge_gp.predict(x_test), np.float64).ravel()
        rel = float(np.linalg.norm(pred - exact) / np.linalg.norm(exact))
        rows.append({"ridge_scale": rs, "gamma_scale": gsc,
                     "energy": energy / len(val_sets), "cross": cross / len(val_sets),
                     "test_rel_L2": rel})
        print(f"ridge={rs:6.1f} gamma={gsc:5.2f}  energy={energy / len(val_sets):.4e}"
              f"  cross={cross / len(val_sets):.4e}  test={rel:.4f}", flush=True)

    by_test = sorted(rows, key=lambda r: r["test_rel_L2"])
    out = {"equation": args.equation, "dim": args.dim,
           "judge_M": args.judge_M, "judge_n": args.judge_n, "rows": rows,
           "test_best": by_test[0]}
    for score in ("energy", "cross"):
        pick = min(rows, key=lambda r: r[score])
        out[f"{score}_pick"] = pick
        out[f"{score}_regret"] = pick["test_rel_L2"] - by_test[0]["test_rel_L2"]
        out[f"{score}_test_rank_of_pick"] = sorted(
            r["test_rel_L2"] for r in rows).index(pick["test_rel_L2"])
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print("written:", args.out)


if __name__ == "__main__":
    main()
