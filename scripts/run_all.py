"""Full experiment campaign: every dimension x solver variant, one command.

TPU-native replacement for the reference's top-level ``run_all.sh``
(/root/reference/run_all.sh:1-31), which launches the eight
``results*/Grad_Dependent_Nonlinear/{20,40,60,80}d/experiment_run.py``
drivers in four 2-process groups.  Here each configuration is one
:func:`scasml_gp_tpu.harness.runner.run` call; runs execute sequentially in a
single process because (a) one process keeps the XLA compile cache warm
across dimensions and (b) this environment's TPU relay supports one client
at a time (see CLAUDE.md).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_all.py \
        --save-path results --harness RepeatedExperiment [--dims 20 40] \
        [--variants quadrature full_history] [--no-tune]

Tuning is ON by default (per-dimension validation-selected ridge kernel,
gp.tuning.tune_gp — beats the reference at every d; VERDICT round-2 #2);
pass ``--no-tune`` for reference-parity hyperparameters.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
import traceback


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dims", type=int, nargs="+",
                        default=[20, 40, 60, 80])
    parser.add_argument("--variants", nargs="+",
                        default=["quadrature", "full_history"],
                        choices=["quadrature", "full_history"])
    parser.add_argument("--equations", nargs="+",
                        default=["GradDependentNonlinear"],
                        help="PDE families to sweep (see "
                             "scasml_gp_tpu.equations.EQUATIONS)")
    parser.add_argument("--harnesses", nargs="+", dest="harnesses",
                        default=None,
                        help="harness classes to sweep (default: the single "
                             "--harness)")
    parser.add_argument("--harness", default="RepeatedExperiment")
    parser.add_argument("--save-path", default="results")
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--num-domain", type=int, default=1000)
    parser.add_argument("--num-boundary", type=int, default=200)
    parser.add_argument("--tuned", action="store_true", default=True,
                        help="per-dimension validation-tuned ridge kernel "
                             "(the DEFAULT; it beats the reference at every "
                             "d — VERDICT round-2 #2)")
    parser.add_argument("--no-tune", dest="tuned", action="store_false",
                        help="reference-parity hyperparameters (no tuning)")
    parser.add_argument("--fit-ml", action="store_true",
                        help="per-dimension marginal-likelihood (MAP) fit of "
                             "the kernel hyperparameters (gp/marginal.py)")
    args = parser.parse_args(argv)

    from scasml_gp_tpu.config import RunConfig
    from scasml_gp_tpu.equations import EQUATIONS
    from scasml_gp_tpu.gp.tuning import tune_gp
    from scasml_gp_tpu.harness.runner import GP_CLASSES, run

    harnesses = args.harnesses or [args.harness]
    campaign = [
        (e, d, v, h)
        for e in args.equations
        for d in args.dims
        for v in args.variants
        for h in harnesses
        # SimpleScaling sweeps the full-history sample base M
        # (reference tests/SimpleScaling.py) — quadrature has no M axis
        if not (h == "SimpleScaling" and v == "quadrature")
    ]
    summary = {}
    tuned_cache = {}
    for i, (equation, dim, variant, harness) in enumerate(campaign):
        tag = f"{equation}/{dim}d/{variant}/{harness}"
        print(f"[{i + 1}/{len(campaign)}] {tag}", file=sys.stderr, flush=True)
        config = RunConfig(equation=equation, dim=dim, harness=harness,
                           save_path=args.save_path, seed=args.seed,
                           num_domain=args.num_domain,
                           num_boundary=args.num_boundary)
        config = dataclasses.replace(
            config, picard=dataclasses.replace(config.picard, variant=variant)
        )
        # HJB (Cole-Hopf) and AllenCahn (reaction-semigroup) surrogates
        # carry their own terminal-fit selection — no GPConfig tuning
        tunable = equation in ("GradDependentNonlinear", "SineNonlinear")
        if (args.tuned or args.fit_ml) and tunable:
            if (equation, dim) in tuned_cache:
                config = dataclasses.replace(
                    config, gp=tuned_cache[(equation, dim)]
                )
            else:
                import jax

                eq = EQUATIONS[config.equation](n_input=config.n_input)
                # full-size tuning: past dense_phi_max, tune_gp routes the
                # grid through the distributed dual-CG trainer
                x_dom, x_bdy = eq.generate_data(
                    config.num_domain, config.num_boundary,
                    key=jax.random.PRNGKey(config.seed),
                )
                if args.fit_ml:
                    from scasml_gp_tpu.gp.marginal import (
                        fit_gp_marginal_likelihood,
                    )

                    # seed with the grid winner, exactly like the runner
                    # CLI: the unseeded fit was the round-4 campaign_ml
                    # failure — at d >= 40 the profile-MAP descent
                    # converges to over-smooth kernels that validate and
                    # test far worse than the grid winner, and without the
                    # seed the validation guard has nothing better to pick
                    # (measured: reports/ml_tuner_diagnosis.md)
                    grid = tune_gp(
                        GP_CLASSES[config.equation], eq, x_dom, x_bdy,
                        base=config.gp,
                        ridge_scales=(0.0, 10.0, 30.0, 100.0, 300.0),
                        gamma_scales=(1.0, 0.3, 0.1, 0.05),
                    )
                    tuned = fit_gp_marginal_likelihood(
                        GP_CLASSES[config.equation], eq, x_dom, x_bdy,
                        base=config.gp, seed_configs=(grid.config,),
                    )
                else:
                    # ridge resolves the high-d mean direction; gamma_scale
                    # (overall length-scale) is the big lever at low d — the
                    # compile-shared tuner makes the 16-point grid cheap
                    tuned = tune_gp(
                        GP_CLASSES[config.equation], eq, x_dom, x_bdy,
                        base=config.gp,
                        ridge_scales=(0.0, 10.0, 30.0, 100.0, 300.0),
                        gamma_scales=(1.0, 0.3, 0.1, 0.05),
                    )
                print(f"  tuned: {tuned.config}", file=sys.stderr, flush=True)
                tuned_cache[(equation, dim)] = tuned.config
                config = dataclasses.replace(config, gp=tuned.config)
        t0 = time.perf_counter()
        try:
            result = run(config)
            summary[tag] = {
                "wall_s": round(time.perf_counter() - t0, 2),
                "metrics": _headline(result),
            }
        except Exception as e:  # keep the campaign going past one bad run
            traceback.print_exc()
            summary[tag] = {"error": f"{type(e).__name__}: {e}"}
        print(f"  -> {summary[tag]}", file=sys.stderr, flush=True)
        _write_summary(args.save_path, summary)  # checkpoint per run

    print(json.dumps(summary, indent=2))
    print(f"written: {args.save_path}/run_all_summary.json", file=sys.stderr)


def _write_summary(save_path, summary):
    """MERGE this campaign's rows into run_all_summary.json (a later partial
    campaign must not clobber earlier rows — VERDICT round-3 Weak #6).
    Legacy '20d/quadrature'-style keys are upgraded in place."""
    import os

    out = f"{save_path}/run_all_summary.json"
    merged = {}
    if os.path.exists(out):
        try:
            with open(out) as fh:
                merged = json.load(fh)
        except (OSError, json.JSONDecodeError):
            merged = {}
    upgraded = {}
    for key, val in merged.items():
        if key.count("/") == 1:  # '<dim>d/<variant>' legacy row
            key = f"GradDependentNonlinear/{key}/RepeatedExperiment"
        upgraded[key] = val
    upgraded.update(summary)
    with open(out, "w") as fh:
        json.dump(upgraded, fh, indent=2)


def _headline(result):
    """Pull the solver-level rel-L2 headline out of a harness result dict."""
    if not isinstance(result, dict):
        return result
    metrics = result.get("metrics", result)
    out = {}
    if isinstance(metrics, dict):
        # RepeatedExperiment: {metric: {solver: {mean, ...}}}
        rel = metrics.get("rel_L2")
        if isinstance(rel, dict):
            for solver, st in rel.items():
                out[solver] = st.get("mean", st) if isinstance(st, dict) else st
        else:
            # SimpleUniform: {solver: {metric: value}}
            for solver, vals in metrics.items():
                if isinstance(vals, dict) and "rel_L2" in vals:
                    out[solver] = vals["rel_L2"]
    if out:
        return {"rel_L2": out}
    return {k: result[k] for k in list(result)[:4] if not k.startswith("raw")}


if __name__ == "__main__":
    main()
