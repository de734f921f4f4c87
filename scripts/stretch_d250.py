"""BASELINE.json config 5: HJB / Allen-Cahn at d=250 (stretch PDEs).

The reference has no HJB or Allen-Cahn capability at all; this demo runs both
through the full GP + MLP + ScaSML pipeline at d=250 — far beyond the
reference's d=80 ceiling — and records accuracy + wall-clock artifacts under
``reports/d250_stretch/``.

Two legs:

  python scripts/stretch_d250.py             # virtual-mesh correctness (CPU,
                                             # 8 devices): the data-sharded
                                             # ScaSML rollout must match the
                                             # unsharded one bit-for-bit up to
                                             # reduction order
  PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/stretch_d250.py --tpu       # full-size accuracy + timing on
                                             # the real chip

HJB uses the Cole-Hopf semigroup GP (gp/cole_hopf.py) whose exact solution is
itself Cole-Hopf MC; Allen-Cahn has no closed form, so its reference is a
deeper Picard run (harness.metrics.mc_reference_solution).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

D = 250
OUT_DIR = "reports/d250_stretch"


def _rel(a, b):
    import numpy as np

    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def _timed(fn, *args, **kwargs):
    import jax

    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args, **kwargs))
    return out, time.perf_counter() - t0


def leg_mesh_check():
    """Virtual 8-device CPU mesh: sharded vs unsharded HJB ScaSML at d=250."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from scasml_gp_tpu.config import GPConfig
    from scasml_gp_tpu.equations import HJB
    from scasml_gp_tpu.gp.cole_hopf import GPHJBColeHopf
    from scasml_gp_tpu.parallel.mesh import make_mesh
    from scasml_gp_tpu.picard import ScaSMLFullHistory

    eq = HJB(n_input=D + 1)
    gp = GPHJBColeHopf(eq, GPConfig())
    x_dom, x_bdy = eq.generate_data(250, 50, key=jax.random.PRNGKey(3))
    gp.GPsolver(x_dom, x_bdy)

    x_test = eq.geometry().sample_domain(jax.random.PRNGKey(6), 32)
    mesh = make_mesh(data=8, model=1)
    u_single = np.asarray(
        ScaSMLFullHistory(eq, gp).u_solve(2, None, x_test, M=4)
    )
    u_mesh = np.asarray(
        ScaSMLFullHistory(eq, gp, mesh=mesh).u_solve(2, None, x_test, M=4)
    )
    max_diff = float(np.max(np.abs(u_mesh - u_single)))
    scale = float(np.max(np.abs(u_single)))
    summary = {
        "leg": "virtual 8-device mesh correctness (HJB d=250, ScaSML FH)",
        "mesh": "8x1 (data, model)",
        "n": 2,
        "M": 4,
        "batch": 32,
        "max_abs_diff": max_diff,
        "u_scale": scale,
        "agree": bool(max_diff < 1e-4 * max(scale, 1.0)),
    }
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(f"{OUT_DIR}/mesh_check.json", "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary, indent=2))
    assert summary["agree"], max_diff
    return summary


def leg_tpu():
    """Full-size accuracy + wall-clock on the real chip."""
    import jax
    import numpy as np

    from scasml_gp_tpu.config import GPConfig
    from scasml_gp_tpu.equations import HJB, AllenCahn
    from scasml_gp_tpu.gp.cole_hopf import GPHJBColeHopf
    from scasml_gp_tpu.gp.semigroup import GPAllenCahnSemigroup
    from scasml_gp_tpu.harness.metrics import mc_reference_solution
    from scasml_gp_tpu.picard import MLPFullHistory, ScaSMLFullHistory

    print("devices:", jax.devices(), flush=True)
    os.makedirs(OUT_DIR, exist_ok=True)
    results = {}

    # ---- HJB d=250: semigroup GP + MLP + ScaSML vs Cole-Hopf MC ----------
    eq = HJB(n_input=D + 1)
    gp = GPHJBColeHopf(eq, GPConfig())
    x_dom, x_bdy = eq.generate_data(1600, 400, key=jax.random.PRNGKey(3))
    _, t_train = _timed(gp.GPsolver, x_dom, x_bdy)
    print(f"HJB GP fit (m=2000): {t_train:.2f}s", flush=True)

    x_test = eq.geometry().sample_domain(jax.random.PRNGKey(6), 256)
    # jit the whole MC oracle into ONE program: evaluated eagerly it issues
    # dozens of per-op relay round-trips, which intermittently wedge the
    # axon tunnel (CLAUDE.md "Environment gotchas")
    exact_fn = jax.jit(lambda xs: eq.exact_solution(xs, num_mc=32768))
    exact, t_exact = _timed(exact_fn, x_test)
    exact = np.asarray(exact)
    print(f"Cole-Hopf MC exact (32768 samples): {t_exact:.2f}s", flush=True)

    u_gp, t_gp = _timed(gp.predict, x_test)
    rel_gp = _rel(u_gp, exact)

    mlp = MLPFullHistory(eq)
    u_mlp, t_mlp = _timed(mlp.u_solve, 2, None, x_test, M=8)
    rel_mlp = _rel(np.asarray(u_mlp), exact)

    sca = ScaSMLFullHistory(eq, gp)
    u_sca, t_sca = _timed(sca.u_solve, 2, None, x_test, M=8)
    rel_sca = _rel(np.asarray(u_sca), exact)
    # a second call reuses the compiled rollout: steady-state wall-clock
    _, t_sca2 = _timed(sca.u_solve, 2, None, x_test, M=8)
    # M=32: the correction's MC variance at the converged-surrogate floor
    u_sca32, _ = _timed(sca.u_solve, 2, None, x_test, M=32)
    rel_sca32 = _rel(np.asarray(u_sca32), exact)

    # coarse-surrogate repair regime: ScaSML's actual value proposition.
    # The round-5 default is the exact mixture backend (data-free), so the
    # coarse leg must pin the scattered-RBF backend — 150 centers is the
    # genuinely coarse surrogate this leg exists to repair.
    gp_c = GPHJBColeHopf(eq, GPConfig(), terminal_backend="rbf")
    xdc, xbc = eq.generate_data(120, 30, key=jax.random.PRNGKey(30))
    gp_c.GPsolver(xdc, xbc)
    rel_gp_c = _rel(np.asarray(gp_c.predict(x_test)), exact)
    sca_c = ScaSMLFullHistory(eq, gp_c)
    u_sca_c, _ = _timed(sca_c.u_solve, 2, None, x_test, M=8)
    rel_sca_c = _rel(np.asarray(u_sca_c), exact)

    results["hjb"] = {
        "pde": "HJB u_t + Lap u - |grad u|^2 = 0, d=250, T=0.5",
        "surrogate": f"Cole-Hopf semigroup GP ({gp.terminal_backend} "
                     "terminal backend)",
        "n": 2, "M": 8, "test_points": 256,
        "rel_L2": {"GP": rel_gp, "MLP": rel_mlp, "ScaSML": rel_sca,
                   "ScaSML_M32": rel_sca32},
        "repair_regime": {
            "GP_coarse_m150": rel_gp_c,
            "ScaSML_on_coarse": rel_sca_c,
        },
        "improvement_vs_best_baseline_pct": 100.0
        * (min(rel_gp, rel_mlp) - rel_sca) / min(rel_gp, rel_mlp),
        "wallclock_s": {
            "gp_fit": t_train, "gp_predict": t_gp,
            "mlp_solve_incl_compile": t_mlp,
            "scasml_solve_incl_compile": t_sca,
            "scasml_solve_steady": t_sca2,
            "exact_mc_32768": t_exact,
        },
    }
    print(json.dumps(results["hjb"], indent=2), flush=True)

    # ---- Allen-Cahn d=250: reaction-semigroup GP + ScaSML vs deep Picard
    # (round 5: the collocation GP measured 1.62 rel-L2 here — the
    # terminal-value ill-posedness attributed in
    # reports/allen_cahn_attribution.md; the semigroup surrogate replaces
    # it at every d)
    eq2 = AllenCahn(n_input=D + 1)
    gp2 = GPAllenCahnSemigroup(eq2)
    xd2, xb2 = eq2.generate_data(400, 100, key=jax.random.PRNGKey(0))
    _, t_train2 = _timed(gp2.GPsolver, xd2, xb2)
    print(f"Allen-Cahn GP train: {t_train2:.2f}s", flush=True)

    x_test2 = eq2.geometry().sample_domain(jax.random.PRNGKey(1), 128)
    ref, t_ref = _timed(
        mc_reference_solution, eq2, x_test2, n=3, M=8
    )
    ref = np.asarray(ref)

    u_gp2, t_gp2 = _timed(gp2.predict, x_test2)
    rel_gp2 = _rel(u_gp2, ref)
    mlp2 = MLPFullHistory(eq2)
    u_mlp2, t_mlp2 = _timed(mlp2.u_solve, 2, None, x_test2, M=8)
    rel_mlp2 = _rel(np.asarray(u_mlp2), ref)
    sca2 = ScaSMLFullHistory(eq2, gp2)
    u_sca2, t_sca2b = _timed(sca2.u_solve, 2, None, x_test2, M=8)
    rel_sca2 = _rel(np.asarray(u_sca2), ref)

    results["allen_cahn"] = {
        "pde": "Allen-Cahn u_t + Lap u + u - u^3 = 0, d=250, T=0.3",
        "surrogate": "reaction-semigroup GP (Bernstein mixture, "
                     "gp/semigroup.py)",
        "round4_collocation_GP_rel_L2": 1.6200271766771754,
        "reference": "deep Picard (n=3, M=8)",
        "n": 2, "M": 8, "test_points": 128,
        "rel_L2": {"GP": rel_gp2, "MLP": rel_mlp2, "ScaSML": rel_sca2},
        "improvement_vs_best_baseline_pct": 100.0
        * (min(rel_gp2, rel_mlp2) - rel_sca2) / min(rel_gp2, rel_mlp2),
        "wallclock_s": {
            "gp_train": t_train2, "gp_predict": t_gp2,
            "mlp_solve_incl_compile": t_mlp2,
            "scasml_solve_incl_compile": t_sca2b,
            "picard_reference_n3_M8": t_ref,
        },
    }
    print(json.dumps(results["allen_cahn"], indent=2), flush=True)

    with open(f"{OUT_DIR}/d250_tpu.json", "w") as fh:
        json.dump(results, fh, indent=2)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="full-size accuracy + timing on the real chip")
    args = ap.parse_args()
    if args.tpu:
        leg_tpu()
    else:
        leg_mesh_check()
    sys.exit(0)
