"""Validation-based GP hyperparameter selection (on-device).

The reference has no hyperparameter fitting at all — kernel width and nugget
are hardcoded (models/GP.py:25-26).  BASELINE.json's north star asks for
on-device GP hyperparameter fitting; this module implements it WITHOUT
peeking at the exact solution.

Candidates are judged by the framework's own calibrated estimator
(round 5):

    score = mean over held-out interior points of  u_breve(X_val)^2,

where ``u_breve`` is the candidate surrogate's ScaSML residual-Picard
correction (picard/scasml.py) — a direct, low-variance Monte-Carlo
estimate of the candidate's OWN error field u - u_hat (the rollout runs on
the residual PDE, so its variance scales with the error it measures, not
with u).  Common random numbers across candidates (the rollout key is
reset per candidate) cancel most of the remaining MC noise from the
comparison.

Two earlier scores measurably mis-rank at d >= 60 and are retired:

- out-of-sample PDE residual eps^2 + boundary mismatch (rounds 2-4): a
  residual metric structurally REWARDS over-smooth kernels (damped
  derivatives shrink eps regardless of solution error — the same pathology
  as the profile-NLML objective, reports/ml_tuner_diagnosis.md); at d=60
  it stably ranked a config testing 0.116 above one testing 0.051.
- distance to an independent plain-MLP MC anchor: the shallow estimator's
  own bias correlates with exactly the over-smooth candidates' error
  pattern, reproducing the same mis-ranking at any tested anchor strength
  (n=2 M=8 and n=3 M=16).

Measured with the ScaSML judge at d=60: the score's top-3 candidates ARE
the test top-3 (0.052/0.060/0.049), and the previously mis-chosen config
drops to 4th-from-bottom.  (reports/tuner_judge.md)

The search is a small grid over (time_scale, ridge_scale, gamma_scale,
nugget); every candidate shares compiled train+rollout programs (traced
gamma/nugget and a GPState pytree), and scores are averaged over two
independent 80/20 splits.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scasml_gp_tpu.config import GPConfig


@dataclasses.dataclass
class TuneResult:
    config: GPConfig
    score: float
    table: list  # [(config, score), ...] over all candidates


def validation_score(gp, x_val_dom, x_val_bdy, boundary_weight: float = 1.0):
    """Out-of-sample PDE residual + boundary mismatch of a trained GP.

    DIAGNOSTIC ONLY (round 5): this residual-based score structurally
    rewards over-smooth kernels and is NOT used for selection anymore
    (module docstring); `tune_gp`/`fit_gp_marginal_likelihood` judge by
    ScaSML correction energy.  Kept for the attribution experiments
    (scripts/ml_tuner_diagnosis.py)."""
    eps = np.asarray(gp.compute_PDE_loss(x_val_dom), np.float64).ravel()
    u_b = np.asarray(gp.predict(x_val_bdy), np.float64).ravel()
    g_b = np.asarray(gp.equation.g(x_val_bdy), np.float64).ravel()
    return float(np.mean(eps**2) + boundary_weight * np.mean((u_b - g_b) ** 2))


def tune_gp(
    gp_cls,
    equation,
    x_dom,
    x_bdy,
    base: Optional[GPConfig] = None,
    time_scales: Sequence[float] = (1.0,),
    ridge_scales: Sequence[float] = (0.0, 3.0, 10.0, 30.0),
    gamma_scales: Sequence[float] = (1.0,),
    nuggets: Optional[Sequence[float]] = None,
    val_fraction: float = 0.2,
    gn_steps: Optional[int] = None,
    seed: int = 0,
    train_backend: str = "auto",
    judge_n: int = 2,
    judge_M: int = 8,
) -> TuneResult:
    """Grid-search GP hyperparameters on a held-out collocation split,
    then retrain the best candidate on the FULL data.

    Returns the winning GPConfig; the returned ``gp_cls(equation, config)``
    trained on all of (x_dom, x_bdy) is what callers should use.

    All candidates share ONE compiled train+score program (kernel gammas and
    nugget are traced arguments of ``GP._train_jit``), so a grid point costs
    an execution, not a ~40 s retrace — the same device-tunnel economics as
    gp/marginal.py, and the reason candidates run sequentially rather than
    vmapped (the batched Newton train faults the TPU runtime; see there).
    """
    base = base or GPConfig()
    nuggets = nuggets or (base.nugget,)
    x_dom = jnp.asarray(x_dom, jnp.float32)
    x_bdy = jnp.asarray(x_bdy, jnp.float32)

    n_dom, n_bdy = x_dom.shape[0], x_bdy.shape[0]
    n_vd = max(1, int(n_dom * val_fraction))
    n_vb = max(1, int(n_bdy * val_fraction))

    # TWO independent 80/20 splits, scores averaged (round 5): a single
    # split's selection is noise-displaceable between near-tied candidates
    # with very different test behavior — measured at d=60 the grid
    # flipped between (ridge 300, gamma 0.1) and (ridge 100, gamma 0.3)
    # run-to-run, whose test rel-L2 differ 2.3x.  Both splits share the
    # same compiled train+score programs (identical shapes, traced
    # gamma/nugget), so the grid stays seconds-cheap.
    splits = []
    for split_seed in (seed, seed + 1):
        key = jax.random.PRNGKey(split_seed)
        kd, kb = jax.random.split(key)
        perm_d = jax.random.permutation(kd, n_dom)
        perm_b = jax.random.permutation(kb, n_bdy)
        splits.append((
            x_dom[perm_d[n_vd:]], x_dom[perm_d[:n_vd]],
            x_bdy[perm_b[n_vb:]], x_bdy[perm_b[:n_vb]],
        ))
    tr_dom, val_dom, tr_bdy, val_bdy = splits[0]

    gp = gp_cls(equation, base)
    steps = base.gn_steps if gn_steps is None else int(gn_steps)
    dim = equation.dim

    # Large-N candidates train through the distributed dual-CG trainer
    # (gp/distributed.py): gamma/nugget are traced there too, so the grid
    # still shares ONE compiled program.  The dense trainer would need the
    # phi^2 inverse per candidate, which caps out around phi ~ 8k.
    backend = gp._resolve_train_backend(tr_dom, tr_bdy) if (
        train_backend == "auto"
    ) else train_backend
    if backend == "distributed":
        from scasml_gp_tpu.gp.distributed import make_distributed_train
        from scasml_gp_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=1, model=len(jax.devices()))
        dist_train = make_distributed_train(
            gp.form, mesh, dim, gn_steps=base.dist_gn_steps,
            cg_tol=base.dist_cg_tol, cg_maxiter=base.dist_cg_maxiter,
        )

        def train_rv(gamma, nugget, tr_dom, tr_bdy, bg_tr, rhs_tr):
            out, _ = dist_train(tr_dom, tr_bdy, bg_tr, rhs_tr, gamma, nugget)
            return out.right_vector
    else:
        def train_rv(gamma, nugget, tr_dom, tr_bdy, bg_tr, rhs_tr):
            return gp._train_jit(
                tr_dom, tr_bdy, bg_tr, rhs_tr, gamma, nugget,
                steps=steps, damping=base.damping, grad_tol=base.grad_tol,
                init_scale=base.init_scale,
            ).right_vector

    # The ScaSML judge: one shared solver instance whose compiled rollout
    # takes the trained GPState as a pytree argument, so every candidate
    # (and both splits) reuses ONE compiled program.  variance_guard off:
    # the raw correction energy IS the score.
    from scasml_gp_tpu.gp.state import GPState
    from scasml_gp_tpu.picard.scasml import ScaSMLFullHistory

    judge_gp = gp_cls(equation, base)
    judge = ScaSMLFullHistory(equation, judge_gp, variance_guard=False)

    split_tensors = []
    for tr_d, val_d, tr_b, val_b in splits:
        split_tensors.append((
            tr_d, tr_b, val_d,
            equation.g(tr_b)[:, 0].astype(jnp.float32),
            gp.form.rhs_f(tr_d).astype(jnp.float32),
        ))

    def score_one(gamma, nugget):
        total = 0.0
        for si, (tr_d, tr_b, val_d, bg_t, rhs_t) in enumerate(
            split_tensors
        ):
            rv = train_rv(gamma, nugget, tr_d, tr_b, bg_t, rhs_t)
            judge_gp.state = GPState(
                x_dom=tr_d, x_bdy=tr_b, right_vector=rv,
                sol=jnp.zeros((3 * tr_d.shape[0],), jnp.float32),
                gamma=gamma,
                loss_history=jnp.zeros((1,), jnp.float32),
            )
            # common random numbers: every candidate judges with the SAME
            # rollout key, cancelling most MC noise from the comparison
            judge.key = jax.random.PRNGKey(seed + 101 * (si + 1))
            ub = judge.uz_solve(judge_n, None, val_d, M=judge_M)[:, :1]
            total += float(jnp.mean(ub * ub))
        return total / len(split_tensors)

    table = []
    best = None
    for ts, rs, gsc, ng in itertools.product(
        time_scales, ridge_scales, gamma_scales, nuggets
    ):
        config = dataclasses.replace(
            base, time_scale=ts, ridge_scale=rs, gamma_scale=gsc, nugget=ng
        )
        gamma = jnp.asarray(gp_cls(equation, config).gamma, jnp.float32)
        score = float(score_one(gamma, jnp.float32(ng)))
        table.append((config, score))
        if best is None or score < best[1]:
            best = (config, score)

    return TuneResult(config=best[0], score=best[1], table=table)
