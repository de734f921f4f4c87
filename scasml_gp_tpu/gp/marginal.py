"""On-device marginal-likelihood GP hyperparameter fitting.

The reference hardcodes kernel width and nugget (models/GP.py:25-26) and has
no fitting at all; BASELINE.json's north star asks for "GP hyperparameter
fitting ... as batched VI/marginal-likelihood optimization on-device".  This
module implements exactly that: type-II maximum likelihood over the
continuous kernel hyperparameters

    theta = (log gamma_scale, log time_scale, raw ridge_scale, log nugget)

minimizing the negative log marginal likelihood of the collocation
observations b = [z1, g_bdy, z3, F(z1,z3,z5), z5] under the zero-mean GP
prior with Gram K(theta) + nugget I:

    NLML(theta) = 1/2 b^T (K+nI)^{-1} b + 1/2 log det(K+nI)  (+ const).

Because b contains the latent collocation values (solved by the Newton
trainer), fitting alternates profile-likelihood style:

    repeat OUTER times:
        sol   <- Newton-train latents at current theta      (gp/solver.py)
        theta <- INNER Adam steps on NLML(theta; stop_grad(b(sol)))

Everything is batched: N_RESTARTS candidate thetas are trained and optimized
simultaneously via ``vmap`` over one compiled program (the whole outer round
— vmapped Newton train + ``lax.scan`` of Adam steps — is a single jit), so
the "batched ... on-device" requirement is literal: one TPU program advances
every restart in parallel, and the best candidate by final NLML wins.

Gradients flow through the Gram assembly, Jacobi equilibration, Cholesky and
triangular solve (gram.logdet_quad); the latents are stop-gradient (the
profile approximation), which keeps each Adam step at one O(phi_dim^3)
factorization instead of differentiating through 20 Newton iterations.

Two guards keep the profile approximation honest (the latents are chosen to
MINIMIZE the quadratic form, so unconstrained profile-NLML can co-adapt
toward degenerate kernels — measured: an unguarded fit at d=20 collapses
nugget to 1e-5 / gamma_scale to 0.08 and WORSENS GP rel-L2 0.147 -> 0.197):

1. the objective is MAP, with a Gaussian prior on theta (log space) centered
   at the base config (``prior_strength``); the nugget is frozen by default;
2. the final config is selected by held-out collocation validation
   (gp/tuning.py's score) among {base, all fitted candidates} — the fit can
   propose, but it cannot ship a config that validates worse than the base.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scasml_gp_tpu.config import GPConfig
from scasml_gp_tpu.gp.gram import gram_matrix, logdet_quad
from scasml_gp_tpu.gp.kernels import kernel_gammas

_SOFTPLUS_CAP = 30.0


@dataclasses.dataclass
class MarginalFitResult:
    config: GPConfig            # validation-selected, ready-to-use GPConfig
    nlml: float                 # its final negative log marginal likelihood
    table: list                 # [(GPConfig, nlml, val_score), ...] incl. base
    history: np.ndarray         # (outer_rounds, n_restarts) NLML after each round


def _theta_to_params(theta: jax.Array):
    """Unconstrained theta -> (gamma_scale, time_scale, ridge_scale, nugget)."""
    c = jnp.exp(theta[0])
    ts = jnp.exp(theta[1])
    rr = jax.nn.softplus(jnp.minimum(theta[2], _SOFTPLUS_CAP))
    ng = jnp.exp(theta[3])
    return c, ts, rr, ng


def _params_to_theta(gamma_scale, time_scale, ridge_scale, nugget):
    # inverse softplus; ridge_scale=0 maps to a large negative raw value
    rr = np.asarray(ridge_scale, np.float64)
    raw = np.where(rr > 1e-6, np.log(np.expm1(np.maximum(rr, 1e-6))), -14.0)
    return np.array(
        [np.log(gamma_scale), np.log(time_scale), raw, np.log(nugget)],
        np.float32,
    )


def _gamma_of(theta: jax.Array, eq_sigma: float, dim: int) -> jax.Array:
    c, ts, rr, _ = _theta_to_params(theta)
    gs0, _, _ = kernel_gammas(eq_sigma, dim)  # host floats
    gs = gs0 * c
    gt = gs / (ts * ts)
    gr = rr * gs / dim
    return jnp.stack([gs, gt, gr])


def fit_gp_marginal_likelihood(
    gp_cls,
    equation,
    x_dom,
    x_bdy,
    base: Optional[GPConfig] = None,
    init_ridge_scales: Sequence[float] = (0.0, 3.0, 10.0, 30.0),
    outer_rounds: int = 3,
    inner_steps: int = 30,
    lr: float = 0.08,
    gn_steps: Optional[int] = None,
    learn_nugget: bool = False,
    prior_strength: float = 2.0,
    val_fraction: float = 0.4,
    seed: int = 0,
    seed_configs: Sequence[GPConfig] = (),
) -> MarginalFitResult:
    """Fit (gamma_scale, time_scale, ridge_scale[, nugget]) by batched MAP
    NLML descent; returns the validation-selected GPConfig (train a fresh
    ``gp_cls`` with it).

    ``init_ridge_scales`` seeds the restart batch (one candidate per value);
    all other parameters start at ``base``'s values for every candidate.
    ``prior_strength`` is the precision of the log-space Gaussian prior
    anchoring theta at the base config (0 disables it).

    ``seed_configs`` adds extra restarts initialized at those configs (e.g.
    the grid-tuner winner) AND enters the raw configs themselves into the
    validation-selected candidate table — so the returned config can never
    validate worse than any seed (round-1 VERDICT Weak #7: at d>=60 the
    unseeded ML fit could ship a config weaker than the grid winner).
    """
    base = base or GPConfig()
    gp = gp_cls(equation, base)  # provides the Newton trainer + form pieces
    x_dom = jnp.asarray(x_dom, jnp.float32)
    x_bdy = jnp.asarray(x_bdy, jnp.float32)
    bdy_g = equation.g(x_bdy)[:, 0].astype(jnp.float32)
    rhs = gp.form.rhs_f(x_dom).astype(jnp.float32)
    N = x_dom.shape[0]
    dim = equation.dim
    eq_sigma = float(equation.sigma())
    steps = base.gn_steps if gn_steps is None else int(gn_steps)

    theta0 = jnp.stack(
        [
            jnp.asarray(
                _params_to_theta(
                    base.gamma_scale, base.time_scale, rs, base.nugget
                )
            )
            for rs in init_ridge_scales
        ]
        + [
            jnp.asarray(
                _params_to_theta(
                    cfg.gamma_scale, cfg.time_scale, cfg.ridge_scale,
                    cfg.nugget,
                )
            )
            for cfg in seed_configs
        ]
    )                                                      # (R, 4)
    if theta0.shape[0] == 5:
        # The TPU runtime deterministically kernel-faults the vmapped Newton
        # trainer at batch size 5 and ONLY 5 (1/2/4/6/8 all pass; bisected to
        # the Newton body's batched dense solve — scripts/
        # batched_newton_repro.py, reports/batched_newton_repro.md).  Dodge
        # the poisoned batch size with one extra jittered restart.
        theta0 = jnp.concatenate(
            [theta0, theta0[-1:] + jnp.asarray([[0.05, 0.0, 0.0, 0.0]],
                                               jnp.float32)]
        )
    grad_mask = jnp.array(
        [1.0, 1.0, 1.0, 1.0 if learn_nugget else 0.0], jnp.float32
    )

    def b_of(sol):
        z1, z3, z5 = sol[:N], sol[N : 2 * N], sol[2 * N :]
        return jnp.concatenate(
            [z1, bdy_g, z3, gp.form.F(z1, z3, z5, rhs), z5]
        )

    def train_b(theta):
        gamma = _gamma_of(theta, eq_sigma, dim)
        nugget = _theta_to_params(theta)[3]
        out = gp._train_jit(
            x_dom, x_bdy, bdy_g, rhs, gamma, nugget,
            steps=steps, damping=base.damping, grad_tol=base.grad_tol,
            init_scale=base.init_scale,
        )
        return jax.lax.stop_gradient(b_of(out.sol))

    def nlml(theta, b):
        gamma = _gamma_of(theta, eq_sigma, dim)
        nugget = _theta_to_params(theta)[3]
        K = gram_matrix(x_dom, x_bdy, gamma, dim)
        logdet, quad = logdet_quad(K, nugget, b)
        return 0.5 * (quad + logdet)

    def objective(theta, b, anchor):
        # MAP: Gaussian prior in log space, trust-region style around each
        # candidate's own initialization (see module docstring, guard 1).
        prior = 0.5 * prior_strength * jnp.sum((theta - anchor) ** 2)
        return nlml(theta, b) + prior

    opt = optax.adam(lr)

    @jax.jit
    def outer_round(theta_batch):
        b_batch = jax.vmap(train_b)(theta_batch)

        def inner(carry, _):
            theta, opt_state = carry

            def one(theta_i, opt_state_i, b_i, anchor_i):
                val, g = jax.value_and_grad(objective)(theta_i, b_i, anchor_i)
                g = jnp.where(jnp.isfinite(g), g, 0.0) * grad_mask
                updates, opt_state_i = opt.update(g, opt_state_i, theta_i)
                return optax.apply_updates(theta_i, updates), opt_state_i, val

            theta, opt_state, vals = jax.vmap(one)(
                theta, opt_state, b_batch, theta0
            )
            return (theta, opt_state), vals

        opt_state = jax.vmap(opt.init)(theta_batch)
        (theta_batch, _), vals = jax.lax.scan(
            inner, (theta_batch, opt_state), None, length=inner_steps
        )
        # NLML at the final theta (b fixed within the round)
        final = jax.vmap(nlml)(theta_batch, b_batch)
        return theta_batch, final, vals

    history = []
    theta = theta0
    final = None
    for _ in range(outer_rounds):
        theta, final, _ = outer_round(theta)
        history.append(np.asarray(final, np.float64))

    scores = np.asarray(final, np.float64)  # NLML at final theta, last round
    candidates = [(base, float("nan"))]
    # raw seed configs compete in the validation table untouched, so a seed
    # (e.g. the grid winner) can only be displaced by something that
    # validates BETTER
    candidates += [(cfg, float("nan")) for cfg in seed_configs]
    for i in range(theta.shape[0]):
        c, ts, rr, ng = (float(v) for v in _theta_to_params(theta[i]))
        cfg = dataclasses.replace(
            base, gamma_scale=c, time_scale=ts, ridge_scale=rr,
            nugget=ng if learn_nugget else base.nugget,
        )
        candidates.append((cfg, float(scores[i])))

    # Guard 2 (module docstring): held-out collocation validation picks the
    # shipped config among {base} + fitted candidates, so the fit never
    # returns something that validates worse than the base kernel.  One
    # compiled program with TRACED (gamma, nugget), executed once per
    # candidate (a per-candidate gp_cls(...).GPsolver retrace would cost
    # ~40 s of compile EACH through a device tunnel; NOT vmapped because the
    # batched Newton train at the split shapes faults the TPU runtime —
    # batch-4 at the full shapes works, batch-5 at 4*800+160 kills the
    # worker; sequential execution sidesteps the backend bug).
    from scasml_gp_tpu.gp.state import GPState
    from scasml_gp_tpu.picard.scasml import ScaSMLFullHistory

    gammas = jnp.stack([
        jnp.asarray(gp_cls(equation, cfg).gamma, jnp.float32)
        for cfg, _ in candidates
    ])
    nuggets = jnp.array([cfg.nugget for cfg, _ in candidates], jnp.float32)

    # The ScaSML judge (round 5, identical to gp/tuning.py): score each
    # candidate by the energy of its own residual-Picard correction on
    # freshly sampled interior points -- a direct low-variance estimate of
    # the candidate's error field.  Candidates train at FULL size (the
    # judge needs no held-out data, and subsample-trained selection
    # mis-ranks; gp/tuning.py module docstring).  Residual- and
    # MC-anchor-based scores both measurably mis-rank at d >= 60.
    judge_gp = gp_cls(equation, base)
    judge = ScaSMLFullHistory(equation, judge_gp, variance_guard=False)
    geom = equation.geometry()
    # 3 x 400-point judging, matching gp/tuning.py: with 2 x 200 the
    # judge's near-ties flip with the val seed (measured at d=40,
    # reports/tuner_judge.md round-5 audit)
    n_val = max(64, int(N * val_fraction))
    val_sets = [
        geom.sample_domain(jax.random.PRNGKey(seed + 7 * (i + 1)), n_val)
        for i in range(3)
    ]

    def val_score_one(gamma, nugget):
        out = gp._train_jit(
            x_dom, x_bdy, bdy_g, rhs, gamma, nugget,
            steps=steps, damping=base.damping, grad_tol=base.grad_tol,
            init_scale=base.init_scale,
        )
        judge_gp.state = GPState(
            x_dom=x_dom, x_bdy=x_bdy, right_vector=out.right_vector,
            sol=jnp.zeros((3 * N,), jnp.float32),
            gamma=gamma, loss_history=jnp.zeros((1,), jnp.float32),
        )
        total = 0.0
        for si, val_d in enumerate(val_sets):
            # common random numbers across candidates
            judge.key = jax.random.PRNGKey(seed + 101 * (si + 1))
            # depth-3 judge at d >= 100, matching gp/tuning.py (the n=2
            # judge's truncation bias mis-ranks there; measured,
            # reports/tuner_judge.md)
            jn = 3 if equation.dim >= 100 else 2
            ub = judge.uz_solve(jn, None, val_d, M=8)[:, :1]
            total += float(jnp.mean(ub * ub))
        return total / len(val_sets)

    vs_splits = [np.asarray(
        [val_score_one(gammas[i], nuggets[i])
         for i in range(gammas.shape[0])],
        np.float64,
    )]
    vs = np.mean(vs_splits, axis=0)
    table = [
        (cfg, nlml_val, float(vs[i]))
        for i, (cfg, nlml_val) in enumerate(candidates)
    ]
    # anchored selection: a DESCENDED candidate may displace the anchors
    # (base + seed configs, the first 1 + len(seed_configs) rows) only by
    # beating the best anchor by a clear margin — within-noise "wins" ship
    # the anchor (the grid recommendation), never the optimizer's pick
    n_anchor = 1 + len(seed_configs)
    best_anchor = min(range(n_anchor), key=lambda i: table[i][2])
    best = min(range(len(table)), key=lambda i: table[i][2])
    if best >= n_anchor and not (
        table[best][2] < 0.9 * table[best_anchor][2]
    ):
        best = best_anchor

    return MarginalFitResult(
        config=table[best][0],
        nlml=table[best][1],
        table=table,
        history=np.stack(history),
    )
