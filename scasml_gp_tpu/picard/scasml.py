"""ScaSML: GP-calibrated multilevel Picard solvers.

The Picard recursion runs on the RESIDUAL u_breve = u - u_hat of the trained
GP surrogate (reference ``solvers/ScaSML.py`` / ``ScaSML_full_history.py``):

    f_breve(x, ub, zb) = f(x, ub + u_hat, sigma grad u_hat + zb)
                       - f(x, u_hat, sigma grad u_hat)        (ScaSML.py:29-47)
    g_breve(x)         = g(x) - u_hat(x)                      (ScaSML.py:49-63)
    leaf level l == 0  : inject eps = PDE residual of u_hat   (ScaSML.py:274-280)
    u_solve            = u_hat + u_breve                      (ScaSML.py:286-304)

TPU-native: the GP posterior mean + gradient (and the residual at leaves) are
evaluated by the FUSED single-pass kernel of :mod:`scasml_gp_tpu.gp.posterior`
on the whole (batch x MC) node block at once, inside the same compiled rollout
— the reference instead re-enters three separate autodiff evaluators per tree
node, which is why its ScaSML is 8x slower than plain MLP (SURVEY.md §3.4).
The trained surrogate is threaded through as a GPState pytree argument, so a
retrained GP does not retrigger compilation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scasml_gp_tpu.gp.solver import GP
from scasml_gp_tpu.picard.core import (
    PicardModel,
    build_full_history_uz,
    build_quadrature_uz,
)
from scasml_gp_tpu.picard.mlp import _PicardBase
from scasml_gp_tpu.picard.schedule import (
    approx_parameters,
    count_evaluations_full_history,
    count_evaluations_quadrature,
)


class _ScaSMLBase(_PicardBase):
    def __init__(self, equation, gp: GP, batch_chunk=None, center_z=None,
                 time_sampling=None, precision=None, mesh=None,
                 debug_checks=False, variance_guard=None,
                 terminal_crn=False):
        super().__init__(equation, batch_chunk=batch_chunk,
                         center_z=center_z, time_sampling=time_sampling,
                         precision=precision, mesh=mesh,
                         debug_checks=debug_checks, terminal_crn=terminal_crn)
        self.GP = gp
        self.eval_chunk = gp.eval_chunk
        # Variance-guarded correction (VERDICT round-2 #5): estimate the MC
        # variance of u_breve inside the rollout (one extra output column)
        # and SHRINK the correction toward zero when it is statistically
        # indistinguishable from its own noise — positive-part James-Stein
        # over the batch, lambda = max(0, 1 - sum var_i / sum u_breve_i^2).
        # With a converged surrogate the true correction is ~0 and the
        # estimate is pure MC noise (worse, a gradient-quadratic f turns
        # that noise into bias — the d=250 HJB 0.161 -> 0.204 regression);
        # the guard abstains there and leaves genuinely informative
        # corrections (lambda ~ 1) untouched.  Default comes from the
        # equation (HJB sets variance_guard=True); explicit bool overrides.
        self.variance_guard = (
            getattr(equation, "variance_guard", False)
            if variance_guard is None else variance_guard
        )
        self.last_lambda = None  # shrink factor of the latest u_solve

    def _params(self):
        if self.GP.state is None:
            raise RuntimeError("GP surrogate not trained; call GP.GPsolver first.")
        return self.GP.state

    def _model(self) -> PicardModel:
        eq = self.equation
        dim = self.dim
        gp = self.GP  # posterior_u/residual_u are pure in (params, x_t)

        def f_breve(params, x_t, u_breve, z_breve):
            out = gp.posterior_u(params, x_t, want_grad=True)
            u_hat = out.u[:, None]
            grad_sp = out.grad[:, :-1]  # spatial part (reference ScaSML.py:44)
            sig = eq.sigma(x_t)
            val1 = eq.f(x_t, u_breve + u_hat, sig * grad_sp + z_breve)
            val2 = eq.f(x_t, u_hat, sig * grad_sp)
            return val1 - val2

        def g_breve(params, x_t):
            return eq.g(x_t) - gp.posterior_u(params, x_t).u[:, None]

        def leaf(params, x_t):
            return gp.residual_u(params, x_t)

        return PicardModel(
            f=f_breve,
            g=g_breve,
            leaf=leaf,
            mu=float(eq.mu()),
            sigma=float(eq.sigma()),
            T=self.T,
            dim=dim,
            clip=float(eq.uncertainty),  # reference ScaSML.py:282-284
            center_z=self.center_z,
            time_sampling=self.time_sampling,
            terminal_z=self.terminal_z,
            path_dtype=self.precision.rollout,
            terminal_crn=self.terminal_crn,
            # f_breve(x, 0, 0) is bitwise zero (val1 == val2), so the
            # builders skip the level-0 f sweep — a full posterior+gradient
            # evaluation at the largest mf of every level — exactly.
            f_zero_at_zero=True,
        )

    def _u_hat(self, x_t) -> jax.Array:
        return self.GP.predict(x_t)

    def _guarded_u(self, out, x_t, u_breve_half=None) -> jax.Array:
        """u_hat + lambda * u_breve with the James-Stein shrink computed
        from the rollout's variance column (no-op when the guard is off).

        The variance column sees only MC *variance*; a gradient-quadratic f
        additionally turns z-estimator noise into a systematic BIAS
        (E f(z + eps) != f(z)) that is invisible to any variance estimate.
        That bias scales like an inverse power of the sample base M, so a
        second rollout at M/2 exposes it: the systematic disagreement
        delta = u_breve(M/2) - u_breve(M) is a (conservative, since
        bias(M/2) - bias(M) >= bias(M) for 1/M^p scaling with p >= 1)
        per-point bias proxy, and it joins the variance in the shrink
        denominator. Signal-dominated corrections (repair regime) have
        |u_breve| >> |delta| and keep lambda ~ 1."""
        u_breve = out[:, :1]
        if not self.variance_guard:
            return self._u_hat(x_t) + u_breve
        if u_breve_half is not None:
            # Paired half-sample probes (two INDEPENDENT M/2 rollouts):
            #   a - b      has the bias cancelled -> unbiased estimate of
            #              2 Var_{M/2} (the rollout's own variance column
            #              sees only the terminal pass and underestimates);
            #   (a+b)/2 vs u_M isolates the bias difference
            #              beta_{M/2} - beta_M, which bounds ||beta_M||
            #              from above for any 1/M^p bias scaling (p >= 1).
            # A gradient-quadratic f turns z-estimator noise into exactly
            # such a bias (the d=250 HJB regression); no variance column
            # can see it, the probe pair can.
            a, b = u_breve_half
            var_half = 0.5 * jnp.sum((a - b) ** 2)
            var_m = 0.25 * var_half          # ~1/M^2 terminal-MC scaling
            delta = 0.5 * (a + b) - u_breve
            bias_sq = jnp.maximum(
                jnp.sum(delta * delta) - 0.5 * var_half - var_m, 0.0
            )
            num = var_m + bias_sq
        else:
            num = jnp.sum(out[:, -1:])
        den = jnp.sum(u_breve * u_breve)
        lam = jnp.clip(1.0 - num / jnp.maximum(den, 1e-30), 0.0, 1.0)
        self.last_lambda = float(lam)
        return self._u_hat(x_t) + lam * u_breve


class ScaSML(_ScaSMLBase):
    """Quadrature ScaSML (reference ``solvers/ScaSML.py``)."""

    def _build(self, schedule_key):
        n, rho = schedule_key
        tables = approx_parameters(rho, self.T)
        return build_quadrature_uz(
            self._model(), n, rho, tables,
            want_variance=self.variance_guard,
        )

    def uz_solve(self, n: int, rho: int, x_t) -> jax.Array:
        out = self._run((int(n), int(rho)), x_t)
        self.evaluation_counter += count_evaluations_quadrature(
            int(n), int(rho), self.T, count_fg=True
        )
        return out

    def u_solve(self, n: int, rho: int, x_t) -> jax.Array:
        """u_hat + [lambda] u_breve (reference solvers/ScaSML.py:286-304;
        lambda is the optional variance-guard shrink)."""
        return self._guarded_u(self.uz_solve(n, rho, x_t), x_t)


class ScaSMLFullHistory(_ScaSMLBase):
    """Full-history ScaSML (reference ``solvers/ScaSML_full_history.py``)."""

    def _build(self, schedule_key):
        n, M = schedule_key
        return build_full_history_uz(
            self._model(), n, M, want_variance=self.variance_guard
        )

    def uz_solve(self, n: int, rho: int, x_t, M: int = 3) -> jax.Array:
        out = self._run((int(n), int(M)), x_t)
        self.evaluation_counter += count_evaluations_full_history(
            int(n), int(M), scasml_variant=True, count_fg=True
        )
        return out

    def u_solve(self, n: int, rho: int, x_t, M: int = 3) -> jax.Array:
        out = self.uz_solve(n, rho, x_t, M)
        u_half = None
        if self.variance_guard and M >= 4:
            # paired independent half-sample probes (2 x (1/2)^n of the
            # main rollout's work; the stateful key advances per call)
            a = self.uz_solve(n, rho, x_t, M // 2)[:, :1]
            b = self.uz_solve(n, rho, x_t, M // 2)[:, :1]
            u_half = (a, b)
        return self._guarded_u(out, x_t, u_breve_half=u_half)


# Reference-spelling alias.
ScaSML_full_history = ScaSMLFullHistory
