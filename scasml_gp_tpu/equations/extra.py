"""Stretch PDE families beyond the reference (BASELINE.json config 5).

The reference implements a single PDE family; these two standard
high-dimensional benchmarks exercise the same ``Equation`` protocol so the
Picard solvers work on them unchanged.  HJB admits a Cole-Hopf Monte-Carlo
"exact" solution; Allen-Cahn has no closed form (its ``exact_solution`` is a
high-accuracy multilevel-Picard reference computed on demand).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from scasml_gp_tpu.equations.base import Equation


class HJB(Equation):
    """Hamilton-Jacobi-Bellman: u_t + Lap u - |grad u|^2 = 0 on [0,T],
    u(x,T) = ln((1 + |x|^2)/2). Exact solution via Cole-Hopf:
    u(t,x) = -ln E[exp(-g(x + sqrt(2) W_{T-t}))]."""

    def __init__(self, n_input: int, n_output: int = 1):
        super().__init__(n_input, n_output)
        self.uncertainty = 5e-1
        self.norm_estimation = 10.0
        # -|grad u|^2 is gradient-quadratic: the raw z estimator's variance
        # enters the MEAN of f, so centered estimators are essential
        self.center_z = True
        self.time_sampling = "sqrt"
        self.terminal_z = "corrected"
        self.norm_estimation = 2.0

    def sigma(self, x_t=0):
        return math.sqrt(2.0)

    def mu(self, x_t=0):
        return 0.0

    def f(self, x_t, u, z):
        # -|grad u|^2 = -|z|^2 / sigma^2 with z = sigma * grad u
        return -jnp.sum(z * z, axis=1, keepdims=True) / self.sigma() ** 2

    def terminal_constraint(self, x_t):
        x = x_t[:, :-1]
        return jnp.log(0.5 * (1.0 + jnp.sum(x * x, axis=1)))[:, None]

    def exact_solution(self, x_t, key=None, num_mc: int = 4096):
        if key is None:
            key = jax.random.PRNGKey(7)
        x = x_t[:, :-1]
        t = x_t[:, -1]
        dt = jnp.maximum(self.T - t, 0.0)
        w = jax.random.normal(key, (x.shape[0], num_mc, self.dim), dtype=x.dtype)
        xs = x[:, None, :] + jnp.sqrt(2.0 * dt)[:, None, None] * w
        g = jnp.log(0.5 * (1.0 + jnp.sum(xs * xs, axis=2)))
        # log-mean-exp of -g, numerically stabilized
        m = jnp.max(-g, axis=1, keepdims=True)
        lme = jnp.log(jnp.mean(jnp.exp(-g - m), axis=1)) + m[:, 0]
        return (-lme)[:, None]


class AllenCahn(Equation):
    """Allen-Cahn: u_t + Lap u + u - u^3 = 0, u(x,T) = 1/(2 + 0.4 |x|^2)."""

    def __init__(self, n_input: int, n_output: int = 1):
        super().__init__(n_input, n_output)
        self.T = 0.3
        self.uncertainty = 5e-1
        self.norm_estimation = 2.0

    def sigma(self, x_t=0):
        return math.sqrt(2.0)

    def mu(self, x_t=0):
        return 0.0

    def f(self, x_t, u, z):
        return u - u**3

    def terminal_constraint(self, x_t):
        x = x_t[:, :-1]
        return (1.0 / (2.0 + 0.4 * jnp.sum(x * x, axis=1)))[:, None]

    def exact_solution(self, x_t):
        raise NotImplementedError(
            "Allen-Cahn has no closed form; use a high-level Picard run as the "
            "reference (harness.metrics.mc_reference_solution)."
        )
