"""PDE problem protocol and native geometry samplers.

Capability parity with the reference ``Equation`` base class
(reference ``equations/equations.py:15-230``) but pure JAX:

- the deepxde ``Hypercube``/``TimeDomain``/``GeometryXTime`` machinery
  (reference ``equations/equations.py:344-417``) is replaced by a native
  :class:`HypercubeGeometry` whose samplers are ``jax.random`` based,
  explicitly keyed (no hidden global RNG state) and jit-friendly;
- all problem functions (``f``, ``g``, ``mu``, ``sigma``, ``exact_solution``)
  are pure functions of jnp arrays, vectorized over the batch row axis.

Conventions (same as reference): rows index samples; columns index dimensions;
the LAST input column is time; ``z`` excludes time.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


class HypercubeGeometry:
    """Axis-aligned hypercube [-radius, radius]^d x [t0, T].

    Replaces deepxde's GeometryXTime (reference ``equations/equations.py:
    344-385``): ``sample_domain`` draws uniform interior space-time points and
    ``sample_boundary`` draws points uniformly on the lateral boundary
    (a uniformly chosen facet, uniform within the facet, uniform in time) —
    statistically equivalent to deepxde's ``random_boundary_points`` for the
    equal-area facets of a cube.
    """

    def __init__(self, dim: int, radius: float = 0.5, t0: float = 0.0, T: float = 0.5):
        self.dim = dim
        self.radius = float(radius)
        self.t0 = float(t0)
        self.T = float(T)

    def sample_domain(self, key: jax.Array, num: int, dtype=jnp.float32) -> jax.Array:
        """Uniform interior points, shape (num, dim + 1); last column is time."""
        kx, kt = jax.random.split(key)
        x = jax.random.uniform(
            kx, (num, self.dim), dtype=dtype, minval=-self.radius, maxval=self.radius
        )
        t = jax.random.uniform(kt, (num, 1), dtype=dtype, minval=self.t0, maxval=self.T)
        return jnp.concatenate([x, t], axis=1)

    def sample_terminal(self, key: jax.Array, num: int, dtype=jnp.float32) -> jax.Array:
        """Uniform points on the terminal surface Ω x {T}, shape (num, dim+1).

        For PDEs posed as pure terminal-value problems (no closed form on the
        lateral boundary — e.g. HJB, Allen-Cahn), the data surface where
        u = g holds EXACTLY is t = T, not the lateral boundary."""
        x = jax.random.uniform(
            key, (num, self.dim), dtype=dtype, minval=-self.radius, maxval=self.radius
        )
        t = jnp.full((num, 1), self.T, dtype=dtype)
        return jnp.concatenate([x, t], axis=1)

    def sample_boundary(self, key: jax.Array, num: int, dtype=jnp.float32) -> jax.Array:
        """Uniform points on the lateral boundary ∂Ω x [t0, T], shape (num, dim+1)."""
        kx, kf, ks, kt = jax.random.split(key, 4)
        x = jax.random.uniform(
            kx, (num, self.dim), dtype=dtype, minval=-self.radius, maxval=self.radius
        )
        facet = jax.random.randint(kf, (num,), 0, self.dim)
        side = jnp.where(
            jax.random.bernoulli(ks, 0.5, (num,)), self.radius, -self.radius
        ).astype(dtype)
        onehot = jax.nn.one_hot(facet, self.dim, dtype=dtype)
        x = x * (1.0 - onehot) + side[:, None] * onehot
        t = jax.random.uniform(kt, (num, 1), dtype=dtype, minval=self.t0, maxval=self.T)
        return jnp.concatenate([x, t], axis=1)


class Equation:
    """Abstract semilinear parabolic PDE on a space-time domain.

    du/dt + <mu, grad u> + (sigma^2/2) Lap u + f(x_t, u, sigma * grad u) = 0,
    u(x, T) = g(x).

    API parity with reference ``equations/equations.py:15-230``: subclasses
    provide ``f``, ``terminal_constraint`` (used by ``g``), ``mu``, ``sigma``,
    ``exact_solution`` and domain geometry.
    """

    def __init__(self, n_input: int, n_output: int = 1):
        self.n_input = int(n_input)   # spatial dims + 1 (time)
        self.n_output = int(n_output)
        self.dim = self.n_input - 1
        self.t0 = 0.0
        self.T = 0.5
        self.radius = 0.5
        self.uncertainty = 1e-1       # ScaSML residual clip (reference :245)
        self.norm_estimation = 1.0    # MLP output clip (reference :246)
        # Where the GP's "boundary" collocation rows live.  'lateral' =
        # reference semantics (valid when g(x_t) is the exact solution at any
        # t, as for GradDependentNonlinear); 'terminal' = the t = T surface,
        # for terminal-value problems whose lateral trace is unknown
        # (HJB, Allen-Cahn).
        self.boundary_mode = "lateral"

    # ---- problem functions (pure, batched over rows) ----
    def f(self, x_t: jax.Array, u: jax.Array, z: jax.Array) -> jax.Array:
        """Generator term, shape (batch, 1). z = sigma * grad_x u, (batch, dim)."""
        raise NotImplementedError

    def terminal_constraint(self, x_t: jax.Array) -> jax.Array:
        """Terminal/boundary data, shape (batch, 1)."""
        raise NotImplementedError

    def g(self, x_t: jax.Array) -> jax.Array:
        """Terminal constraint alias (reference ``equations.py:146-162``)."""
        return self.terminal_constraint(x_t)

    def mu(self, x_t=0):
        """Drift coefficient (scalar for the implemented PDEs)."""
        raise NotImplementedError

    def sigma(self, x_t=0):
        """Diffusion coefficient (scalar for the implemented PDEs)."""
        raise NotImplementedError

    def exact_solution(self, x_t: jax.Array) -> jax.Array:
        """Closed-form solution for testing, shape (batch, 1)."""
        raise NotImplementedError

    def exact_solution_derivative(self, x_t: jax.Array) -> jax.Array:
        """Closed-form solution spatial derivative (for diagnostics)."""
        raise NotImplementedError

    def has_exact_solution(self) -> bool:
        try:
            self.exact_solution
        except NotImplementedError:  # pragma: no cover
            return False
        return True

    # ---- geometry / data (reference ``equations.py:344-417``) ----
    def geometry(self, t0: float = None, T: float = None) -> HypercubeGeometry:
        if t0 is not None:
            self.t0 = float(t0)
        if T is not None:
            self.T = float(T)
        return HypercubeGeometry(self.dim, self.radius, self.t0, self.T)

    # Train/test domains coincide in the reference (equations.py:344-385).
    test_geometry = geometry

    def generate_data(
        self, num_domain: int = 100, num_boundary: int = 20, key: jax.Array = None,
        dtype=jnp.float32,
    ) -> Tuple[jax.Array, jax.Array]:
        """(domain points, boundary points) for training. Explicitly keyed."""
        if key is None:
            key = jax.random.PRNGKey(0)
        geom = self.geometry()
        kd, kb = jax.random.split(key)
        sample_bdy = (
            geom.sample_terminal if self.boundary_mode == "terminal"
            else geom.sample_boundary
        )
        return (
            geom.sample_domain(kd, num_domain, dtype=dtype),
            sample_bdy(kb, num_boundary, dtype=dtype),
        )

    def generate_test_data(
        self, num_domain: int = 100, num_boundary: int = 20, key: jax.Array = None,
        dtype=jnp.float32,
    ) -> Tuple[jax.Array, jax.Array]:
        """(domain points, boundary points) for testing. Explicitly keyed."""
        if key is None:
            key = jax.random.PRNGKey(1)
        geom = self.test_geometry()
        kd, kb = jax.random.split(key)
        sample_bdy = (
            geom.sample_terminal if self.boundary_mode == "terminal"
            else geom.sample_boundary
        )
        return (
            geom.sample_domain(kd, num_domain, dtype=dtype),
            sample_bdy(kb, num_boundary, dtype=dtype),
        )
