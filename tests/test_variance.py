"""GP posterior variance (gp/variance.py).

New capability beyond the reference (which only carries a fixed
``equation.uncertainty`` clip constant, solvers/ScaSML.py:282-284): verify the
conditional-Gaussian variance against a from-scratch dense implementation with
autodiff-built cross kernels, plus the API/caching behavior on the solver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scasml_gp_tpu.config import GPConfig
from scasml_gp_tpu.equations import GradDependentNonlinear
from scasml_gp_tpu.gp.gram import gram_matrix
from scasml_gp_tpu.gp.kernels import PHI_OPS, ID, kernel_gammas
from scasml_gp_tpu.gp.solver import GPGradDependentNonlinear
from scasml_gp_tpu.gp.variance import (
    cross_phi,
    factor_for_variance,
    posterior_variance,
)

from tests.test_kernels import apply_op, make_kappa

DIM = 3
NUGGET = 1e-2


@pytest.fixture(scope="module")
def tiny_sets():
    key = jax.random.PRNGKey(7)
    kd, kb, kt = jax.random.split(key, 3)
    x_dom = jax.random.uniform(kd, (12, DIM + 1), minval=-0.5, maxval=0.5)
    x_bdy = jax.random.uniform(kb, (5, DIM + 1), minval=-0.5, maxval=0.5)
    x = jax.random.uniform(kt, (9, DIM + 1), minval=-0.5, maxval=0.5)
    return x, x_dom, x_bdy


@pytest.mark.parametrize(
    "gamma",
    [
        kernel_gammas(0.25, DIM),                               # reference iso
        kernel_gammas(0.25, DIM, time_scale=0.7, ridge_scale=8.0),
    ],
    ids=["iso", "ridge"],
)
def test_variance_matches_dense_autodiff_reference(tiny_sets, gamma):
    """var = 1 - k^T (K+eta I)^{-1} k with k built by NESTED AUTODIFF (the
    reference's construction style) and a plain dense solve."""
    x, x_dom, x_bdy = tiny_sets
    kappa = make_kappa(gamma)

    # cross vector blocks: ID on the x side, phi ops on the y side
    cols = []
    for b, pts in zip(PHI_OPS, (x_dom, x_bdy, x_dom, x_dom, x_dom)):
        fun = apply_op(apply_op(kappa, ID, 0), b, 1)
        block = jax.vmap(
            lambda xi: jax.vmap(lambda yj: fun(xi, yj))(pts)
        )(x)
        cols.append(block)
    kx_ref = jnp.concatenate(cols, axis=1)

    kx = cross_phi(x, x_dom, x_bdy, jnp.asarray(gamma, jnp.float32), DIM)
    np.testing.assert_allclose(
        np.asarray(kx), np.asarray(kx_ref), rtol=2e-4, atol=2e-4
    )

    K = gram_matrix(x_dom, x_bdy, jnp.asarray(gamma, jnp.float32), DIM)
    K = 0.5 * (K + K.T) + NUGGET * jnp.eye(K.shape[0])
    sol = jnp.linalg.solve(K, kx_ref.T)
    var_ref = 1.0 - jnp.sum(kx_ref * sol.T, axis=1)

    C = factor_for_variance(x_dom, x_bdy, gamma, NUGGET, DIM)
    var = posterior_variance(x, x_dom, x_bdy, C, gamma, DIM)
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(var_ref), rtol=5e-3, atol=5e-4
    )
    assert np.all(np.asarray(var) >= 0.0)


def test_variance_chunked_matches_unchunked(tiny_sets):
    x, x_dom, x_bdy = tiny_sets
    gamma = kernel_gammas(0.25, DIM)
    C = factor_for_variance(x_dom, x_bdy, gamma, NUGGET, DIM)
    v_full = posterior_variance(x, x_dom, x_bdy, C, gamma, DIM)
    v_chunk = posterior_variance(x, x_dom, x_bdy, C, gamma, DIM, chunk=4)
    np.testing.assert_allclose(
        np.asarray(v_full), np.asarray(v_chunk), rtol=1e-6, atol=1e-7
    )


def test_predict_std_contracts_at_training_points():
    """Posterior std at the training interior points must sit well below the
    prior (=1) and below the std at fresh points; retraining on MORE data
    must not raise the mean variance (information only accumulates)."""
    d = 4
    eq = GradDependentNonlinear(n_input=d + 1)
    gp = GPGradDependentNonlinear(eq, GPConfig(gn_steps=4))
    x_dom, x_bdy = eq.generate_data(60, 14, key=jax.random.PRNGKey(0))
    gp.GPsolver(x_dom, x_bdy)

    std_train = np.asarray(gp.predict_std(x_dom))
    assert std_train.shape == (60, 1)
    x_new = eq.geometry().sample_domain(jax.random.PRNGKey(5), 64)
    std_new = np.asarray(gp.predict_std(x_new))
    assert std_train.mean() < 0.2          # conditioned
    assert std_train.mean() < std_new.mean()
    assert np.all(std_new <= 1.0 + 1e-5)   # never above the prior

    mean, std = gp.predict_with_std(x_new)
    assert mean.shape == std.shape == (64, 1)

    # cache invalidates on retrain; a denser set shrinks the variance
    xd2 = jnp.concatenate(
        [x_dom, eq.geometry().sample_domain(jax.random.PRNGKey(9), 60)]
    )
    gp.GPsolver(xd2, x_bdy)
    std_dense = np.asarray(gp.predict_std(x_new))
    assert std_dense.mean() <= std_new.mean() + 1e-3


def test_guarded_quadrature_scasml_on_hjb():
    """The quadrature ScaSML now carries the paired half-sample bias probe
    (VERDICT round-3 Next #4): with a CONVERGED Cole-Hopf surrogate the
    correction is pure MC noise (plus gradient-quadratic bias no variance
    column can see) and the guard must shrink it away; a coarse surrogate
    keeps a genuinely informative correction."""
    from scasml_gp_tpu.equations import EQUATIONS
    from scasml_gp_tpu.gp.cole_hopf import GPHJBColeHopf
    from scasml_gp_tpu.picard import ScaSML

    d = 4
    eq = EQUATIONS["HJB"](n_input=d + 1)
    gp = GPHJBColeHopf(eq)
    x_dom, x_bdy = eq.generate_data(400, 100, key=jax.random.PRNGKey(0))
    gp.GPsolver(x_dom, x_bdy)

    sca = ScaSML(eq, gp)           # HJB sets variance_guard=True
    assert sca.variance_guard
    x = eq.geometry().sample_domain(jax.random.PRNGKey(2), 64)
    u = np.asarray(sca.u_solve(2, 2, x))
    assert np.isfinite(u).all()
    lam = sca.last_lambda
    assert 0.0 <= lam <= 1.0
    # converged surrogate: the probe pair must catch the correction being
    # statistically indistinguishable from its own noise
    assert lam < 0.9, lam
    # guarded output stays within the shrink interval of the GP prediction
    # (fresh rollout norm as a statistical yardstick, generous slack)
    u_hat = np.asarray(gp.predict(x))
    assert np.linalg.norm(u - u_hat) <= 1.5 * np.linalg.norm(
        np.asarray(sca.uz_solve(2, 2, x))[:, :1]
    ) + 1e-6


def test_auto_schedule_ladder_selection():
    """Deterministic unit test of the shallow-first schedule ladder
    (picard/scasml.py _auto_schedule_solve; VERDICT round-4 #2/#3):
    short-circuits on the first signal-dominated candidate, and abstains
    to u_hat when every candidate stays below the accept threshold."""
    from scasml_gp_tpu.picard.scasml import _ScaSMLBase

    class _Fake(_ScaSMLBase):
        def __init__(self, lambdas):
            # bypass solver construction; install only what the ladder uses
            self.equation = type("Eq", (), {"escalate_M_accept": 0.5})()
            self.lambdas = list(lambdas)
            self.calls = []
            self.last_lambda = None

        def _u_hat(self, x_t):
            return np.full((4, 1), 7.0)

    def solve_at_factory(fake):
        def solve_at(cand):
            fake.calls.append(cand)
            fake.last_lambda = fake.lambdas[len(fake.calls) - 1]
            return np.full((4, 1), float(len(fake.calls)))
        return solve_at

    # accept at the second candidate: first is noise-dominated
    fake = _Fake([0.2, 0.8, 0.9])
    out = fake._auto_schedule_solve(
        solve_at_factory(fake), [(1, 2), (1, 3), (2, 2)], None
    )
    assert fake.calls == [(1, 2), (1, 3)]          # short-circuit
    assert float(out[0, 0]) == 2.0                 # the accepted candidate
    assert fake.last_lambda == 0.8

    # nothing qualifies: abstain to u_hat, lambda reported 0
    fake = _Fake([0.2, 0.4, 0.45])
    out = fake._auto_schedule_solve(
        solve_at_factory(fake), [(1, 2), (1, 3), (2, 2)], None
    )
    assert fake.calls == [(1, 2), (1, 3), (2, 2)]  # exhausted the ladder
    assert float(out[0, 0]) == 7.0                 # u_hat, not best shrink
    assert fake.last_lambda == 0.0


def test_measured_probe_ratio_full_history():
    """The probe variance ratio is MEASURED from the rollouts' variance
    columns (ADVICE round-3 #4), falling back to the analytic terminal-MC
    ratio only when the columns are degenerate."""
    import jax.numpy as jnp

    from scasml_gp_tpu.picard import ScaSMLFullHistory

    d = 4
    eq = GradDependentNonlinear(n_input=d + 1)
    gp = GPGradDependentNonlinear(eq, GPConfig(gn_steps=4))
    x_dom, x_bdy = eq.generate_data(80, 20, key=jax.random.PRNGKey(0))
    gp.GPsolver(x_dom, x_bdy)
    sca = ScaSMLFullHistory(eq, gp, variance_guard=True)

    x = eq.geometry().sample_domain(jax.random.PRNGKey(1), 16)
    out = sca.uz_solve(2, None, x, M=4)
    a = sca.uz_solve(2, None, x, M=2)
    b = sca.uz_solve(2, None, x, M=2)
    ratio = sca._measured_probe_ratio(out, a, b, fallback=0.25)
    assert 0.0 < ratio <= 1.0
    # half-sample rollouts are noisier, so the measured full/probe ratio
    # should sit below 1 (and near the 1/M-power family, not above it)
    assert ratio < 1.0

    # degenerate columns -> analytic fallback
    z = jnp.zeros_like(out)
    assert sca._measured_probe_ratio(z, z, z, fallback=0.3) == 0.3

    # the guarded u_solve path runs end-to-end with the measured ratio
    u = np.asarray(sca.u_solve(2, None, x, M=4))
    assert np.isfinite(u).all()
    assert 0.0 <= sca.last_lambda <= 1.0


def test_adaptive_clip_bounds_correction():
    """Opt-in adaptive clip (VERDICT round-3 Next #4): the final correction
    is clamped per point to +- k * predict_std instead of the reference's
    fixed equation.uncertainty constant."""
    from scasml_gp_tpu.picard import ScaSMLFullHistory

    d = 4
    eq = GradDependentNonlinear(n_input=d + 1)
    gp = GPGradDependentNonlinear(eq, GPConfig(gn_steps=6))
    x_dom, x_bdy = eq.generate_data(100, 24, key=jax.random.PRNGKey(0))
    gp.GPsolver(x_dom, x_bdy)

    k = 3.0
    sca = ScaSMLFullHistory(eq, gp, adaptive_clip=k)
    x = eq.geometry().sample_domain(jax.random.PRNGKey(4), 32)
    sca.key = jax.random.PRNGKey(9)
    u = np.asarray(sca.u_solve(2, None, x, M=3))
    u_hat = np.asarray(gp.predict(x))
    bound = k * np.asarray(gp.predict_std(x))
    assert np.all(np.abs(u - u_hat) <= bound + 1e-6)
    assert np.isfinite(u).all()
