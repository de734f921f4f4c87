"""Stretch PDE families end-to-end: Allen-Cahn through the full GP+ScaSML
pipeline (accuracy vs a deep Picard reference), HJB through the plain MLP
solver vs its Cole-Hopf Monte-Carlo solution."""

import jax
import jax.numpy as jnp
import numpy as np

from scasml_gp_tpu.config import GPConfig
from scasml_gp_tpu.equations import AllenCahn, HJB
from scasml_gp_tpu.gp.solver import GPAllenCahn
from scasml_gp_tpu.harness.metrics import mc_reference_solution
from scasml_gp_tpu.picard import MLPFullHistory, ScaSMLFullHistory

D = 4


def _rel(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return np.linalg.norm(a - b) / np.linalg.norm(b)


def test_allen_cahn_gp_scasml_pipeline():
    eq = AllenCahn(n_input=D + 1)
    gp = GPAllenCahn(eq, GPConfig(gn_steps=10))
    x_dom, x_bdy = eq.generate_data(150, 40, key=jax.random.PRNGKey(0))
    gp.GPsolver(x_dom, x_bdy)

    x_test = eq.geometry().sample_domain(jax.random.PRNGKey(1), 128)
    ref = mc_reference_solution(eq, x_test, n=3, M=8)

    u_gp = np.asarray(gp.predict(x_test))
    assert np.isfinite(u_gp).all()
    rel_gp = _rel(u_gp, ref)

    sca = ScaSMLFullHistory(eq, gp)
    u_sca = np.asarray(sca.u_solve(2, None, x_test, M=4))
    assert np.isfinite(u_sca).all()
    rel_sca = _rel(u_sca, ref)
    # the GP surrogate must be in the right ballpark and ScaSML must not
    # degrade it catastrophically (Allen-Cahn has no closed form; the MC
    # reference itself carries a few percent error)
    assert rel_gp < 0.5, rel_gp
    assert rel_sca < max(2.0 * rel_gp, 0.2), (rel_sca, rel_gp)


def test_hjb_mlp_vs_cole_hopf():
    eq = HJB(n_input=D + 1)
    x = jax.random.uniform(jax.random.PRNGKey(2), (64, D), minval=-0.5,
                           maxval=0.5)
    # mid-horizon points, away from t = T where the estimate is exact anyway
    t = jnp.full((64, 1), 0.1)
    x_t = jnp.concatenate([x, t], axis=1)
    exact = np.asarray(eq.exact_solution(x_t, num_mc=8192)).ravel()
    # HJB's gradient-quadratic generator needs the non-reference estimator
    # options the equation enables by default: centered z, sqrt importance
    # time sampling, Stein-corrected terminal z, tight truncation.
    rels = {}
    for n, M in [(1, 8), (3, 16)]:
        solver = MLPFullHistory(eq)
        u = np.asarray(solver.u_solve(n, None, x_t, M=M)).ravel()
        rels[n] = np.linalg.norm(u - exact) / np.linalg.norm(exact)
    assert rels[3] < 0.2, rels
    assert rels[3] < rels[1], rels  # deeper recursion improves
