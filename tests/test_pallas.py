"""Pallas fused-posterior kernel vs the XLA reference implementation.

On CPU the kernel runs in interpreter mode; numerical identity with the XLA
path validates the tile algebra (the TPU compile path is exercised by bench).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scasml_gp_tpu.gp.kernels import kernel_gamma, kernel_gammas
from scripts.pallas_posterior import posterior_eval_fused
from scasml_gp_tpu.gp.posterior import posterior_eval

D = 6
N_DOM, N_BDY, N_EVAL = 70, 30, 45


@pytest.fixture(scope="module")
def problem():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x_dom = jax.random.uniform(k1, (N_DOM, D + 1), minval=-0.5, maxval=0.5)
    x_bdy = jax.random.uniform(k2, (N_BDY, D + 1), minval=-0.5, maxval=0.5)
    x = jax.random.uniform(k3, (N_EVAL, D + 1), minval=-0.5, maxval=0.5)
    r = jax.random.normal(k4, (4 * N_DOM + N_BDY,))
    return x, x_dom, x_bdy, r


GAMMAS = [kernel_gamma(0.25, D),
          kernel_gammas(0.25, D, time_scale=0.6, ridge_scale=5.0)]


@pytest.mark.parametrize("gamma", GAMMAS)
@pytest.mark.parametrize("want_grad,want_ops", [
    (False, False), (True, False), (False, True), (True, True),
])
def test_fused_matches_xla(problem, gamma, want_grad, want_ops):
    x, x_dom, x_bdy, r = problem
    ref = posterior_eval(x, x_dom, x_bdy, r, gamma, D,
                         want_grad=want_grad, want_ops=want_ops)
    got = posterior_eval_fused(x, x_dom, x_bdy, r, gamma, D,
                               want_grad=want_grad, want_ops=want_ops)
    for name, a, b in zip(ref._fields, ref, got):
        if a is None:
            assert b is None, name
            continue
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_fused_large_padding(problem):
    """Shapes that are not tile multiples must pad/mask correctly."""
    x, x_dom, x_bdy, r = problem
    gamma = GAMMAS[1]
    # 300 eval points: crosses one TI=256 tile boundary
    xL = jnp.tile(x, (7, 1))[:300]
    ref = posterior_eval(xL, x_dom, x_bdy, r, gamma, D, want_grad=True,
                         want_ops=True)
    got = posterior_eval_fused(xL, x_dom, x_bdy, r, gamma, D, want_grad=True,
                               want_ops=True)
    for name, a, b in zip(ref._fields, ref, got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4, err_msg=name
        )
