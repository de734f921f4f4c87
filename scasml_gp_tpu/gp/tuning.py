"""Validation-based GP hyperparameter selection (on-device).

The reference has no hyperparameter fitting at all — kernel width and nugget
are hardcoded (models/GP.py:25-26).  BASELINE.json's north star asks for
on-device GP hyperparameter fitting; this module implements it WITHOUT
peeking at the exact solution: candidates are scored on held-out collocation
data by how well the trained surrogate satisfies the PDE in the interior and
the Dirichlet data on the boundary,

    score = mean eps(X_val)^2 + boundary_weight * mean (u(Y_val) - g(Y_val))^2

which is exactly the training objective evaluated out-of-sample.  The search
is a small grid over (time_scale, ridge_scale, nugget); each candidate trains
on the same split, so compiled programs are reused across candidates.
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
    """Out-of-sample PDE residual + boundary mismatch of a trained GP."""
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
    nuggets: Optional[Sequence[float]] = None,
    val_fraction: float = 0.2,
    gn_steps: Optional[int] = None,
    seed: int = 0,
) -> TuneResult:
    """Grid-search GP hyperparameters on a held-out collocation split,
    then retrain the best candidate on the FULL data.

    Returns the winning GPConfig; the returned ``gp_cls(equation, config)``
    trained on all of (x_dom, x_bdy) is what callers should use.
    """
    base = base or GPConfig()
    nuggets = nuggets or (base.nugget,)
    x_dom = jnp.asarray(x_dom, jnp.float32)
    x_bdy = jnp.asarray(x_bdy, jnp.float32)

    key = jax.random.PRNGKey(seed)
    kd, kb = jax.random.split(key)
    n_dom, n_bdy = x_dom.shape[0], x_bdy.shape[0]
    n_vd = max(1, int(n_dom * val_fraction))
    n_vb = max(1, int(n_bdy * val_fraction))
    perm_d = jax.random.permutation(kd, n_dom)
    perm_b = jax.random.permutation(kb, n_bdy)
    tr_dom, val_dom = x_dom[perm_d[n_vd:]], x_dom[perm_d[:n_vd]]
    tr_bdy, val_bdy = x_bdy[perm_b[n_vb:]], x_bdy[perm_b[:n_vb]]

    table = []
    best = None
    for ts, rs, ng in itertools.product(time_scales, ridge_scales, nuggets):
        config = dataclasses.replace(
            base, time_scale=ts, ridge_scale=rs, nugget=ng
        )
        gp = gp_cls(equation, config)
        gp.GPsolver(tr_dom, tr_bdy, GN_steps=gn_steps)
        score = validation_score(gp, val_dom, val_bdy)
        table.append((config, score))
        if best is None or score < best[1]:
            best = (config, score)

    return TuneResult(config=best[0], score=best[1], table=table)
