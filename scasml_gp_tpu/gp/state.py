"""Trained-GP state as a pytree + checkpoint/restore.

The reference keeps its trained surrogate implicitly in object attributes
(``right_vector``, training points; models/GP.py:191-192,600) with no
serialization at all (SURVEY.md §5 "Checkpoint / resume").  Here the state is
an explicit NamedTuple pytree so it can be (a) passed through ``jit`` /
``shard_map`` into the Picard rollouts and (b) saved/restored, letting
harnesses reuse a trained surrogate across runs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GPState(NamedTuple):
    """Everything needed to evaluate the trained GP posterior."""

    x_dom: jax.Array        # (N, d+1) training interior points
    x_bdy: jax.Array        # (Nb, d+1) training boundary points
    right_vector: jax.Array  # (4N+Nb,) representer weights (models/GP.py:599-600)
    sol: jax.Array          # (3N,) final (z1, z3, z5) unknowns
    gamma: jax.Array        # () kernel precision 1/sigma_k^2
    loss_history: jax.Array  # (steps+1,) Newton loss trace

    @property
    def n_domain(self) -> int:
        return self.x_dom.shape[0]

    @property
    def n_boundary(self) -> int:
        return self.x_bdy.shape[0]

    @property
    def dim(self) -> int:
        return self.x_dom.shape[1] - 1


def save_state(path: str, state: GPState) -> None:
    np.savez(
        path,
        **{k: np.asarray(v) for k, v in state._asdict().items()},
    )


def load_state(path: str) -> GPState:
    with np.load(path) as data:
        return GPState(
            **{k: jnp.asarray(data[k]) for k in GPState._fields}
        )
