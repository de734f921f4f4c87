"""Child process for the multi-host smoke test (tests/test_multihost.py).

Runs as one of two jax.distributed processes on the CPU backend, each with two
local virtual devices (4 global), builds the 2-D mesh through
``scasml_gp_tpu.parallel.mesh`` and executes ONE data-sharded Picard rollout
step over a global batch array.  Exercises the multi-process init path
(parallel/mesh.py initialize_distributed) that single-process tests and
``dryrun_multichip`` cannot reach (VERDICT.md round-1 Next-round #7).

Round 5 adds mode "trainer" (VERDICT round-4 Next #7): the same 2-process
topology runs the row-sharded dual-CG GP trainer
(``gp.distributed.make_distributed_train``) over a (1, 4) 'model' mesh, so
the CG matvec's cross-process all-gather — the actual multi-chip training
collective — executes across a real process boundary, and the result is
asserted against the single-process dense Newton trainer computed locally.

Usage: python tests/_multihost_child.py <process_id> <coordinator_port> \
        [rollout|trainer]
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# belt-and-braces: a sitecustomize may have configured another platform
jax.config.update("jax_platforms", "cpu")


def _run_trainer(pid):
    """Distributed dual-CG GP training across the 2-process mesh, checked
    against the dense Newton trainer (tolerances of
    tests/test_distributed.py::test_distributed_matches_dense_newton)."""
    from scasml_gp_tpu.config import GPConfig
    from scasml_gp_tpu.equations import GradDependentNonlinear
    from scasml_gp_tpu.gp import GPGradDependentNonlinear
    from scasml_gp_tpu.gp.distributed import make_distributed_train
    from scasml_gp_tpu.parallel.mesh import make_mesh, replicated

    D, N, Nb = 6, 96, 24
    eq = GradDependentNonlinear(n_input=D + 1)
    gp = GPGradDependentNonlinear(eq, GPConfig())
    x_dom, x_bdy = eq.generate_data(N, Nb, key=jax.random.PRNGKey(0))
    bdy_g = eq.g(x_bdy)[:, 0].astype(jnp.float32)
    rhs = gp.form.rhs_f(x_dom).astype(jnp.float32)

    # dense reference: plain single-process Newton on local devices
    gp_dense = GPGradDependentNonlinear(eq, GPConfig(gn_steps=12))
    gp_dense.GPsolver(x_dom, x_bdy)
    loss_dense = float(np.asarray(gp_dense.state.loss_history)[-1])

    mesh = make_mesh(data=1, model=4)  # 4 global devices, 2 per process
    rep = replicated(mesh)
    train = make_distributed_train(gp.form, mesh, D, gn_steps=12)

    def as_global(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, rep,
                                            lambda idx: a[idx])

    out, K = train(
        as_global(x_dom), as_global(x_bdy), as_global(bdy_g), as_global(rhs),
        as_global(jnp.asarray(gp.gamma, jnp.float32)),
        as_global(jnp.float32(gp.nugget)),
    )
    # K row-sharded over the GLOBAL 'model' axis: each process holds 2 of 4
    # row shards
    assert K.sharding.spec[0] == "model", K.sharding.spec
    assert len(K.addressable_shards) == 2, len(K.addressable_shards)
    phi = 4 * N + Nb
    assert sum(s.data.shape[0] for s in K.addressable_shards) == phi // 2

    resid = float(np.asarray(out.final_residual))
    assert resid < 1e-3, resid
    loss_dist = float(np.asarray(out.loss_history)[-1])
    assert np.isclose(loss_dist, loss_dense, rtol=5e-2), (
        loss_dist, loss_dense,
    )
    # replicated outputs agree across processes (digest printed and compared
    # by the parent)
    digest = float(np.asarray(out.right_vector).sum())
    print(f"OK process={pid} sum={digest:.6f} loss={loss_dist:.6f}",
          flush=True)


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "rollout"

    from scasml_gp_tpu.parallel.mesh import (
        batch_sharding,
        initialize_distributed,
        make_mesh,
        replicated,
    )

    initialize_distributed(
        coordinator=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2

    if mode == "trainer":
        _run_trainer(pid)
        return

    from scasml_gp_tpu.equations import GradDependentNonlinear
    from scasml_gp_tpu.picard.mlp import MLPFullHistory

    D = 3
    eq = GradDependentNonlinear(n_input=D + 1)
    solver = MLPFullHistory(eq)
    uz = solver._build((1, 2))

    mesh = make_mesh(data=4, model=1)
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    B = 16

    # Deterministic global batch; every process materializes only its shards.
    full = np.linspace(-0.4, 0.4, B * (D + 1)).reshape(B, D + 1)
    full = full.astype(np.float32)
    x_global = jax.make_array_from_callback((B, D + 1), bsh,
                                            lambda idx: full[idx])
    key_host = np.asarray(jax.random.PRNGKey(0))
    key_global = jax.make_array_from_callback(
        key_host.shape, rep, lambda idx: key_host[idx]
    )

    step = jax.jit(uz, in_shardings=(bsh, rep, None), out_shardings=bsh)
    out = step(x_global, key_global, None)
    local = np.concatenate(
        [np.asarray(s.data) for s in out.addressable_shards]
    )
    assert local.shape[1] == 1 + D
    assert np.isfinite(local).all()
    # cross-process agreement on a replicated reduction of the sharded output
    total = jax.jit(
        lambda o: jnp.sum(o[:, 0]), out_shardings=rep
    )(out)
    print(f"OK process={pid} sum={float(total):.6f}", flush=True)


if __name__ == "__main__":
    main()
