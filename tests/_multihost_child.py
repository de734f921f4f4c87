"""Child process for the multi-host smoke test (tests/test_multihost.py).

Runs as one of two jax.distributed processes on the CPU backend, each with two
local virtual devices (4 global), builds the 2-D mesh through
``scasml_gp_tpu.parallel.mesh`` and executes ONE data-sharded Picard rollout
step over a global batch array.  Exercises the multi-process init path
(parallel/mesh.py initialize_distributed) that single-process tests and
``dryrun_multichip`` cannot reach (VERDICT.md round-1 Next-round #7).

Usage: python tests/_multihost_child.py <process_id> <coordinator_port>
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


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]

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
