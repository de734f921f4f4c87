"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` to fake an 8-device mesh
(SURVEY.md §4 "Implication for the new build").
"""

import os

# Hard-force the CPU platform: the environment may pin JAX_PLATFORMS to a
# remote TPU backend (e.g. "axon"), which would route every tiny test compile
# through a device tunnel.  Must happen before the first backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent compile cache under tests: XLA:CPU AOT cache entries record
# the compile machine's feature set and can SIGILL when loaded on a
# different host (and test compiles are tiny anyway).
os.environ["SCASML_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have already loaded jax config with the TPU platform;
# override the runtime config value as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
