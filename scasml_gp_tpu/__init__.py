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
