"""galahad_tpu: a TPU-native large-scale continuous-optimization framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
GALAHAD optimization library (QP/LP interior-point and active-set
solvers, trust-region and regularization subproblem solvers, nonlinear
programming, sparse/dense linear-algebra layer), built for TPU: batched
MXU factorizations, vmapped subproblem solvers, mesh-sharded scenario
parallelism.
"""
__version__ = "0.1.0"

from .core.problem import QP, NLP, INFINITY, classify_bounds  # noqa: F401
from .core.status import Status  # noqa: F401
