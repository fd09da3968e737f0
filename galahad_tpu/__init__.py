"""galahad_tpu: a TPU-native large-scale continuous-optimization framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
GALAHAD optimization library (QP/LP interior-point and active-set
solvers, trust-region and regularization subproblem solvers, nonlinear
programming, sparse/dense linear-algebra layer), built for TPU: batched
MXU factorizations, vmapped subproblem solvers, mesh-sharded scenario
parallelism.
"""
__version__ = "0.1.0"

import os as _os

import jax as _jax

# Solver iterations are large jitted programs; persistent compilation
# caching is a large UX win (especially for repeated CLI/benchmark runs).
# Opt out with GALAHAD_TPU_NO_COMPILE_CACHE=1 or by pre-setting
# JAX_COMPILATION_CACHE_DIR.
if not _os.environ.get("GALAHAD_TPU_NO_COMPILE_CACHE"):
    try:
        if not _jax.config.jax_compilation_cache_dir:
            # KEYED BY HOST: XLA:CPU AOT executables encode the build
            # machine's CPU features; a cache dir shared across hosts
            # (network home) loads foreign-feature code and can SIGILL
            # (observed: cpu_aot_loader '+prefer-no-scatter not
            # supported on the host machine').
            # platform.node() is "vm" on several machines here;
            # /etc/machine-id actually distinguishes them
            try:
                with open("/etc/machine-id") as _fh:
                    _hk = _fh.read().strip()[:12]
            except OSError:
                import platform as _platform

                _hk = f"{_platform.node()}-{_platform.machine()}"
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.environ.get(
                    "JAX_COMPILATION_CACHE_DIR",
                    _os.path.expanduser(f"~/.cache/galahad_tpu/jax-{_hk}"),
                ),
            )
        # eager scatter/gather ops cost ~0.3-1 s EACH to compile and the
        # sparse path dispatches hundreds of distinct shapes; cache all
        # but the truly trivial ones
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

# Direct linear solvers cannot tolerate TPU's default bf16-pass matmuls:
# every factorization/backsolve here must run at full input precision
# (the f32-factor + compensated-residual design of SURVEY §7.3 assumes
# true f32 MXU passes).  Opt out with GALAHAD_TPU_FAST_MATMUL=1.
if not _os.environ.get("GALAHAD_TPU_FAST_MATMUL"):
    try:
        _jax.config.update("jax_default_matmul_precision", "highest")
    except Exception:  # pragma: no cover
        pass

from .core.problem import QP, NLP, INFINITY, classify_bounds  # noqa: F401
from .core.status import Status  # noqa: F401
