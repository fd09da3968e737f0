import os

# Tests always run on the host platform with 8 virtual devices: x64 is
# available there, the sharding tests need a mesh, and the TPU tunnel is
# reserved for benchmarks (bench.py).  Force (not setdefault): the
# environment may pre-set JAX_PLATFORMS to the tunnel backend.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)


# XLA:CPU's optimization passes recurse deeply on the largest programs
# in this suite (the qcqp -> lancelot -> trb while-loop nest) and can
# overflow the default 8 MB main-thread stack INSIDE the compiler — the
# historic mid-suite segfault in backend_compile_and_load.  The main
# thread's stack grows on demand up to RLIMIT_STACK, which may be
# raised at runtime.
import resource  # noqa: E402

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 * 1024 * 1024
if _soft != resource.RLIM_INFINITY and _soft < _want:
    try:
        _new = _want if _hard in (resource.RLIM_INFINITY,) \
            else min(_want, _hard)
        resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
    except (ValueError, OSError):
        pass

import jax  # noqa: E402

# The environment may register a TPU-tunnel backend via sitecustomize and
# pin it through jax config (overriding JAX_PLATFORMS); force host cpu.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the suite is dominated by XLA compilation of
# the jitted solvers; cache across runs.  KEYED BY HOST: XLA:CPU AOT
# executables encode the build machine's CPU features, and this repo is
# exercised from more than one host (the TPU-tunnel runner included) —
# sharing one cache dir across them loads foreign-feature executables
# and segfaults (observed: cpu_aot_loader 'prefer-no-scatter not
# supported ... SIGILL', then SIGSEGV in the cache read/write path).
import platform  # noqa: E402

# Concurrent pytest processes racing writes to one cache dir have also
# been observed to segfault in put_executable_and_time: give any
# parallel runner its own dir via GALAHAD_TPU_JAX_CACHE.
try:
    with open("/etc/machine-id") as _fh:
        _hk = _fh.read().strip()[:12]
except OSError:
    _hk = f"{platform.node()}-{platform.machine()}"
# ROOT CAUSE of the historic in-process segfault (VERDICT r4 item 8):
# the crash is in compilation_cache.get_executable_and_time — LOADING
# an XLA:CPU AOT executable whose target features don't match this
# process (entries written by axon-plugin-active processes carry
# +prefer-no-scatter/+prefer-no-gather; executing them SIGSEGVs).  The
# fix is to key the cache dir by a COMPILE-ENVIRONMENT fingerprint so
# pure-CPU test processes never read entries written under a different
# backend configuration.
import hashlib  # noqa: E402

try:  # container clones can share /etc/machine-id: fingerprint the
    # ACTUAL host CPU feature set too (the loader SIGILLs on foreign
    # features, it does not reject them)
    with open("/proc/cpuinfo") as _fh:
        for _ln in _fh:
            if _ln.startswith("flags"):
                _cpuflags = " ".join(sorted(_ln.split(":", 1)[1].split()))
                break
        else:
            _cpuflags = platform.machine()
except OSError:
    _cpuflags = platform.machine()
_env_fp = hashlib.sha256("|".join((
    jax.__version__,
    _cpuflags,
    os.environ.get("XLA_FLAGS", ""),
    os.environ.get("PALLAS_AXON_POOL_IPS", ""),
    os.environ.get("PALLAS_AXON_REMOTE_COMPILE", ""),
    os.environ.get("JAX_PLATFORMS", ""),
)).encode()).hexdigest()[:8]
_cache = os.environ.get(
    "GALAHAD_TPU_JAX_CACHE", f"/root/repo/.jax_cache/{_hk}-{_env_fp}")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# The full suite in one process has crashed XLA:CPU inside
# backend_compile_and_load at the same late-suite compile even with a
# cold cache, a raised stack limit, no axon plugin env, and no
# concurrent load — while every file passes alone and the same test
# compiles in seconds cold.  The trigger is cumulative in-process
# compiler state (~300 compiles).  Dropping all live executables and
# tracing caches between modules resets that state; the persistent
# on-disk cache makes the re-loads cheap.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
