"""Build-on-first-use for the C interface shared library."""
from __future__ import annotations

import hashlib
import os
import subprocess
import sysconfig


def _cache_dir() -> str:
    d = os.environ.get(
        "GALAHAD_TPU_NATIVE_CACHE",
        os.path.expanduser("~/.cache/galahad_tpu/native"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def build_capi() -> str:
    """Compile libgalahad_tpu_c.so (embedding libpython); returns path."""
    here = os.path.dirname(__file__)
    src = os.path.join(here, "capi.c")
    hdr = os.path.join(here, "galahad_tpu.h")
    tag = hashlib.sha256(
        open(src, "rb").read() + open(hdr, "rb").read()).hexdigest()[:16]
    so = os.path.join(_cache_dir(), f"libgalahad_tpu_c-{tag}.so")
    if os.path.exists(so):
        return so
    inc = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR")
    pyver = sysconfig.get_config_var("LDVERSION") or sysconfig.get_config_var(
        "VERSION")
    tmp = so + f".tmp{os.getpid()}"
    subprocess.run(
        ["gcc", "-O2", "-fPIC", "-shared", "-o", tmp, src,
         f"-I{inc}", f"-I{here}",
         f"-L{libdir}", f"-Wl,-rpath,{libdir}", f"-lpython{pyver}"],
        check=True, capture_output=True,
    )
    os.replace(tmp, so)
    return so
