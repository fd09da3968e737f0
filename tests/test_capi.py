"""C interface: compile a real C program against galahad_tpu.h +
libgalahad_tpu_c.so and run it (reference src/cqp/C/cqpt.c pattern)."""
import os
import subprocess
import sys

import pytest

C_SRC = r"""
#include <stdio.h>
#include "galahad_tpu.h"

int main(void) {
    double H[4] = {1, 0, 0, 1};
    double g[2] = {-1, -2};
    double A[2] = {1, 1};
    double cl[1] = {-1e20}, cu[1] = {1.0};
    double xl[2] = {0, 0}, xu[2] = {1e20, 1e20};
    double x[2], y[1], z[2];
    galahad_tpu_inform inform;
    int st = galahad_tpu_qp_solve("cqp", 2, 1, H, g, 0.0, A, cl, cu,
                                  xl, xu, x, y, z, &inform);
    printf("status %d iter %d obj %.8f\n", st, inform.iter, inform.obj);
    if (st != 0) return 1;
    if (inform.obj < -1.51 || inform.obj > -1.49) return 2;
    if (inform.primal_infeasibility > 1e-6) return 3;
    /* unknown solver must fail cleanly, not crash */
    st = galahad_tpu_qp_solve("nosuch", 2, 1, H, g, 0.0, A, cl, cu,
                              xl, xu, x, y, z, &inform);
    if (st == 0) return 4;
    galahad_tpu_terminate();
    return 0;
}
"""


@pytest.mark.skipif(not os.path.exists("/usr/bin/gcc")
                    and not os.path.exists("/usr/local/bin/gcc"),
                    reason="no C compiler")
def test_c_program_solves_qp(tmp_path):
    from galahad_tpu.interfaces.c.build import build_capi

    so = build_capi()
    hdr_dir = os.path.join(os.path.dirname(__file__), "..",
                           "galahad_tpu", "interfaces", "c")
    src = tmp_path / "prog.c"
    src.write_text(C_SRC)
    exe = tmp_path / "prog"
    subprocess.run(
        ["gcc", "-O2", "-o", str(exe), str(src), f"-I{hdr_dir}", so,
         f"-Wl,-rpath,{os.path.dirname(so)}"],
        check=True, capture_output=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(hdr_dir.rstrip('/')) and
               os.path.abspath(os.path.join(hdr_dir, "..", "..", "..")))
    out = subprocess.run([str(exe)], capture_output=True, text=True,
                         timeout=560, env=env, cwd=tmp_path)
    assert out.returncode == 0, (out.stdout, out.stderr[-1500:])
    assert "status 0" in out.stdout
