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


C_SRC_PKG = r"""
#include <stdio.h>
#include <stdint.h>
#include "galahad_tpu.h"

int main(void) {
    /* ---- CQP with an explicit control (Taylor arc) ---- */
    double H[4] = {1, 0, 0, 1};
    double g[2] = {-1, -2};
    double A[2] = {1, 1};
    double cl[1] = {-1e20}, cu[1] = {1.0};
    double xl[2] = {0, 0}, xu[2] = {1e20, 1e20};
    double x[2], y[1], z[2];
    galahad_tpu_inform inform;
    galahad_tpu_cqp_control ctl;
    galahad_tpu_cqp_control_init(&ctl);
    ctl.arc = 1;              /* Zhang-Taylor series */
    ctl.series_order = 3;
    int st = galahad_tpu_cqp_solve(&ctl, 2, 1, H, g, 0.0, A, cl, cu,
                                   xl, xu, x, y, z, &inform);
    if (st != 0) return 1;
    if (inform.obj < -1.51 || inform.obj > -1.49) return 2;

    /* ---- QPA active-set on the same problem ---- */
    st = galahad_tpu_qpa_solve(NULL, 2, 1, H, g, 0.0, A, cl, cu,
                               xl, xu, x, y, z, &inform);
    if (st != 0) return 3;
    if (inform.obj < -1.51 || inform.obj > -1.49) return 4;

    /* ---- TRS: boundary solution of a simple subproblem ---- */
    double Ht[4] = {2, 0, 0, 4};
    double gt[2] = {-4, 0};
    double xt[2];
    galahad_tpu_trs_inform ti;
    st = galahad_tpu_trs_solve(2, Ht, gt, 1.0, xt, &ti);
    if (st != 0) return 5;
    /* unconstrained min is (2, 0), radius 1 -> x = (1, 0), lambda = 2 */
    if (xt[0] < 0.999 || xt[0] > 1.001) return 6;
    if (ti.multiplier < 1.99 || ti.multiplier > 2.01) return 7;

    /* ---- SLS: tridiagonal factorize/solve + inertia ---- */
    int32_t rows[9] = {0, 1, 2, 3, 4, 1, 2, 3, 4};
    int32_t cols[9] = {0, 1, 2, 3, 4, 0, 1, 2, 3};
    double  vals[9] = {4, 4, 4, 4, 4, -1, -1, -1, -1};
    int64_t h = galahad_tpu_sls_analyse(5, 9, rows, cols, 0);
    if (h <= 0) return 8;
    if (galahad_tpu_sls_factorize(h, vals, 0.0) != 0) return 9;
    double b[5] = {1, 1, 1, 1, 1}, xs[5];
    if (galahad_tpu_sls_solve(h, b, xs) != 0) return 10;
    /* residual check: (A xs)[0] = 4 xs0 - xs1 == 1 */
    double r0 = 4*xs[0] - xs[1] - 1.0;
    if (r0 > 1e-8 || r0 < -1e-8) return 11;
    int32_t inertia[3];
    if (galahad_tpu_sls_inertia(h, inertia) != 0) return 12;
    if (inertia[0] != 5 || inertia[1] != 0) return 13;
    galahad_tpu_sls_free(h);
    galahad_tpu_terminate();
    printf("pkg entries ok\n");
    return 0;
}
"""


@pytest.mark.skipif(not os.path.exists("/usr/bin/gcc")
                    and not os.path.exists("/usr/local/bin/gcc"),
                    reason="no C compiler")
def test_c_per_package_entries(tmp_path):
    """Per-package C entries: cqp/qpa control structs, trs/rqs, handle-
    based sls (the reference's per-package ciface contract,
    src/cqp/C/cqp_ciface.f90, src/sls/C/sls_ciface.f90)."""
    from galahad_tpu.interfaces.c.build import build_capi

    so = build_capi()
    hdr_dir = os.path.join(os.path.dirname(__file__), "..",
                           "galahad_tpu", "interfaces", "c")
    src = tmp_path / "pkg.c"
    src.write_text(C_SRC_PKG)
    exe = tmp_path / "pkg"
    subprocess.run(
        ["gcc", "-O2", "-o", str(exe), str(src), f"-I{hdr_dir}", so,
         f"-Wl,-rpath,{os.path.dirname(so)}"],
        check=True, capture_output=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.abspath(
                   os.path.join(hdr_dir, "..", "..", "..")))
    out = subprocess.run([str(exe)], capture_output=True, text=True,
                         timeout=560, env=env, cwd=tmp_path)
    assert out.returncode == 0, (out.stdout, out.stderr[-1500:])
    assert "pkg entries ok" in out.stdout
