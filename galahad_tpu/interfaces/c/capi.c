/* Embedded-interpreter implementation of the galahad_tpu C interface.
 *
 * The reference's C layer is generated Fortran (iso_c_binding shims,
 * src/cqp/C/cqp_ciface.f90); ours bridges into the Python/JAX runtime:
 * galahad_tpu_qp_solve marshals raw pointers (as integers) into
 * galahad_tpu.capi_impl.qp_solve_raw, which wraps them zero-copy with
 * numpy and runs the requested solver.  Thread-safety: calls are
 * serialized through the GIL.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <string.h>

#include "galahad_tpu.h"

static PyObject *g_impl = NULL;

int galahad_tpu_init(void) {
    if (g_impl != NULL) return 0;
    if (!Py_IsInitialized()) {
        Py_InitializeEx(0);
    }
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *mod = PyImport_ImportModule("galahad_tpu.capi_impl");
    if (mod == NULL) {
        PyErr_Print();
        PyGILState_Release(st);
        return GALAHAD_TPU_ALLOCATE;
    }
    g_impl = mod;
    PyGILState_Release(st);
    return 0;
}

void galahad_tpu_terminate(void) {
    if (g_impl != NULL) {
        PyGILState_STATE st = PyGILState_Ensure();
        Py_CLEAR(g_impl);
        PyGILState_Release(st);
    }
}

int galahad_tpu_qp_solve(const char *solver,
                         int32_t n, int32_t m,
                         const double *H, const double *g, double f,
                         const double *A,
                         const double *c_l, const double *c_u,
                         const double *x_l, const double *x_u,
                         double *x, double *y, double *z,
                         galahad_tpu_inform *inform) {
    int rc = galahad_tpu_init();
    if (rc != 0) return rc;

    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *res = PyObject_CallMethod(
        g_impl, "qp_solve_raw", "sii" "LLd" "LLL" "LL" "LLL",
        solver, (int)n, (int)m,
        (long long)(intptr_t)H, (long long)(intptr_t)g, f,
        (long long)(intptr_t)A,
        (long long)(intptr_t)c_l, (long long)(intptr_t)c_u,
        (long long)(intptr_t)x_l, (long long)(intptr_t)x_u,
        (long long)(intptr_t)x, (long long)(intptr_t)y,
        (long long)(intptr_t)z);
    int status;
    if (res == NULL) {
        PyErr_Print();
        status = GALAHAD_TPU_RESTRICTIONS;
        if (inform != NULL) {
            memset(inform, 0, sizeof(*inform));
            inform->status = status;
        }
    } else {
        /* res = (status, iter, obj, rp, rd, rc) */
        int iter = 0;
        double obj = 0, rp = 0, rd = 0, rcs = 0;
        if (!PyArg_ParseTuple(res, "iidddd", &status, &iter, &obj,
                              &rp, &rd, &rcs)) {
            PyErr_Print();
            status = GALAHAD_TPU_RESTRICTIONS;
        }
        if (inform != NULL) {
            inform->status = status;
            inform->iter = iter;
            inform->obj = obj;
            inform->primal_infeasibility = rp;
            inform->dual_infeasibility = rd;
            inform->complementary_slackness = rcs;
        }
        Py_DECREF(res);
    }
    PyGILState_Release(st);
    return status;
}
