/* C interface to the galahad_tpu framework.
 *
 * TPU-native counterpart of GALAHAD's C interface layer (reference
 * src/<pkg>/C/<pkg>_ciface.f90 + include/galahad.h:1-31, include/cqp.h):
 * the reference mirrors every Fortran control/inform derived type into
 * iso-c-binding structs; here the C ABI fronts the Python/JAX runtime
 * through an embedded interpreter, with the same dense-QP calling
 * convention as the reference's *_import / *_solve_qp entries.
 *
 * Status codes match galahad_tpu.core.status (reference
 * src/symbols/symbols.f90:52-102).
 */
#ifndef GALAHAD_TPU_H
#define GALAHAD_TPU_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* status values (subset; negative = error, 0 = success) */
#define GALAHAD_TPU_OK               0
#define GALAHAD_TPU_ALLOCATE        -1
#define GALAHAD_TPU_RESTRICTIONS    -3
#define GALAHAD_TPU_BAD_BOUNDS      -4
#define GALAHAD_TPU_PRIMAL_INFEAS   -5
#define GALAHAD_TPU_UNBOUNDED       -7
#define GALAHAD_TPU_FACTORIZATION  -10
#define GALAHAD_TPU_MAX_ITERATIONS -18
#define GALAHAD_TPU_UNKNOWN_SOLVER -26

/* inform block (the reference's *_inform_type essentials:
 * cqp.f90:484-575). */
typedef struct {
    int32_t status;
    int32_t iter;
    double  obj;
    double  primal_infeasibility;
    double  dual_infeasibility;
    double  complementary_slackness;
} galahad_tpu_inform;

/* Initialize / finalize the embedded runtime.  Calling solve functions
 * initializes lazily; explicit init lets callers front-load the cost. */
int galahad_tpu_init(void);
void galahad_tpu_terminate(void);

/* Solve the dense QP
 *     min 1/2 x'Hx + g'x + f
 *     s.t. c_l <= A x <= c_u,  x_l <= x <= x_u
 * with the named solver ("cqp", "dqp", "ccqp", "qpa", "qpb", "qpc",
 * "lpa", "lpb").  H is n*n row-major (pass NULL for an LP), A is m*n
 * row-major (may be NULL when m == 0).  x/y/z are output arrays of
 * size n/m/n.  Returns inform.status (also written to *inform if
 * non-NULL). */
int galahad_tpu_qp_solve(const char *solver,
                         int32_t n, int32_t m,
                         const double *H, const double *g, double f,
                         const double *A,
                         const double *c_l, const double *c_u,
                         const double *x_l, const double *x_u,
                         double *x, double *y, double *z,
                         galahad_tpu_inform *inform);

#ifdef __cplusplus
}
#endif
#endif /* GALAHAD_TPU_H */
