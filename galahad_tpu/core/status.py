"""Library-wide status codes.

TPU-native re-design of the GALAHAD status registry
(reference: src/symbols/symbols.f90:52-102).  The negative-integer error
contract is preserved so that users migrating from the reference find the
same codes; positive codes are reverse-communication requests in the
reference and are unused here (callbacks/closures replace reverse
communication).
"""
from __future__ import annotations

import enum


class Status(enum.IntEnum):
    """Solver exit status.  0 = success, negative = error.

    Mirrors GALAHAD's registry (src/symbols/symbols.f90:52-102).
    """

    OK = 0
    # Errors (same numbering as the reference)
    ALLOCATE = -1
    DEALLOCATE = -2
    RESTRICTIONS = -3          # bad problem dimensions / inputs
    BAD_BOUNDS = -4            # inconsistent bounds x_l > x_u or c_l > c_u
    PRIMAL_INFEASIBLE = -5
    DUAL_INFEASIBLE = -6
    UNBOUNDED = -7
    NO_CENTER = -8
    ANALYSIS = -9              # symbolic analysis failed
    FACTORIZATION = -10        # numeric factorization failed
    SOLVE = -11                # backsolve failed
    ILL_CONDITIONED = -12
    TINY_STEP = -13            # progress stalled
    MAX_ITERATIONS = -18
    CPU_LIMIT = -19
    INERTIA = -20              # factorization inertia differs from expected
    FILE = -21
    IO = -22
    UPPER_ENTRY = -23
    SORT = -24
    INPUT_STATUS = -25
    UNKNOWN_SOLVER = -26
    NOT_YET_IMPLEMENTED = -27
    QP_SOLVE = -28
    UNAVAILABLE_OPTION = -29
    EVALUATION = -40           # user callback signalled an error
    ALIVE = -50

    # Informative non-error exits
    MAX_INNER_ITERATIONS = -17


# Human-readable messages for diagnostics.
STATUS_MESSAGES: dict[int, str] = {
    Status.OK: "success",
    Status.RESTRICTIONS: "one or more input restrictions violated",
    Status.BAD_BOUNDS: "inconsistent bounds (lower exceeds upper)",
    Status.PRIMAL_INFEASIBLE: "the problem appears primal infeasible",
    Status.DUAL_INFEASIBLE: "the problem appears dual infeasible",
    Status.UNBOUNDED: "the problem appears unbounded from below",
    Status.FACTORIZATION: "matrix factorization failed",
    Status.ILL_CONDITIONED: "the system is too ill-conditioned",
    Status.TINY_STEP: "step too small to make further progress",
    Status.MAX_ITERATIONS: "iteration limit reached",
    Status.INERTIA: "unexpected factorization inertia",
    Status.UNKNOWN_SOLVER: "requested solver is not known",
    Status.NOT_YET_IMPLEMENTED: "option not yet implemented",
    Status.EVALUATION: "user evaluation failed",
}


def status_message(status: int) -> str:
    try:
        s = Status(int(status))
    except ValueError:
        return f"unknown status {status}"
    return STATUS_MESSAGES.get(s, s.name.lower().replace("_", " "))
