from .ipm import IPMControl, IPMState, ipm_solve, ipm_solve_compiled  # noqa: F401
