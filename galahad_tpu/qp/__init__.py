from .ipm import IPMControl, IPMState, ipm_solve, ipm_solve_compiled  # noqa: F401
from .bqp import BLLSControl, BQPControl, BQPInfo, blls_solve, bqp_solve  # noqa: F401
from .dqp import DQPControl, DQPInfo, ccqp_solve, dqp_solve  # noqa: F401
from .eqp import EQPControl, EQPInfo, eqp_solve  # noqa: F401
