from .ipm import IPMControl, IPMState, ipm_solve, ipm_solve_compiled  # noqa: F401
from .bqp import BLLSControl, BQPControl, BQPInfo, blls_solve, bqp_solve  # noqa: F401
from .dqp import DQPControl, DQPInfo, ccqp_solve, dqp_solve  # noqa: F401
from .eqp import EQPControl, EQPInfo, eqp_solve  # noqa: F401
from .frontend import (  # noqa: F401
    L1QPControl, QPControl, WCPControl,
    l1qp_solve, lsqp_solve, qp_solve, wcp_solve,
)
from .ipm_banded import BandedQP, ipm_solve_banded, ipm_solve_banded_compiled  # noqa: F401
from .qpa import QPAControl, QPAInfo, qpa_solve, qpc_solve  # noqa: F401
from .qpb import QPBControl, QPBInfo, qpb_solve  # noqa: F401
from .lpa import LPAControl, LPAInfo, lpa_solve  # noqa: F401
from .cro import CROControl, CROInfo, cro_crossover  # noqa: F401
from .lpqp import lpqp_formulate, lpqp_restore, lpqp_violation  # noqa: F401
from .wrappers import bqpb_solve, dlp_solve, lpb_solve  # noqa: F401
