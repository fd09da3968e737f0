from .trs import (  # noqa: F401
    TRSControl, TRSInfo, RQSControl,
    trs_solve, trs_solve_diagonal, rqs_solve, dps_solve,
)
from .gltr import GLTRControl, GLRTControl, GLTRInfo, gltr_solve, glrt_solve  # noqa: F401
