from .arc import ARCControl, arc_solve  # noqa: F401
from .nls import NLSControl, nls_solve  # noqa: F401
from .tru import TRBControl, TRUControl, TRUState, trb_solve, tru_solve  # noqa: F401
