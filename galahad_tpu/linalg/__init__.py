from .cholesky import (  # noqa: F401
    chol_factor, chol_factor_shifted, chol_ok, chol_solve,
    tridiag_factor, tridiag_solve,
)
from .sbls import SBLSFactors, sbls_factorize, sbls_solve, sbls_residual  # noqa: F401
from .banded import (  # noqa: F401
    BlockTridiagFactors, band_to_blocks, block_tridiag_cholesky,
    block_tridiag_matvec, block_tridiag_solve,
)
from .bsc import bsc_form, bsc_form_blocks  # noqa: F401
from .ir import IRControl, ir_solve  # noqa: F401
from .psls import PSLSControl, psls_build  # noqa: F401
from .scu import (  # noqa: F401
    SCUState, scu_append, scu_delete, scu_refresh, scu_setup, scu_solve,
)
from .sls import SLSControl, SLSFactors, sls_enquire, sls_factorize, sls_solve  # noqa: F401
