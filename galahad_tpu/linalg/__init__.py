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
from .uls import (  # noqa: F401
    ULSControl, ULSFactors, uls_enquire, uls_factorize, uls_find_basis,
    uls_solve,
)
from .convert import (  # noqa: F401
    COO, CSR, band_from_coo, coo_to_csr, coo_to_dense, csr_to_coo,
    csr_to_csc, csr_to_dense, dense_to_coo, dense_to_csr, symmetric_expand,
)
from .mop import (  # noqa: F401
    coo_Ax, coo_Aty, coo_col_norms, coo_extract_diagonal, coo_row_norms,
    coo_scale,
)
from .miqr import (  # noqa: F401
    MIQRControl, MIQRFactors, miqr_apply, miqr_apply_transpose, miqr_form,
)
