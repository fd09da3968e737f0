from .cholesky import (  # noqa: F401
    chol_factor, chol_factor_shifted, chol_ok, chol_solve,
    tridiag_factor, tridiag_solve,
)
from .sbls import SBLSFactors, sbls_factorize, sbls_solve, sbls_residual  # noqa: F401
