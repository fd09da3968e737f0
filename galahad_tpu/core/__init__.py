from .problem import QP, NLP, INFINITY, BoundMasks, classify_bounds, check_qp  # noqa: F401
from .status import Status, status_message  # noqa: F401
