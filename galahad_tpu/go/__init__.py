from .bgo import BGOControl, BGOInfo, bgo_solve  # noqa: F401
from .dgo import DGOControl, DGOInfo, dgo_solve  # noqa: F401
from .lhs import lhs_sample, lhs_sample_box  # noqa: F401
from .ugo import UGOControl, UGOInfo, ugo_solve  # noqa: F401
