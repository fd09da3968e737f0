from .fdc import FDCControl, FDCInfo, fdc_find_dependent  # noqa: F401
from .presolve import PresolveControl, PresolveInfo, presolve_apply  # noqa: F401
from .scale import ScaleControl, Scaling, scale_apply, scale_get, scale_recover  # noqa: F401
