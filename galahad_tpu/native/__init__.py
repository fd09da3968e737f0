"""Native host-side runtime (C++ via ctypes).

Holds the graph/symbolic work the reference also keeps in native code
(SSIDS analyse phase, orderings): compiled on first use with the
system g++ into a cached shared library — no pip, no pybind11
(CPython-free C ABI + ctypes).
"""
from .build import load_symbolic  # noqa: F401
from .wrappers import (  # noqa: F401
    amd_order,
    etree,
    nd_order,
    postorder,
    rcm_order,
    supernode_partition,
    symbolic_count,
    symbolic_factor,
    tree_levels,
)
