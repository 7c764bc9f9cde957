from macroc_tpu.fem.element import (
    NGP,
    NPE,
    NVOI,
    DIM,
    NODE_OFFSETS,
    gauss_points,
    shape_derivatives,
    b_matrix,
)
from macroc_tpu.fem.kernels import (
    gather_element_dofs,
    compute_strains,
    assemble_residual,
    assemble_stencil,
    element_stiffness,
)

__all__ = [
    "NGP", "NPE", "NVOI", "DIM", "NODE_OFFSETS",
    "gauss_points", "shape_derivatives", "b_matrix",
    "gather_element_dofs", "compute_strains", "assemble_residual",
    "assemble_stencil", "element_stiffness",
]
