from macroc_tpu.solve.precond import (
    jacobi_precond,
    block_jacobi_precond,
    identity_precond,
)
from macroc_tpu.solve.cg import cg_solve, KSPResult
from macroc_tpu.solve.gmres import gmres_solve

__all__ = [
    "jacobi_precond",
    "block_jacobi_precond",
    "identity_precond",
    "cg_solve",
    "gmres_solve",
    "KSPResult",
]
