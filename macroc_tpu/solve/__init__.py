from macroc_tpu.solve.precond import (
    jacobi_precond,
    block_jacobi_precond,
    identity_precond,
    jacobi_precond_soa,
    block_jacobi_precond_soa,
)
from macroc_tpu.solve.cg import cg_solve, KSPResult
from macroc_tpu.solve.gmres import gmres_solve

__all__ = [
    "jacobi_precond",
    "block_jacobi_precond",
    "identity_precond",
    "jacobi_precond_soa",
    "block_jacobi_precond_soa",
    "cg_solve",
    "gmres_solve",
    "KSPResult",
]
