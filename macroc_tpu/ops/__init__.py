from macroc_tpu.ops.stencil import stencil_matvec, stencil_diag, stencil_diag_blocks

__all__ = ["stencil_matvec", "stencil_diag", "stencil_diag_blocks"]
