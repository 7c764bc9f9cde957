"""macroc_tpu — a TPU-native FE² macro-scale solid-mechanics framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the MacroC
reference (GG1991/macroc): a parallel finite-element code that solves the
macro-scale problem of an FE² multi-scale simulation of composite materials
(reference: src/main.c, doc/manual.tex).

Design principles (TPU-first, not a port):
  - The 3D structured grid of 8-node hexahedra lives as dense node-centric
    arrays ``(nx, ny, nz, 3)``; element gather/scatter are shifted-slice ops
    (race-free, no atomics) instead of PETSc DMDA index arrays.
  - The Jacobian is a 27-point 3x3-block stencil (the structured-grid form of
    a BSR matrix) instead of MATAIJ; SpMV is a Pallas stencil kernel.
  - The Newton/CG hot path is a single jitted device program; multi-chip runs
    shard the grid over a ``jax.sharding.Mesh('x','y','z')`` with ppermute
    halo exchange replicating DMDA's decomposition.
  - The per-Gauss-point constitutive response (MicroPP's role) is a batched,
    vmapped engine carrying internal-variable state as a pytree.
"""

__version__ = "0.1.0"

from macroc_tpu.config import MacroConfig, parse_cli
from macroc_tpu.grid import StructuredGrid3D

__all__ = [
    "MacroConfig",
    "parse_cli",
    "StructuredGrid3D",
]
