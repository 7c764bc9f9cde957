"""Device mesh + sharding layout for the 3D grid decomposition.

The reference's parallelism is a single strategy: 3D spatial domain
decomposition over MPI ranks via DMDA (SURVEY.md §2.3).  The TPU-native
equivalent is a ``jax.sharding.Mesh`` with axes ('x','y','z') matching the
(px,py,pz) processor grid, and NamedSharding P('x','y','z') on the leading
three (spatial) dims of every field:

  - node fields   u, b, du : (nx, ny, nz, 3)        -> P('x','y','z')
  - GP fields     eps, sig : (nex, ney, nez, 8, ..) -> P('x','y','z')
  - stencil matrix     A27 : (nx, ny, nz, 27, 3, 3) -> P('x','y','z')

With these shardings the *global-semantics* kernels (shifted-slice gathers
and scatter-adds in fem/kernels.py, the 27-point SpMV, the CG dot products)
are partitioned by XLA's SPMD pass, which inserts exactly the communication
the reference performed explicitly:

  reference (MPI/PETSc)                     XLA SPMD equivalent
  -------------------------------------     ----------------------------
  DMGlobalToLocal halo (assembly.c:40)  ->  collective-permute on slice
  DMLocalToGlobal ADD  (assembly.c:164) ->  reverse halo add on .at[].add
  VecNorm/VecDot allreduce              ->  all-reduce on jnp.sum
  MatAssembly comm     (assembly.c:109) ->  reverse halo add on stencil

When a DCN-spanning axis exists (multi-host), put it on the mesh axis with
the smallest halo surface (largest grid extent) — mesh construction below
orders axes so 'x' is outermost, matching jax.make_mesh's device ordering
where the outermost axis crosses hosts first.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from macroc_tpu.grid import StructuredGrid3D


def make_grid_mesh(
    grid: StructuredGrid3D, devices: Optional[Sequence] = None
) -> Mesh:
    """Mesh with axes ('x','y','z') shaped like the processor grid."""
    px, py, pz = grid.procs
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: px * py * pz]).reshape(px, py, pz)
    return Mesh(devices, ("x", "y", "z"))


def node_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (nx, ny, nz, ...) node-centric arrays."""
    return NamedSharding(mesh, P("x", "y", "z"))


def gp_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (nex, ney, nez, ...) element/GP-centric arrays."""
    return NamedSharding(mesh, P("x", "y", "z"))


def shard_problem_fields(mesh: Mesh, u: jax.Array, state: Any):
    """Place (u, constitutive state) on the mesh with the grid layout."""
    ns = node_sharding(mesh)
    gs = gp_sharding(mesh)
    u = jax.device_put(u, ns)
    state = jax.tree_util.tree_map(lambda a: jax.device_put(a, gs), state)
    return u, state
