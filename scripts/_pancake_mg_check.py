"""Ad-hoc: semicoarsened-MG vs Jacobi iteration counts on pancake grids."""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys
import numpy as np
import jax.numpy as jnp

from macroc_tpu import bc as bc_mod
from macroc_tpu.config import MacroConfig, MaterialParams
from macroc_tpu.constitutive.elastic import elastic_matrix
from macroc_tpu.fem.element import b_for
from macroc_tpu.fem.kernels import assemble_stencil_soa
from macroc_tpu.grid import make_grid
from macroc_tpu.ops.stencil_pallas import stencil_matvec_soa, x_to_soa
from macroc_tpu.solve import cg_solve, jacobi_precond_soa
from macroc_tpu.solve.mg import build_hierarchy, make_mg_preconditioner

shapes = [(33, 3, 33), (50, 3, 50), (40, 3, 40)]
for (nx, ny, nz) in shapes:
    cfg = MacroConfig(
        nx=nx, ny=ny, nz=nz, lx=50.0, ly=1.0, lz=50.0,
        dtype="float64", ref_b_quirk=True,
    )
    grid = make_grid(cfg, 1)
    shape = (nx, ny, nz)
    B = jnp.asarray(b_for(grid.spacing, True))
    C = elastic_matrix(MaterialParams())
    ctan = jnp.broadcast_to(jnp.asarray(C), (nx - 1, ny - 1, nz - 1, 8, 6, 6))
    bc = bc_mod.build_bc(grid, cfg, jnp.float64)
    A_soa = bc_mod.apply_bc_stencil_soa(
        assemble_stencil_soa(ctan, B, grid.wg, shape), bc
    )
    bc_soa = jnp.moveaxis(bc.mask, -1, 0)
    rng = np.random.default_rng(3)
    b = x_to_soa(jnp.asarray(
        np.where(np.asarray(bc.mask), 0.0, rng.normal(size=shape + (3,)))
    ))
    mv = lambda x: stencil_matvec_soa(A_soa, x)
    r_j = jax.jit(
        lambda bb: cg_solve(mv, bb, jacobi_precond_soa(A_soa), rtol=1e-5)
    )(b)
    levels = build_hierarchy(ctan, bc_soa, grid.spacing, ref_quirk=True,
                             A0_soa=A_soa)
    lvl_shapes = [tuple(l.A_soa.shape[-3:]) for l in levels]
    print(f"{nx}x{ny}x{nz}: jacobi {int(r_j.its)} its | levels {lvl_shapes}",
          flush=True)
    for nu in (1, 2):
        for omega in (0.6, 0.8, 1.0):
            M = make_mg_preconditioner(levels, nu=nu, omega=omega,
                                       coarse_sweeps=10)
            r_m = jax.jit(lambda bb: cg_solve(mv, bb, M, rtol=1e-5))(b)
            err = float(jnp.linalg.norm(r_m.x - r_j.x)
                        / jnp.linalg.norm(r_j.x))
            print(f"  nu={nu} omega={omega}: mg {int(r_m.its)} its "
                  f"(reason {int(r_m.reason)}) rel-diff {err:.1e}",
                  flush=True)
            jax.clear_caches()
