"""Multi-device decomposition tests on the virtual 8-device CPU mesh.

Mirrors the reference's mpirun -np {2,8} CTest configurations
(tests/CMakeLists.txt:21-28) — and goes further: the single-device and
8-way-sharded runs must agree to solver tolerance (the reference only
checked run-to-completion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macroc_tpu.config import BC_BENDING, MacroConfig
from macroc_tpu.parallel import make_grid_mesh, node_sharding, shard_problem_fields
from macroc_tpu.problem import MacroProblem

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

CFG = dict(
    nx=9, ny=5, nz=5, lx=4.0, ly=2.0, lz=2.0,
    bc_type=BC_BENDING, dtype="float64",
    dt=0.001, u_max=-1.0, newton_max_its=3,
)


def _run(problem, n_steps=2, mesh=None):
    u, state = problem.init_fields()
    if mesh is not None:
        u, state = shard_problem_fields(mesh, u, state)
    step = jax.jit(problem.time_step)
    diag = None
    for ts in range(n_steps):
        U = problem.cfg.displacement(ts)
        u, state, diag = step(u, state, jnp.asarray(U, problem.dtype))
    return np.asarray(problem.unpad_u(u)), diag


def test_sharded_matches_single_device():
    cfg1 = MacroConfig(**CFG)
    p1 = MacroProblem(cfg1, n_devices=1)
    u_ref, d_ref = _run(p1)

    cfg8 = MacroConfig(**CFG, procs_x=2, procs_y=2, procs_z=2)
    p8 = MacroProblem(cfg8, n_devices=8)
    mesh = make_grid_mesh(p8.grid)
    u8, d8 = _run(p8, mesh=mesh)

    # cross-decomposition agreement to solver tolerance (SURVEY.md §4)
    assert np.allclose(u8, u_ref, rtol=1e-6, atol=1e-9)
    assert int(d8.n_solves) == int(d_ref.n_solves)
    # residual traces agree
    assert np.allclose(
        np.asarray(d8.res_norms),
        np.asarray(d_ref.res_norms),
        rtol=1e-5,
        equal_nan=True,
    )


def test_uneven_split_sharding():
    """Node counts not divisible by the mesh (9 nodes over 2 ranks in x)."""
    cfg = MacroConfig(**CFG, procs_x=4, procs_y=1, procs_z=2)
    p = MacroProblem(cfg, n_devices=8)
    mesh = make_grid_mesh(p.grid)
    u, diag = _run(p, n_steps=2, mesh=mesh)
    assert np.isfinite(u).all()
    assert bool(diag.converged)


def test_graft_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
