"""Numerical hygiene: jit-vs-eager consistency and NaN guards — the
TPU-era replacement for the race-detector/sanitizer niche (SURVEY.md §5.2:
the reference has none; here compilation itself is the risk surface)."""

import jax
import jax.numpy as jnp
import numpy as np

from macroc_tpu.config import BC_BENDING, MacroConfig
from macroc_tpu.problem import MacroProblem


def test_jit_matches_eager():
    cfg = MacroConfig(
        nx=4, ny=3, nz=3, lx=3.0, ly=2.0, lz=2.0,
        bc_type=BC_BENDING, dtype="float64", newton_max_its=2,
    )
    p = MacroProblem(cfg, n_devices=1)
    u, state = p.init_fields()
    U = jnp.asarray(-0.01, p.dtype)
    u_j, s_j, d_j = p.time_step_jit(u, state, U)
    with jax.disable_jit():
        u_e, s_e, d_e = p.time_step(u, state, U)
    assert np.allclose(np.asarray(u_j), np.asarray(u_e), rtol=1e-12)
    assert np.allclose(
        np.asarray(d_j.res_norms), np.asarray(d_e.res_norms),
        rtol=1e-10, equal_nan=True,
    )
    assert int(d_j.n_solves) == int(d_e.n_solves)


def test_no_nans_in_outputs():
    cfg = MacroConfig(
        nx=5, ny=3, nz=3, lx=4.0, ly=2.0, lz=2.0,
        bc_type=BC_BENDING, dtype="float64", dt=0.15, newton_max_its=8,
    )
    p = MacroProblem(cfg, n_devices=1)
    u, state = p.init_fields()
    for ts in range(3):
        U = cfg.displacement(ts)
        u, state, d = p.time_step_jit(u, state, jnp.asarray(U, p.dtype))
        assert np.isfinite(np.asarray(u)).all()
        assert np.isfinite(float(d.force))
        assert np.isfinite(np.asarray(state.eps_p)).all()
        # nan-padding of unused diagnostics slots is expected; used slots
        # must be finite
        nh = int(d.n_homogenize)
        assert np.isfinite(np.asarray(d.res_norms)[:nh]).all()
