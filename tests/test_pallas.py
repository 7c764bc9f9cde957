"""Pallas stencil-SpMV kernel vs the jnp SoA oracle (interpret mode on CPU).

The v2 kernel (macroc_tpu/ops/stencil_pallas.py) is the production SpMV for
large grids on TPU (problem.py operator="auto"); this runs it through the
Pallas interpreter so kernel-logic regressions fail in CI without hardware.
Random inputs are essential: a constant test vector is a rigid-body
translation in the operator's near-null space, where accumulation-order
differences between implementations read as O(1) relative error.
"""

import jax
import jax.numpy as jnp
import pytest

from macroc_tpu.ops.stencil_pallas import (
    stencil_matvec_pallas,
    stencil_matvec_soa,
)


@pytest.mark.parametrize("shape", [(6, 6, 6), (5, 9, 4)])
def test_pallas_v2_interpret_matches_oracle(shape):
    nx, ny, nz = shape
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (27, 3, 3, nx, ny, nz), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, nx, ny, nz), jnp.float32)
    y_ref = stencil_matvec_soa(A, x)
    y = stencil_matvec_pallas(A, x, tile=(4, 8, 128), interpret=True)
    assert y.shape == y_ref.shape
    rel = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
    assert rel < 1e-5, rel


@pytest.mark.parametrize("shape", [(6, 6, 6), (5, 9, 4)])
def test_pallas_halo_form_matches_oracle(shape):
    """halo=True (pre-exchanged 1-node halo input, the per-device form used
    inside shard_map) must equal the zero-halo global result when the halo
    ring is zeros."""
    nx, ny, nz = shape
    A = jax.random.normal(
        jax.random.PRNGKey(2), (27, 3, 3, nx, ny, nz), jnp.float32
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (3, nx, ny, nz), jnp.float32)
    xh = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1)))
    y_ref = stencil_matvec_soa(A, x)
    y = stencil_matvec_pallas(A, xh, tile=(4, 8, 128), interpret=True,
                              halo=True)
    rel = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
    assert rel < 1e-5, rel


def test_pallas_halo_ring_is_read():
    """Nonzero halo data must contribute — guards against the halo form
    silently dropping neighbor planes."""
    nx, ny, nz = 6, 6, 6
    A = jax.random.normal(
        jax.random.PRNGKey(4), (27, 3, 3, nx, ny, nz), jnp.float32
    )
    xh = jax.random.normal(
        jax.random.PRNGKey(5), (3, nx + 2, ny + 2, nz + 2), jnp.float32
    )
    # oracle: global matvec on the extended grid, cropped to the core
    Ae = jnp.pad(A, ((0, 0),) * 3 + ((1, 1), (1, 1), (1, 1)))
    # place the core A at the core nodes; halo rows are zero so the
    # extended matvec restricted to core rows equals the halo-form result
    y_ext = stencil_matvec_soa(Ae, xh)
    y_ref = y_ext[:, 1:-1, 1:-1, 1:-1]
    y = stencil_matvec_pallas(A, xh, tile=(4, 8, 128), interpret=True,
                              halo=True)
    rel = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
    assert rel < 1e-5, rel
