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
