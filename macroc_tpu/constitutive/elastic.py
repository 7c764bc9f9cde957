"""Isotropic linear-elastic constitutive engine.

The simplest engine satisfying the MicroPP protocol: sigma = C eps with the
constant isotropic stiffness, ctan = C, no internal variables.  Matches the
reference behavior when loads stay below yield (f_trial <= 0 everywhere).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from macroc_tpu.config import MaterialParams
from macroc_tpu.constitutive.base import HomogenizeResult


def elastic_matrix(mat: MaterialParams) -> np.ndarray:
    """6x6 isotropic stiffness, engineering Voigt (xx,yy,zz,xy,xz,yz):
    sigma = C @ eps_eng (shear rows are mu * gamma)."""
    lam, mu = mat.lam, mat.mu
    C = np.zeros((6, 6), dtype=np.float64)
    C[:3, :3] = lam
    C[0, 0] = C[1, 1] = C[2, 2] = lam + 2.0 * mu
    C[3, 3] = C[4, 4] = C[5, 5] = mu
    return C


class ElasticEngine:
    """Stateless hashable engine (closed over in jit)."""

    def __init__(self, mat: MaterialParams, dtype=jnp.float32):
        self.mat = mat
        self.dtype = dtype
        self._C = jnp.asarray(elastic_matrix(mat), dtype=dtype)

    def __hash__(self):
        return hash((self.mat, str(self.dtype)))

    def __eq__(self, other):
        return (
            isinstance(other, ElasticEngine)
            and self.mat == other.mat
            and self.dtype == other.dtype
        )

    def init_state(self, batch_shape: Tuple[int, ...]):
        return ()  # no internal variables

    def homogenize(self, eps, state) -> HomogenizeResult:
        stress = jnp.einsum("vw,...w->...v", self._C, eps)
        batch = eps.shape[:-1]
        ctan = jnp.broadcast_to(self._C, batch + (6, 6))
        zeros = jnp.zeros(batch, dtype=self.dtype)
        return HomogenizeResult(
            stress=stress,
            ctan=ctan,
            trial_state=(),
            non_linear=jnp.zeros(batch, dtype=bool),
            f_trial=zeros,
            cost=zeros,
        )
