"""Batched micro-FE homogenization — the full FE² constitutive engine.

This is the TPU-native counterpart of MicroPP (the external C++ library the
reference drives per Gauss point; SURVEY.md §2.2): at every macro Gauss
point, the constitutive response comes from a finite-element solve on a
micro RVE (n x n x n hex elements, two materials arranged by `micro_type`
geometry), homogenized under linear-displacement boundary conditions:

    u_micro = eps_macro . x   on the RVE boundary
    sigma_macro = (1/V) \\int sigma_micro dV
    C_macro     = d sigma_macro / d eps_macro   (central finite differences,
                  the same approach MicroPP uses)

Where MicroPP runs these micro solves SEQUENTIALLY per rank, here the whole
population of macro GPs is one vmapped batch: every micro Newton iteration,
radial return, element assembly and CG iteration happens simultaneously for
all GPs — the workload the reference treats as its main load-imbalance
problem (per-GP `cost` output, output.c:179-187) becomes a uniform dense
batch on the TPU.

The micro solver REUSES the macro machinery (fem.kernels, solve.cg,
j2_radial_return with per-element material fields) on the micro grid —
same code path, smaller shapes, batched.

Internal state per macro GP (committed only by update_vars):
  eps_p (n,n,n,8,6), alpha (n,n,n,8)  — micro plastic internal vars
  u     (n+1,n+1,n+1,3)               — micro displacement (warm start)

Geometry types replicate the reference's enum (src/init.c:37-45) with the
material-2 region parameterized by params[3] (width/radius fraction).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from macroc_tpu.config import (
    MIC_CILI_FIB_XZ,
    MIC_CILI_FIB_Z,
    MIC_HOMOGENEOUS,
    MIC_LAYER_Y,
    MIC_QUAD_FIB_XYZ,
    MIC_QUAD_FIB_XZ,
    MIC_QUAD_FIB_XZ_BROKEN_X,
    MIC_SPHERE,
    MaterialParams,
)
from macroc_tpu.constitutive.base import HomogenizeResult
from macroc_tpu.constitutive.j2 import j2_radial_return
from macroc_tpu.fem.element import b_matrix
from macroc_tpu.fem.kernels import (
    assemble_residual,
    assemble_stencil,
    compute_strains,
)
from macroc_tpu.ops.stencil import stencil_matvec
from macroc_tpu.solve.cg import cg_solve
from macroc_tpu.solve.precond import jacobi_precond


def material2_mask(n: int, micro_type: int, params) -> np.ndarray:
    """(n,n,n) bool: True where the micro element belongs to material 2.
    Geometry tested at element centers of the unit-size RVE (params[0:3] =
    box dims, params[3] = width/radius fraction; reference defaults
    {1,1,1,0.5}, src/init.c:212)."""
    lx, ly, lz, w = (list(params) + [0.5] * 4)[:4]
    c = (np.arange(n) + 0.5) / n
    X, Y, Z = np.meshgrid(c * lx, c * ly, c * lz, indexing="ij")
    cx, cy, cz = lx / 2, ly / 2, lz / 2
    if micro_type == MIC_HOMOGENEOUS:
        return np.zeros((n, n, n), bool)
    if micro_type == MIC_SPHERE:
        r = w * min(lx, ly, lz) / 2
        return (X - cx) ** 2 + (Y - cy) ** 2 + (Z - cz) ** 2 < r * r
    if micro_type == MIC_LAYER_Y:
        return Y < w * ly
    if micro_type == MIC_CILI_FIB_Z:
        r = w * min(lx, ly) / 2
        return (X - cx) ** 2 + (Y - cy) ** 2 < r * r
    if micro_type == MIC_CILI_FIB_XZ:
        r = w * min(lx, ly) / 4
        fib_z = (X - cx) ** 2 + (Y - cy) ** 2 < r * r
        fib_x = (Z - cz) ** 2 + (Y - cy) ** 2 < r * r
        return fib_z | fib_x
    if micro_type in (MIC_QUAD_FIB_XYZ, MIC_QUAD_FIB_XZ,
                      MIC_QUAD_FIB_XZ_BROKEN_X):
        hw = w / 4
        fib_z = (np.abs(X - cx) < hw * lx) & (np.abs(Y - cy) < hw * ly)
        fib_x = (np.abs(Z - cz) < hw * lz) & (np.abs(Y - cy) < hw * ly)
        fib_y = (np.abs(X - cx) < hw * lx) & (np.abs(Z - cz) < hw * lz)
        if micro_type == MIC_QUAD_FIB_XYZ:
            return fib_z | fib_x | fib_y
        if micro_type == MIC_QUAD_FIB_XZ:
            return fib_z | fib_x
        # broken-x: x-fiber interrupted in the middle third
        broken = fib_x & ~(np.abs(X - cx) < lx / 6)
        return fib_z | broken
    raise ValueError(f"unknown micro_type {micro_type}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MicroState:
    eps_p: jax.Array  # (..., n,n,n,8,6)
    alpha: jax.Array  # (..., n,n,n,8)
    u: jax.Array      # (..., n+1,n+1,n+1,3)


class MicroFEEngine:
    def __init__(
        self,
        n: int,
        micro_type: int,
        mat1: MaterialParams,
        mat2: MaterialParams,
        params: Tuple[float, ...] = (1.0, 1.0, 1.0, 0.5),
        dtype=jnp.float32,
        newton_its: int = 3,
        cg_rtol: float = 1.0e-8,
        cg_maxits: int = 300,
        fd_rel: float = 1.0e-5,
    ):
        self.n = n
        self.micro_type = micro_type
        self.mat1, self.mat2 = mat1, mat2
        self.params = tuple(params)
        self.dtype = dtype
        self.newton_its = newton_its
        self.cg_rtol = cg_rtol
        self.cg_maxits = cg_maxits
        self.fd_rel = fd_rel

        lx, ly, lz = self.params[0], self.params[1], self.params[2]
        self.spacing = (lx / n, ly / n, lz / n)
        self.volume = lx * ly * lz
        self.wg = self.spacing[0] * self.spacing[1] * self.spacing[2] / 8.0
        self.mshape = (n + 1, n + 1, n + 1)  # micro node grid
        self.B = jnp.asarray(b_matrix(self.spacing), dtype=dtype)

        m2 = material2_mask(n, micro_type, self.params)[..., None]  # +gp axis
        self.is_homog = micro_type == MIC_HOMOGENEOUS or not m2.any()

        def field(a, b):
            return jnp.asarray(np.where(m2, b, a), dtype=dtype)

        self.lam = field(mat1.lam, mat2.lam)    # (n,n,n,1)
        self.mu = field(mat1.mu, mat2.mu)
        self.Sy = field(mat1.Sy, mat2.Sy)
        self.Ka = field(mat1.Ka, mat2.Ka)

        # boundary node mask of the RVE (linear-displacement BC)
        bnd = np.zeros(self.mshape + (3,), bool)
        bnd[0], bnd[-1] = True, True
        bnd[:, 0], bnd[:, -1] = True, True
        bnd[:, :, 0], bnd[:, :, -1] = True, True
        self.bnd_mask = jnp.asarray(bnd)
        # node coordinates for the affine BC values
        g = [np.arange(n + 1) * h for h in self.spacing]
        X, Y, Z = np.meshgrid(*g, indexing="ij")
        self.coords = jnp.asarray(
            np.stack([X, Y, Z], axis=-1), dtype=dtype
        )  # (m,m,m,3)

    def __hash__(self):
        return hash(
            (self.n, self.micro_type, self.mat1, self.mat2, self.params,
             str(self.dtype), self.newton_its, self.cg_rtol, self.cg_maxits)
        )

    def __eq__(self, other):
        return isinstance(other, MicroFEEngine) and hash(self) == hash(other)

    # ------------------------------------------------------------------ #
    def init_state(self, batch_shape: Tuple[int, ...]) -> MicroState:
        n, m = self.n, self.n + 1
        return MicroState(
            eps_p=jnp.zeros(batch_shape + (n, n, n, 8, 6), self.dtype),
            alpha=jnp.zeros(batch_shape + (n, n, n, 8), self.dtype),
            u=jnp.zeros(batch_shape + (m, m, m, 3), self.dtype),
        )

    # ------------------------------------------------------------------ #
    def _affine_u(self, eps6):
        """Linear-displacement field u_i = eps_ij x_j from Voigt engineering
        strain (off-diagonal tensor strain = gamma/2)."""
        e = eps6
        E = jnp.stack(
            [
                jnp.stack([e[0], e[3] / 2, e[4] / 2]),
                jnp.stack([e[3] / 2, e[1], e[5] / 2]),
                jnp.stack([e[4] / 2, e[5] / 2, e[2]]),
            ]
        )
        return jnp.einsum("ij,xyzj->xyzi", E, self.coords)

    def _micro_solve(self, eps6, eps_p, alpha, u0):
        """Solve one RVE to equilibrium at macro strain eps6 from committed
        internal vars (NOT mutated).  Returns (sigma_hom (6,), new internal
        vars, u, diagnostics)."""
        u_aff = self._affine_u(eps6)
        u = jnp.where(self.bnd_mask, u_aff, u0)

        def lin(u):
            eps_gp = compute_strains(u, self.B)
            return j2_radial_return(
                eps_gp, eps_p, alpha, self.lam, self.mu, self.Sy, self.Ka
            )

        def newton_body(_, carry):
            u, cg_its = carry
            stress, ctan, *_ = lin(u)
            f = assemble_residual(stress, self.B, self.wg, self.mshape)
            b = -jnp.where(self.bnd_mask, 0.0, f)
            A27 = assemble_stencil(ctan, self.B, self.wg, self.mshape)
            # symmetric Dirichlet elimination on the boundary
            from macroc_tpu.bc import BCData, apply_bc_stencil

            A27 = apply_bc_stencil(
                A27,
                BCData(mask=self.bnd_mask, val_unit=jnp.zeros_like(u)),
            )
            res = cg_solve(
                partial(stencil_matvec, A27),
                b,
                jacobi_precond(A27),
                rtol=self.cg_rtol,
                maxits=self.cg_maxits,
            )
            return (u + res.x, cg_its + res.its)

        u, cg_its = jax.lax.fori_loop(
            0, self.newton_its, newton_body, (u, jnp.int32(0))
        )

        stress, ctan, eps_p_new, alpha_new, f_trial, plastic = lin(u)
        sigma_hom = jnp.sum(stress * self.wg, axis=(0, 1, 2, 3)) / self.volume
        return (
            sigma_hom,
            eps_p_new,
            alpha_new,
            u,
            jnp.any(plastic),
            jnp.max(f_trial),
            cg_its,
        )

    # ------------------------------------------------------------------ #
    def homogenize(self, eps: jax.Array, state: MicroState) -> HomogenizeResult:
        """Batched homogenize: the central solve AND the 12 finite-difference
        perturbation solves (FD tangent columns) of every macro GP are folded
        into ONE vmap batch of `_micro_solve` — a single traced program, with
        all (n_gps * 13) RVE solves running concurrently on the chip.  Each
        perturbed solve starts from the SAME committed internal vars
        (homogenize never mutates state; see base.py)."""
        batch = eps.shape[:-1]
        flat = int(np.prod(batch)) if batch else 1
        eps_f = eps.reshape((flat, 6))
        eps_p_f = state.eps_p.reshape((flat,) + state.eps_p.shape[len(batch):])
        alpha_f = state.alpha.reshape((flat,) + state.alpha.shape[len(batch):])
        u_f = state.u.reshape((flat,) + state.u.shape[len(batch):])

        # strain variants per GP: [center, +h e_j, -h e_j for j in 0..5]
        h = jnp.asarray(self.fd_rel, self.dtype) * jnp.maximum(
            jnp.max(jnp.abs(eps_f), axis=-1), jnp.asarray(1e-8, self.dtype)
        )  # (flat,)
        eye = jnp.eye(6, dtype=self.dtype)
        deltas = jnp.concatenate(
            [jnp.zeros((1, 6), self.dtype), eye, -eye], axis=0
        )  # (13, 6)
        eps_all = eps_f[:, None, :] + h[:, None, None] * deltas[None]

        nv = deltas.shape[0]

        def tile(a):
            return jnp.broadcast_to(
                a[:, None], (flat, nv) + a.shape[1:]
            ).reshape((flat * nv,) + a.shape[1:])

        sigma, eps_p_n, alpha_n, u_n, nl, f_tr, cg_its = jax.vmap(
            self._micro_solve
        )(
            eps_all.reshape(flat * nv, 6),
            tile(eps_p_f),
            tile(alpha_f),
            tile(u_f),
        )

        sigma_all = sigma.reshape(flat, nv, 6)
        sigma_c = sigma_all[:, 0]
        ctan = (sigma_all[:, 1:7] - sigma_all[:, 7:13]) / (
            2.0 * h[:, None, None]
        )
        ctan = jnp.swapaxes(ctan, 1, 2)  # (flat, 6 stress, 6 strain)

        def center(a):
            return a.reshape((flat, nv) + a.shape[1:])[:, 0]

        def unflat(a):
            return a.reshape(batch + a.shape[1:])

        return HomogenizeResult(
            stress=unflat(sigma_c),
            ctan=unflat(ctan),
            trial_state=MicroState(
                eps_p=unflat(center(eps_p_n)),
                alpha=unflat(center(alpha_n)),
                u=unflat(center(u_n)),
            ),
            non_linear=unflat(center(nl)),
            f_trial=unflat(center(f_tr)),
            cost=unflat(center(cg_its).astype(self.dtype)),
        )
