"""J2 (von Mises) plasticity with linear isotropic hardening — closed form.

Radial-return mapping, fully vectorized over all Gauss points of all
elements (the batch is just array leading dims; no vmap needed).

This engine is *exact* for the reference's default micro configuration:
micro_mat_1 == micro_mat_2 (src/init.c:31-32), so the micro RVE is
homogeneous and MicroPP's micro-FE homogenization with linear-displacement
BCs reproduces the single-material point response identically — which is
this closed form.  MicroPP's material model is plastic type 1 (isotropic
hardening; micropp_C_material_set(.., plastic=1), init.c:196-201).

Internal variables per GP (committed only by update_vars — see base.py):
  eps_p : (..., 6) plastic strain, engineering Voigt
  alpha : (...,)   equivalent plastic strain

Trial state / return map (standard Simo–Hughes):
  sigma_tr = C : (eps - eps_p)
  s_tr     = dev(sigma_tr),   |s_tr| tensor norm
  f_tr     = |s_tr| - sqrt(2/3) (Sy + Ka alpha)
  plastic:  dgamma = f_tr / (2 mu + (2/3) Ka),  n = s_tr/|s_tr|
            sigma  = sigma_tr - 2 mu dgamma n
            eps_p += dgamma * n  (shear entries doubled: engineering)
            alpha += sqrt(2/3) dgamma
Consistent tangent (engineering Voigt):
  theta    = 1 - 2 mu dgamma / |s_tr|
  thetabar = 1/(1 + Ka/(3 mu)) - (1 - theta)
  C_ep = kappa 1x1 + 2 mu theta I_dev - 2 mu thetabar n x n
(The reference's MicroPP obtains the same tangent by numerical perturbation
of the return map; closed form is exact and batch-friendly.)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from macroc_tpu.config import MaterialParams
from macroc_tpu.constitutive.base import HomogenizeResult
from macroc_tpu.constitutive.elastic import elastic_matrix

_SQ23 = float(np.sqrt(2.0 / 3.0))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class J2State:
    eps_p: jax.Array  # (..., 6)
    alpha: jax.Array  # (...,)


def j2_radial_return(eps, eps_p, alpha, lam, mu, Sy, Ka):
    """Functional radial-return map with array-valued material parameters
    (broadcast against the batch) — shared by J2Engine (scalar material) and
    the micro-FE engine (per-micro-element materials).

    Returns (stress, ctan, eps_p_new, alpha_new, f_trial, plastic); all
    outputs batched like eps (..., 6).
    """
    dtype = eps.dtype
    batch = jnp.broadcast_shapes(
        eps[..., 0].shape, jnp.shape(lam), jnp.shape(mu),
        jnp.shape(Sy), jnp.shape(Ka),
    )
    lam = jnp.broadcast_to(jnp.asarray(lam, dtype), batch)
    mu = jnp.broadcast_to(jnp.asarray(mu, dtype), batch)
    Sy = jnp.broadcast_to(jnp.asarray(Sy, dtype), batch)
    Ka = jnp.broadcast_to(jnp.asarray(Ka, dtype), batch)
    kappa = lam + 2.0 * mu / 3.0

    e = eps - eps_p
    tr = e[..., 0] + e[..., 1] + e[..., 2]
    # sigma = lam tr(e) I + 2 mu e  (engineering shears: sigma_shear = mu*gamma)
    sig_tr = jnp.concatenate(
        [
            (lam * tr)[..., None] + 2.0 * mu[..., None] * e[..., :3],
            mu[..., None] * e[..., 3:],
        ],
        axis=-1,
    )

    p = (sig_tr[..., 0] + sig_tr[..., 1] + sig_tr[..., 2]) / 3.0
    s = sig_tr.at[..., :3].add(-p[..., None])
    snorm = jnp.sqrt(
        jnp.sum(s[..., :3] ** 2, axis=-1)
        + 2.0 * jnp.sum(s[..., 3:] ** 2, axis=-1)
    )
    f_trial = snorm - _SQ23 * (Sy + Ka * alpha)
    plastic = f_trial > 0.0

    dgamma = jnp.where(plastic, f_trial / (2.0 * mu + (2.0 / 3.0) * Ka), 0.0)
    safe = jnp.maximum(snorm, jnp.asarray(1e-30, dtype))
    n = s / safe[..., None]

    stress = sig_tr - (2.0 * mu * dgamma)[..., None] * n

    dn = n.at[..., 3:].multiply(2.0)
    eps_p_new = jnp.where(
        plastic[..., None], eps_p + dgamma[..., None] * dn, eps_p
    )
    alpha_new = jnp.where(plastic, alpha + _SQ23 * dgamma, alpha)

    theta = 1.0 - 2.0 * mu * dgamma / safe
    thetabar = 1.0 / (1.0 + Ka / (3.0 * mu)) - (1.0 - theta)

    ones33 = jnp.zeros((6, 6), dtype).at[:3, :3].set(1.0)
    i_dev = (
        jnp.diag(jnp.asarray([1, 1, 1, 0.5, 0.5, 0.5], dtype)) - ones33 / 3.0
    )
    nn = n[..., :, None] * n[..., None, :]
    kap = kappa[..., None, None]
    mu2 = (2.0 * mu)[..., None, None]
    C_el = kap * ones33 + mu2 * i_dev
    C_ep = (
        kap * ones33
        + mu2 * theta[..., None, None] * i_dev
        - mu2 * thetabar[..., None, None] * nn
    )
    ctan = jnp.where(plastic[..., None, None], C_ep, C_el)
    return stress, ctan, eps_p_new, alpha_new, f_trial, plastic


class J2Engine:
    def __init__(self, mat: MaterialParams, dtype=jnp.float32):
        self.mat = mat
        self.dtype = dtype
        self._C = jnp.asarray(elastic_matrix(mat), dtype=dtype)

    def __hash__(self):
        return hash((self.mat, str(self.dtype)))

    def __eq__(self, other):
        return (
            isinstance(other, J2Engine)
            and self.mat == other.mat
            and self.dtype == other.dtype
        )

    def init_state(self, batch_shape: Tuple[int, ...]) -> J2State:
        return J2State(
            eps_p=jnp.zeros(batch_shape + (6,), dtype=self.dtype),
            alpha=jnp.zeros(batch_shape, dtype=self.dtype),
        )

    def homogenize(self, eps, state: J2State) -> HomogenizeResult:
        mat = self.mat
        mu = jnp.asarray(mat.mu, self.dtype)
        lam = jnp.asarray(mat.lam, self.dtype)
        Ka = jnp.asarray(mat.Ka, self.dtype)
        Sy = jnp.asarray(mat.Sy, self.dtype)
        kappa = lam + 2.0 * mu / 3.0

        e = eps - state.eps_p
        sig_tr = jnp.einsum("vw,...w->...v", self._C, e)

        p = (sig_tr[..., 0] + sig_tr[..., 1] + sig_tr[..., 2]) / 3.0
        s = sig_tr.at[..., :3].add(-p[..., None])
        snorm = jnp.sqrt(
            jnp.sum(s[..., :3] ** 2, axis=-1)
            + 2.0 * jnp.sum(s[..., 3:] ** 2, axis=-1)
        )
        f_trial = snorm - _SQ23 * (Sy + Ka * state.alpha)
        plastic = f_trial > 0.0

        dgamma = jnp.where(plastic, f_trial / (2.0 * mu + (2.0 / 3.0) * Ka), 0.0)
        safe = jnp.maximum(snorm, jnp.asarray(1e-30, self.dtype))
        n = s / safe[..., None]

        stress = sig_tr - (2.0 * mu * dgamma)[..., None] * n

        # engineering plastic-strain increment: shear entries doubled
        dn = n.at[..., 3:].multiply(2.0)
        eps_p_new = state.eps_p + dgamma[..., None] * dn
        alpha_new = state.alpha + _SQ23 * dgamma

        # consistent tangent
        theta = 1.0 - 2.0 * mu * dgamma / safe
        thetabar = 1.0 / (1.0 + Ka / (3.0 * mu)) - (1.0 - theta)

        ones33 = jnp.zeros((6, 6), self.dtype).at[:3, :3].set(1.0)
        i_dev = (
            jnp.diag(jnp.asarray([1, 1, 1, 0.5, 0.5, 0.5], self.dtype))
            - ones33 / 3.0
        )
        nn = n[..., :, None] * n[..., None, :]
        C_ep = (
            kappa * ones33
            + (2.0 * mu) * theta[..., None, None] * i_dev
            - (2.0 * mu) * thetabar[..., None, None] * nn
        )
        batch = eps.shape[:-1]
        C_el = jnp.broadcast_to(self._C, batch + (6, 6))
        ctan = jnp.where(plastic[..., None, None], C_ep, C_el)

        trial = J2State(
            eps_p=jnp.where(plastic[..., None], eps_p_new, state.eps_p),
            alpha=jnp.where(plastic, alpha_new, state.alpha),
        )
        cost = 1.0 + plastic.astype(self.dtype)
        return HomogenizeResult(
            stress=stress,
            ctan=ctan,
            trial_state=trial,
            non_linear=plastic,
            f_trial=f_trial,
            cost=cost,
        )
