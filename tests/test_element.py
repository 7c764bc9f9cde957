"""Element-table oracles: B matrix against finite-difference shape functions,
partition of unity, constant-strain (patch) reproduction.

The oracle here is independent math — shape functions differentiated
numerically — not a transcription of the reference's calc_B, so agreement
validates both.
"""

import numpy as np
import pytest

from macroc_tpu.fem.element import (
    CONSTXG,
    DIM,
    NGP,
    NODE_OFFSETS,
    NODE_SIGNS,
    NPE,
    NVOI,
    b_matrix,
    gauss_points,
    shape_derivatives,
)


def shape_fn(n, xi):
    """Trilinear shape function of node n at natural coords xi."""
    s = NODE_SIGNS[n]
    return np.prod([(1.0 + s[d] * xi[d]) / 2.0 for d in range(3)]) / 1.0


def fd_dsh(spacing=(1.0, 1.0, 1.0), h=1e-6):
    """Finite-difference d N_n / d x_d at every Gauss point."""
    xg = gauss_points()
    out = np.zeros((NGP, NPE, DIM))
    for gp in range(NGP):
        for n in range(NPE):
            for d in range(DIM):
                xp = xg[gp].copy()
                xm = xg[gp].copy()
                xp[d] += h
                xm[d] -= h
                dN_dxi = (shape_fn(n, xp) - shape_fn(n, xm)) / (2 * h)
                out[gp, n, d] = dN_dxi * 2.0 / spacing[d]
    return out


def test_gauss_points_table():
    xg = gauss_points()
    assert np.allclose(np.abs(xg), CONSTXG)
    # sign layout matches the corner ordering
    assert np.array_equal(np.sign(xg).astype(int), NODE_SIGNS)


def test_partition_of_unity():
    dsh = shape_derivatives((1.0, 1.0, 1.0))
    assert np.allclose(dsh.sum(axis=1), 0.0, atol=1e-14)


@pytest.mark.parametrize("spacing", [(1.0, 1.0, 1.0), (1.282, 0.5, 2.0)])
def test_dsh_vs_finite_difference(spacing):
    dsh = shape_derivatives(spacing)
    ref = fd_dsh(spacing)
    assert np.allclose(dsh, ref, atol=1e-8)


def test_b_layout():
    B = b_matrix((1.0, 1.0, 1.0))
    dsh = shape_derivatives((1.0, 1.0, 1.0))
    assert B.shape == (NGP, NVOI, NPE, DIM)
    # row 3 is gamma_xy = du_x/dy + du_y/dx
    assert np.allclose(B[:, 3, :, 0], dsh[:, :, 1])
    assert np.allclose(B[:, 3, :, 1], dsh[:, :, 0])
    # row 4 is gamma_xz, row 5 is gamma_yz (assembly.c:244-253 layout)
    assert np.allclose(B[:, 4, :, 0], dsh[:, :, 2])
    assert np.allclose(B[:, 4, :, 2], dsh[:, :, 0])
    assert np.allclose(B[:, 5, :, 1], dsh[:, :, 2])
    assert np.allclose(B[:, 5, :, 2], dsh[:, :, 1])


@pytest.mark.parametrize("spacing", [(1.0, 1.0, 1.0), (0.75, 1.5, 2.25)])
def test_constant_strain_patch(spacing):
    """u = grad * x (symmetric grad) must give exact Voigt strain at every GP."""
    rng = np.random.default_rng(0)
    G = rng.normal(size=(3, 3))
    G = (G + G.T) / 2.0
    # node coordinates of one element
    coords = NODE_OFFSETS.astype(float) * np.asarray(spacing)
    u = coords @ G.T  # (8, 3)
    B = b_matrix(spacing)
    eps = np.einsum("gvnd,nd->gv", B, u)
    expect = np.array(
        [G[0, 0], G[1, 1], G[2, 2], 2 * G[0, 1], 2 * G[0, 2], 2 * G[1, 2]]
    )
    assert np.allclose(eps, np.broadcast_to(expect, (NGP, NVOI)), atol=1e-12)


def test_rigid_body_zero_strain():
    spacing = (1.3, 0.7, 1.1)
    coords = NODE_OFFSETS.astype(float) * np.asarray(spacing)
    # translation + infinitesimal rotation
    W = np.array([[0, 0.3, -0.1], [-0.3, 0, 0.2], [0.1, -0.2, 0]])
    u = coords @ W.T + np.array([1.0, -2.0, 0.5])
    B = b_matrix(spacing)
    eps = np.einsum("gvnd,nd->gv", B, u)
    assert np.allclose(eps, 0.0, atol=1e-12)
