"""Independent C-faithful numpy oracle (VERDICT r3 missing #3).

A direct, loop-for-loop re-expression of the reference's serial-rank
numerics — calc_B's explicit derivative table including the unit-element
quirk (assembly.c:195-254), set_strains / assembly_res / assembly_jac's
per-element loops (assembly.c:25-176), the BC surface-order value
application (bcs.c:61-146) with MatZeroRowsColumns elimination
(bcs.c:341-347), and both force integrals (forces.c:58-166) — written in
plain numpy with the reference's own index conventions (element id
e = ex + ey*nex + ez*nex*ney, node id = i + j*nx + k*nx*ny, gpi = e*8+gp).

NOTHING here is shared with the framework: no fem/, bc/, forces/ imports
feed the oracle.  The tests then verify the framework's vectorized kernels
against it on the CTest grids (3^3 and 5x2x2, tests/CMakeLists.txt:21-32)
to ~1e-12 — closing the gap that both implementations could share one
translation error of the C.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CONSTXG = 0.577350269189626
XG = np.array(
    [
        [-CONSTXG, -CONSTXG, -CONSTXG],
        [+CONSTXG, -CONSTXG, -CONSTXG],
        [+CONSTXG, +CONSTXG, -CONSTXG],
        [-CONSTXG, +CONSTXG, -CONSTXG],
        [-CONSTXG, -CONSTXG, +CONSTXG],
        [+CONSTXG, -CONSTXG, +CONSTXG],
        [+CONSTXG, +CONSTXG, +CONSTXG],
        [-CONSTXG, +CONSTXG, +CONSTXG],
    ]
)  # macroc.h:61-69


def calc_B_ref(gp):
    """Transliteration of calc_B (assembly.c:195-254): the dsh table is
    written out term by term, INCLUDING the dx=dy=dz=1 shadowing quirk."""
    dx = dy = dz = 1.0  # assembly.c:198 — shadows the real spacings
    x0, x1, x2 = XG[gp]
    dsh = np.array(
        [
            [-(1 - x1) * (1 - x2) / 8 * 2 / dx,
             -(1 - x0) * (1 - x2) / 8 * 2 / dy,
             -(1 - x0) * (1 - x1) / 8 * 2 / dz],
            [+(1 - x1) * (1 - x2) / 8 * 2 / dx,
             -(1 + x0) * (1 - x2) / 8 * 2 / dy,
             -(1 + x0) * (1 - x1) / 8 * 2 / dz],
            [+(1 + x1) * (1 - x2) / 8 * 2 / dx,
             +(1 + x0) * (1 - x2) / 8 * 2 / dy,
             -(1 + x0) * (1 + x1) / 8 * 2 / dz],
            [-(1 + x1) * (1 - x2) / 8 * 2 / dx,
             +(1 - x0) * (1 - x2) / 8 * 2 / dy,
             -(1 - x0) * (1 + x1) / 8 * 2 / dz],
            [-(1 - x1) * (1 + x2) / 8 * 2 / dx,
             -(1 - x0) * (1 + x2) / 8 * 2 / dy,
             +(1 - x0) * (1 - x1) / 8 * 2 / dz],
            [+(1 - x1) * (1 + x2) / 8 * 2 / dx,
             -(1 + x0) * (1 + x2) / 8 * 2 / dy,
             +(1 + x0) * (1 - x1) / 8 * 2 / dz],
            [+(1 + x1) * (1 + x2) / 8 * 2 / dx,
             +(1 + x0) * (1 + x2) / 8 * 2 / dy,
             +(1 + x0) * (1 + x1) / 8 * 2 / dz],
            [-(1 + x1) * (1 + x2) / 8 * 2 / dx,
             +(1 - x0) * (1 + x2) / 8 * 2 / dy,
             +(1 - x0) * (1 + x1) / 8 * 2 / dz],
        ]
    )
    B = np.zeros((6, 24))
    for i in range(8):
        B[0, i * 3 + 0] = dsh[i, 0]
        B[1, i * 3 + 1] = dsh[i, 1]
        B[2, i * 3 + 2] = dsh[i, 2]
        B[3, i * 3 + 0] = dsh[i, 1]
        B[3, i * 3 + 1] = dsh[i, 0]
        B[4, i * 3 + 0] = dsh[i, 2]
        B[4, i * 3 + 2] = dsh[i, 0]
        B[5, i * 3 + 1] = dsh[i, 2]
        B[5, i * 3 + 2] = dsh[i, 1]
    return B


class SerialOracle:
    """The reference program's serial-rank state: one rank owns the whole
    grid, so owned == ghost extents (init.c:167-171) and every BC surface
    condition holds."""

    def __init__(self, NX, NY, NZ, lx, ly, lz, bc_type, rad=1.0):
        self.NX, self.NY, self.NZ = NX, NY, NZ
        self.lx, self.ly, self.lz = lx, ly, lz
        self.dx = lx / (NX - 1)
        self.dy = ly / (NY - 1)
        self.dz = lz / (NZ - 1)
        self.wg = self.dx * self.dy * self.dz / 8.0  # init.c:140
        self.bc_type = bc_type
        self.rad = rad
        self.nex, self.ney, self.nez = NX - 1, NY - 1, NZ - 1
        self.nelem = self.nex * self.ney * self.nez
        self.ndof = NX * NY * NZ * 3
        self.Bgp = [calc_B_ref(gp) for gp in range(8)]
        # DMDAGetElements connectivity: element e -> 8 node ids, z-layer
        # pairs of the standard Q1 cycle (test_dm_1.c characterization)
        self.eix = np.zeros((self.nelem, 8), dtype=np.int64)
        nid = lambda i, j, k: i + j * NX + k * NX * NY
        for ez in range(self.nez):
            for ey in range(self.ney):
                for ex in range(self.nex):
                    e = ex + ey * self.nex + ez * self.nex * self.ney
                    self.eix[e] = [
                        nid(ex, ey, ez), nid(ex + 1, ey, ez),
                        nid(ex + 1, ey + 1, ez), nid(ex, ey + 1, ez),
                        nid(ex, ey, ez + 1), nid(ex + 1, ey, ez + 1),
                        nid(ex + 1, ey + 1, ez + 1), nid(ex, ey + 1, ez + 1),
                    ]

    # --- BCs (serial rank: ghost box == global box) -------------------- #
    def bc_dofs_and_vals(self, U):
        """(dof indices, values) in the reference's surface construction
        order (bcs.c:61-146 mirrors bcs.c:198-333)."""
        NX, NY, NZ = self.NX, self.NY, self.NZ
        nid = lambda i, j, k: i + j * NX + k * NX * NY
        idx, val = [], []
        if self.bc_type == 0:  # bending
            for k in range(NZ):           # Surface X = 0
                for j in range(NY):
                    for d in range(3):
                        idx.append(nid(0, j, k) * 3 + d)
                        val.append(0.0)
            for k in range(NZ):           # Surface X = LX
                for j in range(NY):
                    for d in range(3):
                        idx.append(nid(NX - 1, j, k) * 3 + d)
                        val.append(U if d == 1 else 0.0)
        else:  # circle
            for k in range(NZ):           # X=0 & Y=0 along Z
                for d in range(3):
                    idx.append(nid(0, 0, k) * 3 + d)
                    val.append(0.0)
            for k in range(NZ):           # X=LX & Y=0 along Z
                for d in range(3):
                    idx.append(nid(NX - 1, 0, k) * 3 + d)
                    val.append(0.0)
            for i in range(1, NX - 1):    # Z=0 & Y=0 along X
                for d in range(3):
                    idx.append(nid(i, 0, 0) * 3 + d)
                    val.append(0.0)
            for i in range(1, NX - 1):    # Z=LZ & Y=0 along X
                for d in range(3):
                    idx.append(nid(i, 0, NZ - 1) * 3 + d)
                    val.append(0.0)
            for i in range(NX):           # Y=LY inside circle (d=1 only)
                for k in range(NZ):
                    x = self.lx / 2.0 - (i * self.dx + self.dx / 2.0)
                    z = self.lz / 2.0 - (k * self.dz + self.dz / 2.0)
                    if x * x + z * z < self.rad * self.rad:
                        idx.append(nid(i, NY - 1, k) * 3 + 1)
                        val.append(U)
        return np.array(idx, dtype=np.int64), np.array(val)

    def apply_bc_on_u(self, U, u_flat):
        u = u_flat.copy()
        idx, val = self.bc_dofs_and_vals(U)
        u[idx] = val  # VecSetValues INSERT (bcs.c:85,140)
        return u

    # --- kernels ------------------------------------------------------- #
    def set_strains(self, u_flat):
        """strain[gpi, 6] for gpi = e*NGP + gp (assembly.c:25-66)."""
        out = np.zeros((self.nelem * 8, 6))
        for e in range(self.nelem):
            u_e = np.zeros(24)
            for n in range(8):
                for d in range(3):
                    u_e[n * 3 + d] = u_flat[self.eix[e, n] * 3 + d]
            for gp in range(8):
                out[e * 8 + gp] = self.Bgp[gp] @ u_e
        return out

    def assembly_res(self, stress_gpi):
        """b = -(sum_e B^T sigma wg scattered, Dirichlet zeroed)
        (assembly.c:120-176)."""
        b = np.zeros(self.ndof)
        for e in range(self.nelem):
            be = np.zeros(24)
            for gp in range(8):
                be += self.Bgp[gp].T @ stress_gpi[e * 8 + gp] * self.wg
            for n in range(8):
                for d in range(3):
                    b[self.eix[e, n] * 3 + d] += be[n * 3 + d]
        idx, _ = self.bc_dofs_and_vals(0.0)
        b[idx] = 0.0  # apply_bc_on_res (bcs.c:350-362)
        return -b

    def assembly_jac(self, ctan_gpi):
        """Dense A with MatZeroRowsColumns(…, 1.0) (assembly.c:69-117,
        bcs.c:341-347)."""
        A = np.zeros((self.ndof, self.ndof))
        for e in range(self.nelem):
            Ae = np.zeros((24, 24))
            for gp in range(8):
                B = self.Bgp[gp]
                C = ctan_gpi[e * 8 + gp]
                Ae += B.T @ C @ B * self.wg
            ix = np.array(
                [self.eix[e, n] * 3 + d for n in range(8) for d in range(3)]
            )
            A[np.ix_(ix, ix)] += Ae
        idx, _ = self.bc_dofs_and_vals(0.0)
        A[idx, :] = 0.0
        A[:, idx] = 0.0
        A[idx, idx] = 1.0
        return A

    def calc_force(self, stress_gpi):
        """forces.c:58-166 (serial: ghost corners = 0)."""
        f = 0.0
        if self.bc_type == 0:  # bending: last x element layer, sigma_xy
            for ey in range(self.ney):
                for ez in range(self.nez):
                    e = (self.nex - 1) + ey * self.nex + ez * self.nex * self.ney
                    s = sum(stress_gpi[e * 8 + gp][3] for gp in range(8))
                    f += s * self.dy * self.dz
        else:  # circle: last y element layer inside circle, sigma_yy
            for ex in range(self.nex):
                for ez in range(self.nez):
                    x = self.lx / 2.0 - (ex * self.dx + self.dx / 2.0)
                    z = self.lz / 2.0 - (ez * self.dz + self.dz / 2.0)
                    if x * x + z * z < self.rad * self.rad:
                        e = ex + (self.ney - 1) * self.nex \
                            + ez * self.nex * self.ney
                        s = sum(stress_gpi[e * 8 + gp][1] for gp in range(8))
                        f += s * self.dx * self.dz
        return f


# ---------------------------------------------------------------------- #
# framework <-> oracle layout adapters
def to_flat_nodes(a):
    """(nx,ny,nz,3) -> flat dof vector in node id = i + j*nx + k*nx*ny
    order."""
    return np.transpose(np.asarray(a), (2, 1, 0, 3)).reshape(-1)


def to_gpi(a):
    """(nex,ney,nez,8,...) -> (nelem*8, ...) with e = ex + ey*nex +
    ez*nex*ney, gpi = e*8+gp."""
    a = np.asarray(a)
    return np.transpose(a, (2, 1, 0) + tuple(range(3, a.ndim))).reshape(
        (-1,) + a.shape[4:]
    )


GRIDS = [
    dict(nx=3, ny=3, nz=3, lx=10.0, ly=10.0, lz=10.0),   # CTest small_1
    dict(nx=5, ny=2, nz=2, lx=10.0, ly=1.0, lz=1.0),     # CTest small_3
]
BCS = [0, 1]


def _problem(g, bc_type):
    from macroc_tpu.config import MacroConfig
    from macroc_tpu.problem import MacroProblem

    cfg = MacroConfig(
        **g, bc_type=bc_type, rad=3.0, dtype="float64", constitutive="j2"
    )
    return MacroProblem(cfg, n_devices=1), SerialOracle(
        g["nx"], g["ny"], g["nz"], g["lx"], g["ly"], g["lz"], bc_type,
        rad=3.0,
    )


@pytest.mark.parametrize("g", GRIDS, ids=["3x3x3", "5x2x2"])
@pytest.mark.parametrize("bc_type", BCS, ids=["bending", "circle"])
def test_bc_application_matches_c(g, bc_type):
    from macroc_tpu import bc as bc_mod

    p, oracle = _problem(g, bc_type)
    rng = np.random.default_rng(1)
    u0 = rng.normal(size=(g["nx"], g["ny"], g["nz"], 3))
    U = -0.37
    got = bc_mod.apply_bc_on_u(U, jnp.asarray(u0), p.bc)
    want = oracle.apply_bc_on_u(U, to_flat_nodes(u0))
    np.testing.assert_allclose(to_flat_nodes(got), want, atol=1e-14)


@pytest.mark.parametrize("g", GRIDS, ids=["3x3x3", "5x2x2"])
def test_strains_match_c(g):
    from macroc_tpu.fem.kernels import compute_strains

    p, oracle = _problem(g, 0)
    rng = np.random.default_rng(2)
    u = rng.normal(size=(g["nx"], g["ny"], g["nz"], 3))
    eps = compute_strains(jnp.asarray(u), p.B)
    np.testing.assert_allclose(
        to_gpi(eps), oracle.set_strains(to_flat_nodes(u)),
        rtol=1e-12, atol=1e-13,
    )


@pytest.mark.parametrize("g", GRIDS, ids=["3x3x3", "5x2x2"])
@pytest.mark.parametrize("bc_type", BCS, ids=["bending", "circle"])
def test_residual_matches_c(g, bc_type):
    from macroc_tpu import bc as bc_mod
    from macroc_tpu.fem.kernels import assemble_residual

    p, oracle = _problem(g, bc_type)
    ne = (g["nx"] - 1, g["ny"] - 1, g["nz"] - 1)
    rng = np.random.default_rng(3)
    stress = rng.normal(size=ne + (8, 6))
    f = assemble_residual(
        jnp.asarray(stress), p.B, p.grid.wg, (g["nx"], g["ny"], g["nz"])
    )
    b = -bc_mod.apply_bc_on_res(f, p.bc)
    want = oracle.assembly_res(to_gpi(stress))
    np.testing.assert_allclose(
        to_flat_nodes(b), want, rtol=1e-12, atol=1e-12
    )


@pytest.mark.parametrize("g", GRIDS, ids=["3x3x3", "5x2x2"])
@pytest.mark.parametrize("bc_type", BCS, ids=["bending", "circle"])
def test_jacobian_matches_c(g, bc_type):
    """Framework stencil operator (assembled + BC-eliminated) vs the
    oracle's dense MatZeroRowsColumns matrix, as operators on random
    vectors."""
    from macroc_tpu import bc as bc_mod
    from macroc_tpu.fem.kernels import assemble_stencil
    from macroc_tpu.ops.stencil import stencil_matvec

    p, oracle = _problem(g, bc_type)
    ne = (g["nx"] - 1, g["ny"] - 1, g["nz"] - 1)
    rng = np.random.default_rng(4)
    c = rng.normal(size=ne + (8, 6, 6))
    ctan = c + np.swapaxes(c, -1, -2)  # symmetric blocks like B^T C B wants
    A27 = bc_mod.apply_bc_stencil(
        assemble_stencil(
            jnp.asarray(ctan), p.B, p.grid.wg, (g["nx"], g["ny"], g["nz"])
        ),
        p.bc,
    )
    A_dense = oracle.assembly_jac(to_gpi(ctan))
    for seed in (5, 6):
        x = np.random.default_rng(seed).normal(
            size=(g["nx"], g["ny"], g["nz"], 3)
        )
        y = stencil_matvec(A27, jnp.asarray(x))
        want = A_dense @ to_flat_nodes(x)
        np.testing.assert_allclose(
            to_flat_nodes(y), want, rtol=1e-11, atol=1e-11
        )


@pytest.mark.parametrize("g", GRIDS, ids=["3x3x3", "5x2x2"])
@pytest.mark.parametrize("bc_type", BCS, ids=["bending", "circle"])
def test_force_matches_c(g, bc_type):
    from macroc_tpu.forces import calc_force

    p, oracle = _problem(g, bc_type)
    ne = (g["nx"] - 1, g["ny"] - 1, g["nz"] - 1)
    rng = np.random.default_rng(7)
    stress = rng.normal(size=ne + (8, 6))
    got = float(calc_force(jnp.asarray(stress), p.grid, p.cfg))
    want = oracle.calc_force(to_gpi(stress))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)
