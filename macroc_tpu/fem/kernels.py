"""Batched element kernels on global node-centric arrays.

The reference iterates rank-local elements one by one, pushing strains into
MicroPP and pulling stresses/tangents back (src/assembly.c:25-176).  Here the
whole element loop is a handful of einsums over dense arrays:

  - displacement field  u : (nx, ny, nz, 3)          node-centric
  - per-GP strain     eps : (nex, ney, nez, 8, 6)    element-centric
  - per-GP stress     sig : (nex, ney, nez, 8, 6)
  - per-GP tangent     C  : (nex, ney, nez, 8, 6, 6)
  - global residual    f  : (nx, ny, nz, 3)
  - stencil matrix    A27 : (nx, ny, nz, 27, 3, 3)   BSR over the static
                                                     27-point node stencil

Element gather = 8 shifted slices; residual scatter-add = 8 shifted
`.at[].add`s (race-free by construction — no atomics, no coloring needed,
unlike a GPU scatter formulation).  Everything is static-shaped and traced
once under jit; XLA fuses the einsums and, under SPMD sharding, inserts the
halo exchanges that DMGlobalToLocal/DMLocalToGlobal performed in the
reference (assembly.c:40-41, 164-165).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from macroc_tpu.fem.element import DIM, NGP, NODE_OFFSETS, NPE, NVOI

# Stencil offset table: offset index o <-> displacement (di,dj,dk) in
# {-1,0,1}^3, ordered o = (di+1)*9 + (dj+1)*3 + (dk+1).  The self-coupling
# (diagonal) block is offset 13.
STENCIL_OFFSETS = np.array(
    [(di, dj, dk) for di in (-1, 0, 1) for dj in (-1, 0, 1) for dk in (-1, 0, 1)],
    dtype=np.int64,
)
DIAG_OFFSET = 13
N_STENCIL = 27


def offset_index(di: int, dj: int, dk: int) -> int:
    return (di + 1) * 9 + (dj + 1) * 3 + (dk + 1)


def gather_element_dofs(u: jax.Array) -> jax.Array:
    """(nx,ny,nz,3) -> (nex,ney,nez,8,3): nodal dofs of every element.

    Equivalent of the per-element u_e gather at assembly.c:46-48, for all
    elements at once via shifted slices.
    """
    nx, ny, nz = u.shape[:3]
    nex, ney, nez = nx - 1, ny - 1, nz - 1
    parts = [
        u[di:di + nex, dj:dj + ney, dk:dk + nez, :]
        for (di, dj, dk) in NODE_OFFSETS
    ]
    return jnp.stack(parts, axis=3)


def compute_strains(u: jax.Array, B: jax.Array) -> jax.Array:
    """Strain at all Gauss points of all elements: (nex,ney,nez,8,6).

    eps[e, gp, v] = sum_{n,d} B[gp,v,n,d] * u_e[n,d]
    (reference: set_strains, assembly.c:50-59).
    """
    u8 = gather_element_dofs(u)
    return jnp.einsum("gvnd,xyznd->xyzgv", B, u8)


def scatter_add_elements(fe: jax.Array, grid_shape: Tuple[int, int, int]) -> jax.Array:
    """Scatter per-element nodal values (nex,ney,nez,8,3) into the global
    node array (nx,ny,nz,3) by summation.

    Equivalent of the local scatter-add + DMLocalToGlobal ADD_VALUES
    (assembly.c:160-165).  Eight shifted adds; each output slice is written
    by exactly one add per node position, so the op is deterministic and
    race-free.
    """
    nx, ny, nz = grid_shape
    nex, ney, nez = nx - 1, ny - 1, nz - 1
    f = jnp.zeros((nx, ny, nz, fe.shape[-1]), dtype=fe.dtype)
    for n, (di, dj, dk) in enumerate(NODE_OFFSETS):
        f = f.at[di:di + nex, dj:dj + ney, dk:dk + nez, :].add(fe[..., n, :])
    return f


def assemble_residual(
    stress: jax.Array, B: jax.Array, wg: float, grid_shape: Tuple[int, int, int]
) -> jax.Array:
    """Internal-force residual f = sum_e B^T sigma * wg, scattered to nodes.

    Matches assembly_res *before* BC zeroing and negation
    (assembly.c:142-165); the caller applies those (bc module / driver).
    """
    fe = jnp.einsum("gvnd,xyzgv->xyznd", B, stress) * wg
    return scatter_add_elements(fe, grid_shape)


def element_stiffness(ctan: jax.Array, B: jax.Array, wg: float) -> jax.Array:
    """Dense element stiffness Ae: (nex,ney,nez,8,3,8,3).

    Ae[n,d,m,e] = sum_gp sum_vw B[gp,v,n,d] C[gp,v,w] B[gp,w,m,e] * wg
    (reference quadruple loop, assembly.c:94-99).  Only used for testing and
    small problems — the production path assembles the stencil directly.
    """
    return jnp.einsum("gvnd,xyzgvw,gwme->xyzndme", B, ctan, B) * wg


def assemble_diagonal(
    ctan: jax.Array, B: jax.Array, wg: float, grid_shape: Tuple[int, int, int]
) -> jax.Array:
    """Point diagonal of the operator without assembling it (for Jacobi
    preconditioning in matrix-free mode): diag contribution of element node n
    dof d is sum_gp,vw B[gp,v,n,d] C[gp,v,w] B[gp,w,n,d] * wg, scattered."""
    de = jnp.einsum("gvnd,xyzgvw,gwnd->xyznd", B, ctan, B) * wg
    return scatter_add_elements(de, grid_shape)


def matfree_matvec(ctan: jax.Array, B: jax.Array, wg: float,
                   grid_shape: Tuple[int, int, int]):
    """Matrix-free operator action y = (sum_e Be^T C Be) x — the unassembled
    alternative to the stencil path (cross-check + low-memory option)."""

    def mv(x):
        eps = compute_strains(x, B)
        sig = jnp.einsum("xyzgvw,xyzgw->xyzgv", ctan, eps)
        return assemble_residual(sig, B, wg, grid_shape)

    return mv


def assemble_stencil_soa(
    ctan: jax.Array,
    B: jax.Array,
    wg: float,
    grid_shape: Tuple[int, int, int],
    block: int = 16,
) -> jax.Array:
    """Assemble the 27-point block-stencil matrix DIRECTLY in SoA layout
    A_soa (27,3,3,nx,ny,nz) — the form the solver consumes.

    Same math as assemble_stencil, restructured for TPU memory behavior
    (the dominant cost of a 128^3 Newton step; see CLAUDE.md):

      - the pairwise element blocks come from ONE einsum per slab with the
        SPATIAL dims minor (``->ndmexyz``), so no intermediate is ever
        materialized with tiny (6,6)/(3,3) minor dims — XLA pads such
        minors to (8,128) tiles, a ~16x memory blowup that OOMs at 128^3
        (the einsum itself measures ~51 ms at 128^3/v5e);
      - slabs are ROW(x)-aligned and each output slab is built purely from
        pads + adds + stack of einsum slices, then all slabs concatenate
        along x: there is NO read-modify-write `.at[].add` into the global
        A anywhere.  (The earlier 64-slice-scatter formulation spent
        ~280 ms/step in those RMW updates — 85% of its assembly time.)
      - a row-slab [x0, x0+nb) needs element planes [x0-1, x0+nb): the
        once-padded ctan (one zero plane each side in every dim) makes all
        slab/pair slices static and boundary-safe;
      - ``block`` bounds the per-slab pairwise transient (~0.6 GB at 16).
    """
    nx, ny, nz = grid_shape
    # zero element padding: cp[i] = ctan[i-1] per dim (zeros outside), so
    # row r's contributing elements r-1 and r are cp[r] and cp[r+1]
    cp = jnp.pad(ctan, ((1, 1), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
    slabs = []
    for x0 in range(0, nx, block):
        nb = min(block, nx - x0)
        # element planes (padded indexing) covering rows [x0, x0+nb)
        cs = cp[x0:x0 + nb + 1]
        # (a-node, d, b-node, e, x, y, z) pairwise blocks; y/z carry the
        # one-plane zero pad so every row's neighbors exist
        Ae = jnp.einsum("gvnd,xyzgvw,gwme->ndmexyz", B, cs, B) * wg
        parts = [None] * N_STENCIL
        for a in range(NPE):
            oax, oay, oaz = NODE_OFFSETS[a]
            for b in range(NPE):
                ob = NODE_OFFSETS[b]
                o = offset_index(ob[0] - oax, ob[1] - oay, ob[2] - oaz)
                # row x reads element x - oax -> local plane r + 1 - oax;
                # row y reads padded element y - oay + 1 -> slice start
                # 1 - oay of the (ny+1)-long padded element dim
                contrib = Ae[
                    a, :, b, :,
                    1 - oax:1 - oax + nb,
                    1 - oay:1 - oay + ny,
                    1 - oaz:1 - oaz + nz,
                ]
                parts[o] = contrib if parts[o] is None else parts[o] + contrib
        slabs.append(jnp.stack(parts, axis=0))  # (27,3,3,nb,ny,nz)
    return jnp.concatenate(slabs, axis=3)


def assemble_stencil_soa_v2(
    ctan: jax.Array,
    B: jax.Array,
    wg: float,
    grid_shape: Tuple[int, int, int],
) -> jax.Array:
    """Per-offset full-grid assembly in SoA layout (27,3,3,nx,ny,nz).

    Same math as assemble_stencil_soa, but instead of building row slabs
    (pads + 27-part stacks + concatenate — measured ~280 ms of pure data
    movement at 128^3), each stencil offset o accumulates its <= 8
    contributing node pairs as full-grid shifted einsums and the 27 offset
    planes are stacked once.  The einsum contraction work is identical;
    the intermediate traffic drops from 27 slab-parts per block to one
    add-chain per offset."""
    nx, ny, nz = grid_shape
    cp = jnp.pad(ctan, ((1, 1), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
    parts = [None] * N_STENCIL
    for a in range(NPE):
        oax, oay, oaz = NODE_OFFSETS[a]
        Ba = B[:, :, a, :]
        # element plane feeding row r is r - oa -> padded slice 1 - oa
        cs = cp[
            1 - oax:1 - oax + nx,
            1 - oay:1 - oay + ny,
            1 - oaz:1 - oaz + nz,
        ]
        for b in range(NPE):
            ob = NODE_OFFSETS[b]
            o = offset_index(ob[0] - oax, ob[1] - oay, ob[2] - oaz)
            blk = (
                jnp.einsum("gvd,xyzgvw,gwe->dexyz", Ba, cs, B[:, :, b, :])
                * wg
            )
            parts[o] = blk if parts[o] is None else parts[o] + blk
    return jnp.stack(parts, axis=0)


def _assembly_conv_weights(B: np.ndarray, wg: float) -> np.ndarray:
    """Constant conv kernel W (2,2,2, 288, 243) such that the whole stencil
    assembly is ONE 3D convolution over the flattened tangent field:

        A[(o,d,e), x,y,z] = sum_{tap, c} Cf[x-1+tx, ..., c] * W[t, c, (ode)]

    Derivation: the element stiffness is linear in the tangent,
    vec(Ke)[(a,d,b,e)] = sum_{gvw} B[g,v,a,d] B[g,w,b,e] * C[g,v,w] * wg,
    and the pair (a,b) of element E lands at row-node E+off_a, offset
    off_b-off_a — i.e. node x gathers element x-off_a at conv tap
    t = 1-off_a.  Everything except C is constant, so the gather+contract
    collapses into conv weights the MXU executes as dense matmuls."""
    B = np.asarray(B, dtype=np.float64)  # (8,6,8,3)
    W = np.zeros((2, 2, 2, NGP * NVOI * NVOI, N_STENCIL * DIM * DIM))
    for a in range(NPE):
        oa = NODE_OFFSETS[a]
        t = (1 - oa[0], 1 - oa[1], 1 - oa[2])
        for b in range(NPE):
            ob = NODE_OFFSETS[b]
            o = offset_index(ob[0] - oa[0], ob[1] - oa[1], ob[2] - oa[2])
            # M[(d,e), (g,v,w)] = B[g,v,a,d] * B[g,w,b,e] * wg
            M = np.einsum("gvd,gwe->degvw", B[:, :, a, :], B[:, :, b, :])
            W[t[0], t[1], t[2], :, o * 9:(o + 1) * 9] += (
                M.reshape(9, -1).T * wg
            )
    return W


def assemble_stencil_soa_conv(
    ctan: jax.Array,
    B: jax.Array,
    wg: float,
    grid_shape: Tuple[int, int, int],
) -> jax.Array:
    """Stencil assembly as ONE MXU convolution: conv3d(Cf, W) with the
    constant 2x2x2 x 288-in x 243-out kernel of _assembly_conv_weights.

    Single fused op — no slab stacking, no pair-block intermediates: the
    gather (element->node scatter pattern) becomes the conv taps and the
    B^T C B contraction becomes the feature matmul, which is exactly the
    shape the MXU wants (K=288, N=243 per tap)."""
    nx, ny, nz = grid_shape
    Cf = ctan.reshape(ctan.shape[:3] + (-1,))  # (nex,ney,nez,288)
    Cf = jnp.pad(Cf, ((1, 1), (1, 1), (1, 1), (0, 0)))[None]
    W = jnp.asarray(
        _assembly_conv_weights(B, wg), dtype=ctan.dtype
    )
    out = jax.lax.conv_general_dilated(
        Cf,
        W,
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NXYZC", "XYZIO", "CNXYZ"),
    )
    # (243, 1, nx, ny, nz) -> (27, 3, 3, nx, ny, nz)
    return out.reshape(N_STENCIL, DIM, DIM, nx, ny, nz)


def _assembly_pair_matrix(B: np.ndarray, wg: float) -> np.ndarray:
    """M ((d,e,a,b)=576, (g,v,w)=288): vec(Ke) = M @ vec(C_e) — the
    element stiffness as one dense matmul per element (channel order
    de-major so the stage-2 combine can use de feature groups)."""
    B = np.asarray(B, dtype=np.float64)
    M = np.einsum("gvad,gwbe->deabgvw", B, B) * wg  # (3,3,8,8,8,6,6)
    return M.reshape(9 * NPE * NPE, NGP * NVOI * NVOI)


def _assembly_combine_weights() -> np.ndarray:
    """Grouped-conv selector kernel (2,2,2, 64, 9*27): group g'=(d,e); in
    channel (a,b) of the group; out channel o of the group; weight 1 at
    tap t=1-off_a iff off_b-off_a = offset(o)."""
    W = np.zeros((2, 2, 2, NPE * NPE, 9 * N_STENCIL))
    for a in range(NPE):
        oa = NODE_OFFSETS[a]
        t = (1 - oa[0], 1 - oa[1], 1 - oa[2])
        for b in range(NPE):
            ob = NODE_OFFSETS[b]
            o = offset_index(ob[0] - oa[0], ob[1] - oa[1], ob[2] - oa[2])
            for de in range(9):
                # grouped conv rhs layout: in-ch within group, out-ch
                # global (group-major: group de, channel o)
                W[t[0], t[1], t[2], a * NPE + b, de * N_STENCIL + o] = 1.0
    return W


def assemble_stencil_soa_conv2(
    ctan: jax.Array,
    B: jax.Array,
    wg: float,
    grid_shape: Tuple[int, int, int],
    block: int = 16,
) -> jax.Array:
    """Two-stage MXU assembly: (1) per-ELEMENT stiffness as one dense
    (288->576) matmul — each Ke computed once, unlike the one-shot conv
    which recomputes it at every consuming node (8x) — then (2) the
    node-gather as a 2x2x2 grouped selector conv (9 de-groups, 64-in /
    27-out per group).  FLOPs: 680 GFLOP + 510 GFLOP at 128^3 vs the
    one-shot conv's 2.3 TFLOP.

    Row-slab blocked along x: the unblocked form materializes the full Ke
    field (nex*ney*nez*576 = 4.6 GB at 128^3 plus the padded conv input
    copy) and OOMs a 16 GB chip; a ``block``-row slab bounds the transient
    to ~0.7 GB at block=16, recomputing only the one shared element plane
    per slab boundary."""
    nx, ny, nz = grid_shape
    Cf = ctan.reshape(ctan.shape[:3] + (-1,))
    # zero element padding so every slab/tap slice is static and
    # boundary-safe (padded element index = element index + 1)
    Cfp = jnp.pad(Cf, ((1, 1), (1, 1), (1, 1), (0, 0)))
    M = jnp.asarray(_assembly_pair_matrix(B, wg), dtype=ctan.dtype)
    W = jnp.asarray(_assembly_combine_weights(), dtype=ctan.dtype)
    slabs = []
    for x0 in range(0, nx, block):
        nb = min(block, nx - x0)
        # rows [x0, x0+nb) read padded element planes [x0, x0+nb+1)
        cs = Cfp[x0:x0 + nb + 1]
        Ke = jnp.einsum("xyzc,kc->xyzk", cs, M)[None]  # de-major channels
        out = jax.lax.conv_general_dilated(
            Ke,
            W,
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NXYZC", "XYZIO", "CNXYZ"),
            feature_group_count=9,
        )
        # (9*27, 1, nb, ny, nz): (d,e,o) -> (o,d,e)
        out = out.reshape(DIM, DIM, N_STENCIL, nb, ny, nz)
        slabs.append(jnp.transpose(out, (2, 0, 1, 3, 4, 5)))
    return jnp.concatenate(slabs, axis=3)


def assemble_stencil_flat(
    ctan: jax.Array, B: jax.Array, wg: float, grid_shape: Tuple[int, int, int]
) -> jax.Array:
    """assemble_stencil with the block dims FLATTENED: A (nx,ny,nz,243),
    entry j = o*9 + d*3 + e.

    This is the TPU form for SMALL grids (the micro RVE inside the FE²
    chunked path): a (...,27,3,3) accumulator materialized inside nested
    while loops gets a tiled layout that pads the (3,3) minors to (4,128)
    — a ~57x memory blowup (18.8 GB for a 256-GP chunk at micro_n=10, the
    production-path OOM) — while a 243-minor pads to 256 lanes only.
    Numerically identical to assemble_stencil."""
    nx, ny, nz = grid_shape
    nex, ney, nez = nx - 1, ny - 1, nz - 1
    A = jnp.zeros((nx, ny, nz, N_STENCIL * 9), dtype=ctan.dtype)
    for a in range(NPE):
        Ba = B[:, :, a, :]
        BaC = jnp.einsum("gvd,xyzgvw->xyzgdw", Ba, ctan)
        oa = NODE_OFFSETS[a]
        for b in range(NPE):
            Bb = B[:, :, b, :]
            block = jnp.einsum("xyzgdw,gwe->xyzde", BaC, Bb) * wg
            ob = NODE_OFFSETS[b]
            o = offset_index(ob[0] - oa[0], ob[1] - oa[1], ob[2] - oa[2])
            A = A.at[
                oa[0]:oa[0] + nex,
                oa[1]:oa[1] + ney,
                oa[2]:oa[2] + nez,
                o * 9:(o + 1) * 9,
            ].add(block.reshape(block.shape[:3] + (9,)))
    return A


def assemble_stencil(
    ctan: jax.Array, B: jax.Array, wg: float, grid_shape: Tuple[int, int, int]
) -> jax.Array:
    """Assemble the 27-point block-stencil matrix A27: (nx,ny,nz,27,3,3).

    A27[p, o, d, e] is the coupling of node p (dof d) to its neighbor at
    stencil offset o (dof e).  Each element contributes 8x8 node-pair blocks;
    the pair (a, b) lands at row-node (cell + off_a) and stencil offset
    (off_b - off_a).  This is MatSetValuesLocal ADD_VALUES + MatAssembly
    (assembly.c:102-110) collapsed into 64 shifted einsum-adds over a static
    sparsity pattern — no dynamic preallocation, no assembly communication
    (under SPMD, XLA inserts the reverse-halo adds).

    The contraction per pair is BaC = einsum over gp,v once, reused across b.
    """
    nx, ny, nz = grid_shape
    nex, ney, nez = nx - 1, ny - 1, nz - 1
    A = jnp.zeros((nx, ny, nz, N_STENCIL, DIM, DIM), dtype=ctan.dtype)
    # Pre-contract B^T C for each row node a: (a fixed) -> (xyz, gp, d, w)
    for a in range(NPE):
        Ba = B[:, :, a, :]  # (gp, v, d)
        BaC = jnp.einsum("gvd,xyzgvw->xyzgdw", Ba, ctan)
        oa = NODE_OFFSETS[a]
        for b in range(NPE):
            Bb = B[:, :, b, :]  # (gp, w, e)
            block = jnp.einsum("xyzgdw,gwe->xyzde", BaC, Bb) * wg
            ob = NODE_OFFSETS[b]
            o = offset_index(ob[0] - oa[0], ob[1] - oa[1], ob[2] - oa[2])
            A = A.at[
                oa[0]:oa[0] + nex,
                oa[1]:oa[1] + ney,
                oa[2]:oa[2] + nez,
                o, :, :,
            ].add(block)
    return A
