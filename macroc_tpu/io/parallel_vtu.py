"""Gather-free multi-process VTU output support.

The reference's VTU path is each MPI rank writing its OWN piece from local
ghosted data (src/output.c:78-79) — no global array ever exists.  The
TPU-native equivalent (VERDICT r2 next #4): ONE collective builds the
PETSc-style *local ghosted vector* layout (`parallel.halo.ghosted_blocks`),
after which every jax process holds an owned-plus-halo patch of each output
field in purely addressable shards; each DMDA piece is then assigned to a
process whose patch covers the piece's ghost box and written from host-local
data.  Peak host memory per process = its shard + halo, at any scale.

Why a halo wider than 1: the device sharding splits the PADDED grid evenly
(ceil(n/p) per device), while the output pieces follow the reference's DMDA
ownership rule on the REAL grid (base + remainder-first; grid.py).  The two
decompositions drift by up to |si_dmda - d*s_even| nodes, so the halo is
sized ``misalignment + 1`` per axis — every piece's ghost box is then
covered by the process owning the same-coordinate device shard (proof in
``halo_widths``)."""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from macroc_tpu.grid import StructuredGrid3D


def halo_widths(
    grid: StructuredGrid3D, node_shape: Tuple[int, int, int]
) -> Tuple[int, int, int]:
    """Per-axis ghost width for `ghosted_blocks` such that DMDA piece d's
    ghost box [si-1, si+n+1) is always inside even-shard d's extended region
    [d*s - h, (d+1)*s + h): with h = max_d|si_dmda(d) - d*s| + 1,
    si-1 >= d*s - h and si + n + 1 = si(d+1) + 1 <= (d+1)*s + h."""
    hs = []
    counts = grid.node_counts()
    for axis in range(3):
        p = grid.procs[axis]
        s_even = node_shape[axis] // p
        starts = np.cumsum([0] + counts[axis][:-1])
        mis = max(abs(int(st) - d * s_even) for d, st in enumerate(starts))
        h = mis + 1
        if h > s_even:
            raise ValueError(
                f"axis {axis}: required halo {h} exceeds shard extent "
                f"{s_even} — decomposition too fine for per-process IO"
            )
        hs.append(h)
    return tuple(hs)


def _process_boxes(mesh) -> Dict[int, Tuple[range, range, range]]:
    """Per-process box of mesh coordinates (ci,cj,ck); processes whose
    device set is NOT a contiguous box are omitted (they cannot host a
    single rectangular patch)."""
    devs = mesh.devices  # (px,py,pz) ndarray of Devices
    by_proc: Dict[int, List[Tuple[int, int, int]]] = {}
    for idx in np.ndindex(devs.shape):
        by_proc.setdefault(devs[idx].process_index, []).append(idx)
    boxes = {}
    for p, coords in by_proc.items():
        rngs = []
        for a in range(3):
            vals = sorted({c[a] for c in coords})
            if vals != list(range(vals[0], vals[-1] + 1)):
                rngs = None
                break
            rngs.append(range(vals[0], vals[-1] + 1))
        if rngs is None:
            continue
        if len(coords) == len(rngs[0]) * len(rngs[1]) * len(rngs[2]):
            boxes[p] = tuple(rngs)
    return boxes


def assign_pieces(
    grid: StructuredGrid3D,
    node_shape: Tuple[int, int, int],
    halo: Tuple[int, int, int],
    mesh,
) -> Dict[int, int]:
    """piece rank -> process index, deterministically on every process.
    A piece goes to the LOWEST process whose ghosted patch covers its ghost
    box."""
    boxes = _process_boxes(mesh)
    s = [node_shape[a] // grid.procs[a] for a in range(3)]
    out = {}
    for r in range(grid.nproc):
        b = grid.local_box(r)
        gbox = (
            (b.si_ghost, b.si_ghost + b.nx_ghost),
            (b.sj_ghost, b.sj_ghost + b.ny_ghost),
            (b.sk_ghost, b.sk_ghost + b.nz_ghost),
        )
        owner = None
        for p in sorted(boxes):
            rngs = boxes[p]
            ok = all(
                rngs[a].start * s[a] - halo[a] <= gbox[a][0]
                and gbox[a][1] <= (rngs[a].stop) * s[a] + halo[a]
                for a in range(3)
            )
            if ok:
                owner = p
                break
        if owner is None:
            raise RuntimeError(
                f"VTU piece {r} ghost box {gbox} not covered by any "
                "process patch — halo_widths invariant violated"
            )
        out[r] = owner
    return out


def extract_patch(
    stacked: Sequence,
    node_shape: Tuple[int, int, int],
    halo: Tuple[int, int, int],
    procs: Tuple[int, int, int],
) -> Tuple[Tuple[int, int, int], List[np.ndarray]]:
    """Assemble this process's host patch of each field from the
    addressable shards of the `ghosted_blocks` outputs.

    Returns (origin, patches): patch[i] covers global (padded-grid) region
    [origin, origin + patch.shape[:3]) of field i; origin may be negative
    (halo sticking out of the grid — zero-filled, never read)."""
    s = [node_shape[a] // procs[a] for a in range(3)]
    ext = [s[a] + 2 * halo[a] for a in range(3)]

    first = stacked[0]
    coords = []
    for shard in first.addressable_shards:
        starts = [sl.start or 0 for sl in shard.index[:3]]
        coords.append(tuple(starts[a] // ext[a] for a in range(3)))
    lo = [min(c[a] for c in coords) for a in range(3)]
    hi = [max(c[a] for c in coords) + 1 for a in range(3)]
    origin = tuple(lo[a] * s[a] - halo[a] for a in range(3))
    sizes = tuple(
        (hi[a] - lo[a]) * s[a] + 2 * halo[a] for a in range(3)
    )

    patches = []
    for arr in stacked:
        patch = np.zeros(sizes + arr.shape[3:], dtype=arr.dtype)
        for shard in arr.addressable_shards:
            starts = [sl.start or 0 for sl in shard.index[:3]]
            c = [starts[a] // ext[a] for a in range(3)]
            # block covers true region [c*s - h, c*s + s + h)
            dst0 = [c[a] * s[a] - halo[a] - origin[a] for a in range(3)]
            patch[
                dst0[0]:dst0[0] + ext[0],
                dst0[1]:dst0[1] + ext[1],
                dst0[2]:dst0[2] + ext[2],
            ] = np.asarray(shard.data)
        patches.append(patch)
    return origin, patches
