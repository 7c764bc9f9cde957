"""MacroProblem — the Newton/time-step core, fully jit-compiled.

This is the TPU-native equivalent of the reference's driver hot path
(src/main.c:49-108): per time step, ramp the Dirichlet load, run the Newton
loop (strains -> constitutive homogenize -> residual -> convergence test ->
Jacobian -> Krylov solve -> update), then commit the constitutive internal
variables.  The entire time step is ONE device program (`time_step`): the
Newton loop is a lax.while_loop, the Krylov solve a nested while_loop, and
all diagnostics (per-iteration residual norms, KSP counts, force, non-linear
GP flags) come back as fixed-shape arrays — zero host round-trips inside a
step.

Semantics replicated exactly (SURVEY.md §3.2, Appendix B.10):
  - convergence tested BEFORE the first solve; a converged step performs
    1 homogenize + 1 residual and 0 solves (main.c:66-77);
  - norm_0 captured at iteration 0 of each time step (main.c:70-71);
  - newton_max_its bounds the number of *solves*;
  - the state committed by update_vars is the trial state of the LAST
    homogenize executed (main.c:62 vs 83) — even when the loop exits by
    iteration count after a final solve updated u;
  - residual b = -(assembled internal force with Dirichlet rows zeroed)
    (assembly.c:164-173), so the update is u += du (main.c:79).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property, partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from macroc_tpu import bc as bc_mod
from macroc_tpu.config import MacroConfig
from macroc_tpu.constitutive import make_engine
from macroc_tpu.fem.element import b_for
from macroc_tpu.fem.kernels import (
    assemble_diagonal,
    assemble_stencil,
    compute_strains,
    assemble_residual,
    gather_element_dofs,
    matfree_matvec,
)
from macroc_tpu.forces import calc_force
from macroc_tpu.grid import StructuredGrid3D, make_grid
from macroc_tpu.solve import cg_solve, gmres_solve, identity_precond


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepDiagnostics:
    """Fixed-shape per-time-step diagnostics (sized by newton_max_its)."""

    res_norms: jax.Array    # (max_its+1,) |RES| per Newton iteration (nan-padded)
    ksp_its: jax.Array      # (max_its,)   KSP iteration counts per solve
    ksp_rnorms: jax.Array   # (max_its,)   KSP final residual norms
    ksp_reasons: jax.Array  # (max_its,)   KSPConvergedReason per solve
    n_homogenize: jax.Array  # ()          number of homogenize calls
    n_solves: jax.Array     # ()           number of linear solves
    converged: jax.Array    # ()           bool
    force: jax.Array        # ()           reaction-force QoI
    f_trial_max: jax.Array  # ()           max plastic trial function
    non_linear: jax.Array   # (nex,ney,nez,8) bool per-GP flags
    cost: jax.Array         # (nex,ney,nez,8) per-GP constitutive cost
    stress: jax.Array       # (nex,ney,nez,8,6) committed per-GP stress
    micro_unconverged: jax.Array  # () total RVE solves that hit the micro
    # Newton cap above tolerance this step (0 for closed-form engines)
    # (max_its, ksp_maxits+1) per-solve residual-norm histories, only when
    # cfg.ksp_monitor (PETSc -ksp_monitor); None otherwise
    ksp_traces: Optional[jax.Array] = None


def resolve_solver_plan(cfg, node_shape, procs, backend: str) -> dict:
    """PURE auto-resolution of the solver configuration — the single place
    the `auto` choices live, unit-testable without hardware (the virtual
    CPU mesh cannot lower real pallas_call, so the flagship multi-chip
    routing is proven by (a) this function's decisions at the flagship
    shapes and (b) the kernels' own TPU benches + interpret-mode
    shard_map equivalence tests).

    Returns dict(pc_type, operator, assembly, mxu_tile, stage1_precision).
    """
    from macroc_tpu.ops.assembly_pallas import pick_mxu_tile

    nproc = procs[0] * procs[1] * procs[2]
    local_nz = node_shape[2] // procs[2]
    on_tpu = backend == "tpu"

    pc_type = cfg.pc_type
    if pc_type == "auto":
        # MG pays off when a deep hierarchy exists along at least two
        # dims (>= ~17 extent); the third may be thin — SEMICOARSENED
        # V-cycles cover the reference's own pancake shapes (default
        # 40x3x40, production 50x3x50, macroc.h:44-46 /
        # scripts/launch_jobs.sh:13), which previously fell back to
        # Jacobi.  The matfree operator has no assembled stencil to
        # build a hierarchy from — always Jacobi there.
        deep_dims = sum(n >= 17 for n in node_shape)
        pc_type = (
            "mg" if deep_dims >= 2 and cfg.operator != "matfree"
            else "jacobi"
        )

    operator = cfg.operator
    if operator == "auto":
        # The Pallas kernel pads the LOCAL z extent up to a multiple of
        # 128 (lane tiling) and re-pads A per call when unaligned: the
        # measured 2.3x win at nz=128 is eaten by ~2x extra HBM traffic
        # when e.g. nz=129 pads to 256.  Only pick it where the padding
        # is free (decide_processor_grid's tiebreak keeps local nz a
        # 128-multiple whenever that is halo-cost-free).
        pallas_ok = on_tpu and local_nz >= 128 and local_nz % 128 == 0
        operator = "stencil_pallas" if pallas_ok else "stencil"

    # z extent the per-device combine kernel will carry: local nodes,
    # +1 when the z axis is split (the folded extra plane)
    mxu_nz = local_nz + (1 if procs[2] > 1 else 0)
    mxu_tile = pick_mxu_tile(mxu_nz)
    assembly = cfg.assembly
    if assembly == "auto":
        assembly = "mxu" if on_tpu and mxu_tile is not None else "slab"
    elif assembly == "mxu" and on_tpu and mxu_tile is None:
        raise ValueError(
            f"assembly='mxu': local z extent {mxu_nz} overflows the "
            "combine kernel's VMEM budget (whole-z tiles); use "
            "assembly=slab or split the z axis further"
        )
    return dict(
        pc_type=pc_type,
        operator=operator,
        assembly=assembly,
        mxu_tile=mxu_tile,
        # tf32 Ke matmul: 1.35e-6 relative operator error on the Jacobian
        # only (residual stays exact at highest); 67 -> 51 ms at 128^3.
        # CPU (tests) keeps highest — decomposition-identity tests
        # compare at 1e-9.
        stage1_precision="tensorfloat32" if on_tpu else "highest",
    )


class MacroProblem:
    """Bundles grid/config/BC/constitutive engine and exposes jitted steps."""

    def __init__(
        self,
        cfg: MacroConfig,
        grid: Optional[StructuredGrid3D] = None,
        n_devices: int = 1,
    ):
        self.cfg = cfg
        self.grid = grid or make_grid(cfg, n_devices)
        self.dtype = jnp.dtype(cfg.dtype)
        self.B = jnp.asarray(
            b_for(self.grid.spacing, cfg.ref_b_quirk), dtype=self.dtype
        )
        self.engine = make_engine(cfg, self.dtype)

        # --- computational (padded) grid ---------------------------------
        # JAX NamedSharding requires shard-divisible dims, so the node box
        # is padded up to multiples of the (px,py,pz) device grid.  Padded
        # nodes are Dirichlet-constrained to 0 and padded elements are
        # INACTIVE (their stress/tangent is masked to zero), so the real
        # dofs see numerics identical to the unpadded problem while every
        # array shards evenly.  (DMDA handled uneven splits with per-rank
        # extents; even-padding is the TPU-native equivalent.)
        g = self.grid
        px, py, pz = g.procs

        def _pad(n, p):
            return -(-n // p) * p

        self.real_shape = (g.nx, g.ny, g.nz)
        self.node_shape = (_pad(g.nx, px), _pad(g.ny, py), _pad(g.nz, pz))
        self.real_elem_shape = (g.nx - 1, g.ny - 1, g.nz - 1)
        # element/GP arrays are STORED at node_shape (the trailing layer per
        # dim is a permanently inactive slot) so every array in the step —
        # nodes, elements, internal-variable state — shards with the same
        # P('x','y','z') spec; kernels operate on the cropped (n-1) view.
        self.elem_shape = self.node_shape

        import numpy as _np

        nex, ney, nez = self.real_elem_shape
        elem_mask = _np.zeros(self.elem_shape, dtype=bool)
        elem_mask[:nex, :ney, :nez] = True
        self.elem_mask = jnp.asarray(elem_mask)

        # device mesh for the explicit-collective (shard_map) paths; None on
        # a single device (everything runs the plain single-block kernels)
        if g.nproc > 1:
            from macroc_tpu.parallel.mesh import make_grid_mesh

            self.mesh = make_grid_mesh(g)
        else:
            self.mesh = None

        bc0 = bc_mod.build_bc(g, cfg, dtype=self.dtype)
        mask = _np.ones(self.node_shape + (3,), dtype=bool)  # pads constrained
        mask[: g.nx, : g.ny, : g.nz] = _np.asarray(bc0.mask)
        val = _np.zeros(self.node_shape + (3,), dtype=_np.float64)
        val[: g.nx, : g.ny, : g.nz] = _np.asarray(bc0.val_unit)
        self.bc = bc_mod.BCData(
            mask=jnp.asarray(mask), val_unit=jnp.asarray(val, dtype=self.dtype)
        )

    # ------------------------------------------------------------------ #
    def unpad_u(self, u: jax.Array) -> jax.Array:
        """Strip grid padding: computational (padded) -> real node box."""
        nx, ny, nz = self.real_shape
        return u[:nx, :ny, :nz]

    # ------------------------------------------------------------------ #
    def init_fields(self):
        """(u, constitutive state) — zero displacement, fresh internal vars."""
        u = jnp.zeros(self.node_shape + (3,), dtype=self.dtype)
        state = self.engine.init_state(self.elem_shape + (8,))
        return u, state

    # ------------------------------------------------------------------ #
    def _pad_gp(self, arr: jax.Array) -> jax.Array:
        """Element-kernel output (n-1 dims) -> GP storage layout (node dims)."""
        pad = [(0, 1), (0, 1), (0, 1)] + [(0, 0)] * (arr.ndim - 3)
        return jnp.pad(arr, pad)

    def _crop_gp(self, arr: jax.Array) -> jax.Array:
        """GP storage layout -> element-kernel input (n-1 dims)."""
        return arr[:-1, :-1, :-1]

    # ------------------------------------------------------------------ #
    def _force_and_hom(self, u: jax.Array, state: Any):
        """(f, hom): raw internal force (pre-BC) + homogenize result, i.e.
        set_strains -> micropp homogenize -> assembly_res's element loop
        (assembly.c:25-66, 142-165).

        On a multi-device mesh this whole pipeline runs inside ONE
        shard_map with explicit 1-node ppermute halos (the DMGlobalToLocal
        INSERT / DMLocalToGlobal ADD pair, assembly.c:40-41, 164-165):

          - GSPMD partitioning of the shifted-slice gather/scatter chose to
            ALL-GATHER the full u field per shifted slice (24 all-gathers
            per step measured at 17^3/8-way) instead of exchanging face
            halos — O(volume) ICI traffic where O(surface) suffices;
          - engines that flatten the GP batch internally (micro-FE's
            chunked lax.map streaming) destroy the P('x','y','z') sharding
            under GSPMD entirely: the global reshape gathered the full
            micro internal state onto every device (63 all-gathers in the
            r3 step — VERDICT r3 missing #1), defeating the >=4-chip FE²
            memory plan.  Per-GP micro solves are embarrassingly parallel
            (SURVEY.md §2.3), so inside shard_map they need no
            communication at all and per-device memory is shard +
            transients."""
        emask = self.elem_mask[..., None, None]

        def core(u_l, state_l, emask_l):
            lnx, lny, lnz = u_l.shape[:3]
            if self.mesh is not None:
                from macroc_tpu.parallel.halo import (
                    halo_exchange,
                    halo_fold_add,
                )

                ue = halo_exchange(u_l, dims=(0, 1, 2))
                # local element slot i gathers nodes i, i+1 -> extended
                # indices i+1, i+2: element slots of gather(ue) shifted by 1
                u8 = gather_element_dofs(ue)[1:1 + lnx, 1:1 + lny, 1:1 + lnz]
                eps = jnp.einsum("gvnd,xyznd->xyzgv", self.B, u8)
            else:
                eps = self._pad_gp(compute_strains(u_l, self.B))
            # inactive (grid-padding) element slots see zero strain, so
            # their internal state stays pristine (they sit next to the
            # Dirichlet-0 padding and would otherwise accumulate garbage)
            eps = jnp.where(emask_l, eps, 0.0)
            hom = self.engine.homogenize(eps, state_l)
            stress = hom.stress * emask_l
            if self.mesh is None:
                f = assemble_residual(
                    self._crop_gp(stress), self.B, self.grid.wg,
                    self.node_shape,
                )
                return f, hom
            fe = jnp.einsum(
                "gvnd,xyzgv->xyznd", self.B, stress
            ) * jnp.asarray(self.grid.wg, stress.dtype)
            fx = jnp.zeros((lnx + 2, lny + 2, lnz + 2, 3), fe.dtype)
            from macroc_tpu.fem.element import NODE_OFFSETS

            for n, (di, dj, dk) in enumerate(NODE_OFFSETS):
                fx = fx.at[
                    1 + di:1 + di + lnx,
                    1 + dj:1 + dj + lny,
                    1 + dk:1 + dk + lnz,
                ].add(fe[..., n, :])
            f = halo_fold_add(fx, dims=(0, 1, 2))
            return f, hom

        if self.mesh is None:
            return core(u, state, emask)
        from jax.sharding import PartitionSpec as P

        spec = P("x", "y", "z")
        return jax.shard_map(
            core,
            mesh=self.mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            check_vma=False,
        )(u, state, emask)

    # ------------------------------------------------------------------ #
    def residual(self, u: jax.Array, state: Any):
        """(b, norm, hom): negated+BC-zeroed residual, its L2 norm, and the
        homogenize result (assembly_res + VecNorm, main.c:66-68)."""
        f, hom = self._force_and_hom(u, state)
        b = -bc_mod.apply_bc_on_res(f, self.bc)
        norm = jnp.sqrt(jnp.sum(b * b))
        return b, norm, hom

    # ------------------------------------------------------------------ #
    def linear_solve(self, ctan_ns: jax.Array, b: jax.Array):
        """Assemble the BC-eliminated operator from per-GP tangents and run
        the configured Krylov method (assembly_jac + solve_Ax).

        ``ctan_ns`` is the NODE-shaped per-GP tangent field (element slot
        (i,j,k) = element at the same offset; trailing slots inactive and
        already masked to zero) so it shards P('x','y','z') and the
        distributed assembler can consume it shard-local; single-device
        paths crop to the (n-1) element view internally.

        Stencil paths work in SoA layout — A (27,3,3,nx,ny,nz), vectors
        (3,nx,ny,nz) — so SpMV's minor dims map onto TPU (sublane, lane)
        tiles and the matvec runs at HBM-roofline speed; the one-time
        transposes per Newton iteration are noise next to the CG loop."""
        cfg = self.cfg
        ctan = self._crop_gp(ctan_ns)
        nproc = self.grid.nproc
        plan = resolve_solver_plan(
            cfg, self.node_shape, self.grid.procs, jax.default_backend()
        )
        pc_type = plan["pc_type"]
        operator = plan["operator"]
        if operator in ("stencil", "stencil_pallas"):
            from macroc_tpu.ops.stencil_pallas import (
                stencil_matvec_pallas,
                stencil_matvec_soa,
                to_soa,
                x_from_soa,
                x_to_soa,
            )
            from macroc_tpu.solve.precond import (
                block_jacobi_precond_soa,
                jacobi_precond_soa,
            )

            from macroc_tpu.fem.kernels import (
                assemble_stencil_soa,
                assemble_stencil_soa_conv,
                assemble_stencil_soa_conv2,
                assemble_stencil_soa_v2,
            )

            # assemble directly in the solver's SoA layout; the plan's
            # "auto" picks the measured-best formulation per backend
            # (v5e @128^3 standalone: mxu 51 ms [tf32 Ke matmul + Pallas
            # combine, ops/assembly_pallas.py] < offsetwise 144 < conv
            # 183 < slab 186; the conv forms lose ~0.24 s to layout
            # copies INSIDE the fused step — the r3 regression — and
            # offsetwise OOMs there).  On a device mesh the chosen
            # assembler runs PER DEVICE inside shard_map
            # (parallel/halo.py::shmap_assemble_stencil, the
            # MatAssembly-scatter equivalent): the Pallas combine has no
            # GSPMD partitioning rule, and GSPMD ALL-GATHERED the slab
            # form's x-slab concatenate (VERDICT r4 #1 / missing #4).
            assembly = plan["assembly"]
            on_tpu = jax.default_backend() == "tpu"
            from macroc_tpu.ops.assembly_pallas import (
                assemble_stencil_soa_mxu,
            )

            assemblers = {
                "slab": assemble_stencil_soa,
                "offsetwise": assemble_stencil_soa_v2,
                "conv": assemble_stencil_soa_conv,
                "conv2": assemble_stencil_soa_conv2,
                "mxu": partial(
                    assemble_stencil_soa_mxu, xblock=16,
                    tile=plan["mxu_tile"] or (4, 16),
                    interpret=not on_tpu,
                    stage1_precision=plan["stage1_precision"],
                ),
            }
            if assembly not in assemblers:
                raise ValueError(
                    f"unknown assembly '{cfg.assembly}' "
                    f"(expected auto|slab|offsetwise|conv|conv2|mxu)"
                )
            assemble = assemblers[assembly]
            if nproc > 1:
                # EVERY multi-device fine-level assembly goes through the
                # explicit per-device wrapper: under GSPMD the slab
                # assembler's x-slab concatenate was ALL-GATHERED along
                # the x mesh axis (measured: 2 fine-level A all-gathers
                # per solve in the 8-way MG step, VERDICT r4 missing #4),
                # and the Pallas combine has no GSPMD rule at all.
                from macroc_tpu.parallel.halo import shmap_assemble_stencil

                A_raw = shmap_assemble_stencil(
                    self.mesh, ctan_ns, self.B, self.grid.wg, assemble
                )
            else:
                A_raw = assemble(ctan, self.B, self.grid.wg, self.node_shape)
            A_soa = bc_mod.apply_bc_stencil_soa(A_raw, self.bc)
            if operator == "stencil_pallas":
                interp = jax.default_backend() == "cpu"
                if nproc > 1:
                    # Multi-device: pallas_call has no SPMD partitioning
                    # rule, so run the kernel per-device inside shard_map
                    # after an explicit ppermute halo exchange
                    # (parallel/halo.py) — the distributed-KSPSolve
                    # equivalent of reference assembly.c:179-192.
                    from macroc_tpu.parallel.halo import shmap_stencil_matvec

                    mv = partial(
                        shmap_stencil_matvec,
                        self.mesh,
                        A_soa,
                        kernel="pallas",
                        interpret=interp,
                    )
                else:
                    mv = partial(stencil_matvec_pallas, A_soa,
                                 interpret=interp)
            else:
                mv = partial(stencil_matvec_soa, A_soa)
            if pc_type == "jacobi":
                M = jacobi_precond_soa(A_soa)
            elif pc_type == "bjacobi":
                M = block_jacobi_precond_soa(A_soa)
            elif pc_type == "mg":
                from macroc_tpu.solve.mg import (
                    build_hierarchy,
                    make_mg_preconditioner,
                )

                bc_mask_soa = jnp.moveaxis(self.bc.mask, -1, 0)
                levels = build_hierarchy(
                    ctan, bc_mask_soa, self.grid.spacing, cfg.ref_b_quirk,
                    A0_soa=A_soa,
                    # coarse levels use the same measured-best assembler
                    # on one device; on a mesh the coarse shapes are not
                    # mesh-divisible, so they assemble with the GSPMD-safe
                    # slab form (tiny next to level 0)
                    assemble_fn=assemble if nproc == 1
                    else assemble_stencil_soa,
                )
                mg_dtype = cfg.mg_dtype
                if (
                    not mg_dtype
                    and self.dtype == jnp.float32
                    and jax.default_backend() == "tpu"
                    and levels[0].line_dim < 0
                ):
                    # measured on v5e @128^3: bf16 level operators cut the
                    # step 0.4345 -> 0.4051 s at IDENTICAL 9 CG its (the
                    # V-cycle is only a preconditioner).  Auto applies
                    # only to POINT-smoothed (cube) hierarchies: on
                    # semicoarsened pancakes the bf16 operators degrade
                    # the line-GS V-cycle (measured 15 -> 20 its on the
                    # 40x3x40 default).  -mg_dtype float32 opts out.
                    mg_dtype = "bfloat16"
                if mg_dtype and jnp.dtype(mg_dtype) != self.dtype:
                    # reduced-precision V-cycle operators: the smoother's
                    # matvecs read half the bytes; vectors/transfers stay
                    # in the solve dtype (the V-cycle remains a fixed
                    # symmetric operator — equal entries round equally);
                    # line_inv keeps the solve dtype (exact line solves)
                    mgdt = jnp.dtype(mg_dtype)
                    levels = [
                        dataclasses.replace(
                            lv,
                            A_soa=lv.A_soa.astype(mgdt),
                            inv_diag=lv.inv_diag.astype(mgdt),
                        )
                        for lv in levels
                    ]

                def mv_for(level):
                    # Pallas wins only where its nz-to-128 padding is free
                    # (see CLAUDE.md / bench): fine 128-multiple levels
                    # use it, everything else the fused jnp path.  On a
                    # device mesh, only the finest level is mesh-divisible
                    # — it routes through the same shard_map+ppermute
                    # composition as the CG matvec (the raw kernel has no
                    # SPMD rule); coarse levels stay on jnp under GSPMD.
                    interp = jax.default_backend() == "cpu"
                    lnz = level.A_soa.shape[-1]
                    if operator == "stencil_pallas" and nproc == 1:
                        if lnz >= 128 and lnz % 128 == 0:
                            return partial(stencil_matvec_pallas,
                                           interpret=interp)
                    elif (
                        operator == "stencil_pallas"
                        and tuple(level.A_soa.shape[-3:])
                        == tuple(self.node_shape)
                    ):
                        from macroc_tpu.parallel.halo import (
                            shmap_stencil_matvec,
                        )

                        return partial(
                            shmap_stencil_matvec, self.mesh,
                            kernel="pallas", interpret=interp,
                        )
                    return stencil_matvec_soa

                M = make_mg_preconditioner(
                    levels,
                    nu=cfg.mg_nu,
                    omega=cfg.mg_omega,
                    coarse_sweeps=cfg.mg_coarse_sweeps,
                    mv_for=mv_for,
                    coarse_direct=cfg.mg_coarse_direct,
                    transfer_order=cfg.mg_transfer_order or None,
                )
            else:
                M = identity_precond()
            common = dict(
                rtol=cfg.ksp_rtol,
                abstol=cfg.ksp_abstol,
                dtol=cfg.ksp_dtol,
                maxits=cfg.ksp_maxits,
                record_trace=cfg.ksp_maxits + 1 if cfg.ksp_monitor else 0,
            )
            b_soa = x_to_soa(b)
            if cfg.ksp_type == "cg":
                res = cg_solve(mv, b_soa, M, **common)
            elif cfg.ksp_type == "gmres":
                res = gmres_solve(
                    mv, b_soa, M, restart=cfg.gmres_restart, **common
                )
            else:
                raise ValueError(f"unknown ksp_type '{cfg.ksp_type}'")
            return res._replace(x=x_from_soa(res.x))
        elif operator == "matfree":
            raw = matfree_matvec(ctan, self.B, self.grid.wg, self.node_shape)
            mv = bc_mod.bc_operator(raw, self.bc)
            if pc_type in ("jacobi", "bjacobi"):
                diag = assemble_diagonal(ctan, self.B, self.grid.wg, self.node_shape)
                diag = jnp.where(self.bc.mask, jnp.ones((), self.dtype), diag)
                M = lambda r: r / diag
            else:
                M = identity_precond()
        else:
            raise ValueError(f"unknown operator '{cfg.operator}'")

        common = dict(
            rtol=cfg.ksp_rtol,
            abstol=cfg.ksp_abstol,
            dtol=cfg.ksp_dtol,
            maxits=cfg.ksp_maxits,
            record_trace=cfg.ksp_maxits + 1 if cfg.ksp_monitor else 0,
        )
        if cfg.ksp_type == "cg":
            return cg_solve(mv, b, M, **common)
        if cfg.ksp_type == "gmres":
            return gmres_solve(mv, b, M, restart=cfg.gmres_restart, **common)
        raise ValueError(f"unknown ksp_type '{cfg.ksp_type}'")

    # ------------------------------------------------------------------ #
    def time_step(self, u: jax.Array, state: Any, U: jax.Array):
        """One full time step (jittable): returns (u, new_state, diagnostics).

        U is the ramped load factor for this step (get_displacement).
        """
        cfg = self.cfg
        max_its = cfg.newton_max_its
        dtype = self.dtype

        u = bc_mod.apply_bc_on_u(U, u, self.bc)

        gp_shape = self.elem_shape + (8,)
        carry0 = dict(
            u=u,
            # if the loop body never runs, update_vars commits the state
            # unchanged — so `state` is the correct trial init
            trial=state,
            stress=jnp.zeros(gp_shape + (6,), dtype),
            non_linear=jnp.zeros(gp_shape, bool),
            f_trial=jnp.full(gp_shape, -jnp.inf, dtype),
            cost=jnp.zeros(gp_shape, dtype),
            it=jnp.int32(0),          # solves performed
            nhom=jnp.int32(0),        # homogenize calls performed
            unconv=jnp.int32(0),      # unconverged micro RVE solves
            norm0=jnp.asarray(0.0, dtype),
            done=jnp.asarray(False),
            res_norms=jnp.full((max_its + 1,), jnp.nan, dtype),
            ksp_its=jnp.zeros((max_its,), jnp.int32),
            ksp_rnorms=jnp.full((max_its,), jnp.nan, dtype),
            ksp_reasons=jnp.zeros((max_its,), jnp.int32),
        )
        if cfg.ksp_monitor:
            carry0["ksp_traces"] = jnp.full(
                (max_its, cfg.ksp_maxits + 1), jnp.nan, dtype
            )

        def cond(c):
            return jnp.logical_and(~c["done"], c["it"] < max_its)

        emask = self.elem_mask[..., None]

        def body(c):
            b, norm, hom = self.residual(c["u"], state)
            unconv = c["unconv"]
            if hom.unconverged is not None:
                unconv = unconv + jnp.sum(
                    jnp.logical_and(hom.unconverged, emask)
                ).astype(jnp.int32)
            norm0 = jnp.where(c["nhom"] == 0, norm, c["norm0"])
            res_norms = c["res_norms"].at[c["nhom"]].set(norm)
            nhom = c["nhom"] + 1
            conv = jnp.logical_or(
                norm < cfg.newton_min_tol, norm < norm0 * cfg.newton_rel_tol
            )

            def do_solve(_):
                # padded (inactive) elements contribute zero stiffness;
                # kept at node shape so it shards P('x','y','z') into the
                # distributed assembler (linear_solve crops as needed)
                ctan_ns = hom.ctan * emask[..., None, None]
                res = self.linear_solve(ctan_ns, b)
                return c["u"] + res.x, res.its, res.rnorm, res.reason, res.trace

            def no_solve(_):
                trace = (
                    jnp.full((cfg.ksp_maxits + 1,), jnp.nan, dtype)
                    if cfg.ksp_monitor
                    else None
                )
                return (c["u"], jnp.int32(0), jnp.asarray(jnp.nan, dtype),
                        jnp.int32(0), trace)

            u_new, kits, krnorm, kreason, ktrace = jax.lax.cond(
                conv, no_solve, do_solve, None
            )
            ksp_its = c["ksp_its"].at[c["it"]].set(
                jnp.where(conv, c["ksp_its"][c["it"]], kits)
            )
            ksp_rnorms = c["ksp_rnorms"].at[c["it"]].set(
                jnp.where(conv, c["ksp_rnorms"][c["it"]], krnorm)
            )
            ksp_reasons = c["ksp_reasons"].at[c["it"]].set(
                jnp.where(conv, c["ksp_reasons"][c["it"]], kreason)
            )
            it = jnp.where(conv, c["it"], c["it"] + 1)
            out = dict(
                u=u_new,
                trial=hom.trial_state,
                stress=hom.stress * emask[..., None],
                non_linear=jnp.logical_and(hom.non_linear, emask),
                f_trial=jnp.where(emask, hom.f_trial, -jnp.inf),
                cost=hom.cost * emask,
                it=it,
                nhom=nhom,
                unconv=unconv,
                norm0=norm0,
                done=conv,
                res_norms=res_norms,
                ksp_its=ksp_its,
                ksp_rnorms=ksp_rnorms,
                ksp_reasons=ksp_reasons,
            )
            if cfg.ksp_monitor:
                out["ksp_traces"] = c["ksp_traces"].at[c["it"]].set(
                    jnp.where(conv, c["ksp_traces"][c["it"]], ktrace)
                )
            return out

        c = jax.lax.while_loop(cond, body, carry0)

        new_state = c["trial"]  # update_vars (main.c:83)
        # diagnostics restricted to the real (unpadded) element box
        nex, ney, nez = self.real_elem_shape
        stress = c["stress"][:nex, :ney, :nez]
        diag = StepDiagnostics(
            res_norms=c["res_norms"],
            ksp_its=c["ksp_its"],
            ksp_rnorms=c["ksp_rnorms"],
            ksp_reasons=c["ksp_reasons"],
            ksp_traces=c.get("ksp_traces"),
            n_homogenize=c["nhom"],
            n_solves=c["it"],
            converged=c["done"],
            force=calc_force(stress, self.grid, cfg),
            f_trial_max=jnp.max(c["f_trial"][:nex, :ney, :nez]),
            non_linear=c["non_linear"][:nex, :ney, :nez],
            cost=c["cost"][:nex, :ney, :nez],
            stress=stress,
            micro_unconverged=c["unconv"],
        )
        return c["u"], new_state, diag

    @cached_property
    def time_step_jit(self):
        return jax.jit(self.time_step)
