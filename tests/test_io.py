"""IO writers: info.dat / gauss_evolution.dat formats, VTU/PVTU structure,
checkpoint save/load."""

import os
import re
import xml.etree.ElementTree as ET

import jax.numpy as jnp
import numpy as np

from macroc_tpu.config import MacroConfig
from macroc_tpu.grid import StructuredGrid3D
from macroc_tpu.io import GaussEvolutionWriter, InfoWriter, write_pvtu
from macroc_tpu.utils import checkpoint as ckpt


def test_info_format(tmp_path):
    p = str(tmp_path / "info.dat")
    with InfoWriter(p) as w:
        w.write_row(0, 0.0, -0.001, 123.4, 5.6e3, 42)
    line = open(p).read().strip()
    cols = line.split("\t")
    # reference row: ts, t, U, force, f_trial_max, nl_gps (main.c:96-97)
    assert len(cols) == 6
    assert cols[0] == "0" and cols[5] == "42"
    assert re.match(r"-?\d\.\d{6}e[+-]\d{2}", cols[1])


def test_gauss_format(tmp_path):
    p = str(tmp_path / "gauss.dat")
    with GaussEvolutionWriter(p) as w:
        w.write_row(3, [1, 2, 3, 4])
    assert open(p).read() == "3\t1\t2\t3\t4\t\n"


def test_vtu_pvtu_structure(tmp_path):
    grid = StructuredGrid3D(4, 3, 3, 3.0, 2.0, 2.0, procs=(2, 1, 1))
    rng = np.random.default_rng(0)
    u = rng.normal(size=(4, 3, 3, 3))
    stress = rng.normal(size=(3, 2, 2, 8, 6))
    strain = rng.normal(size=(3, 2, 2, 8, 6))
    nl = rng.integers(0, 2, size=(3, 2, 2, 8)).astype(bool)
    cost = rng.uniform(size=(3, 2, 2, 8))
    path = write_pvtu(
        "sol_0", grid, u, stress, strain, nl, cost, grid.wg,
        outdir=str(tmp_path),
    )
    root = ET.parse(path).getroot()
    pieces = root.findall(".//Piece")
    assert len(pieces) == 2  # one per rank
    for r in range(2):
        vtu = tmp_path / f"sol_0-subdo-{r}.vtu"
        assert vtu.exists()
        vr = ET.parse(vtu).getroot()
        piece = vr.find(".//Piece")
        b = grid.local_box(r)
        assert int(piece.get("NumberOfPoints")) == (
            b.nx_ghost * b.ny_ghost * b.nz_ghost
        )
        assert int(piece.get("NumberOfCells")) == b.nelem
        names = [da.get("Name") for da in vr.findall(".//DataArray")]
        for want in ["Position", "connectivity", "offsets", "types",
                     "displ", "part", "cost", "non-linear", "strain",
                     "stress"]:
            assert want in names
        # connectivity indices within point range
        conn_el = [da for da in vr.findall(".//DataArray")
                   if da.get("Name") == "connectivity"][0]
        ids = [int(v) for v in conn_el.text.split()]
        assert len(ids) == b.nelem * 8
        assert min(ids) >= 0
        assert max(ids) < b.nx_ghost * b.ny_ghost * b.nz_ghost


def test_vtu_reduced_matches_unreduced(tmp_path):
    """reduced=True (element-level inputs, device-side GP reduction in the
    driver) must produce byte-identical pieces to the per-GP path."""
    rng = np.random.default_rng(7)
    grid = StructuredGrid3D(4, 3, 3, 3.0, 2.0, 2.0, procs=(2, 1, 1))
    u = rng.normal(size=(4, 3, 3, 3))
    stress = rng.normal(size=(3, 2, 2, 8, 6))
    strain = rng.normal(size=(3, 2, 2, 8, 6))
    nl = rng.integers(0, 2, size=(3, 2, 2, 8)).astype(bool)
    cost = rng.uniform(size=(3, 2, 2, 8))
    wg = grid.wg

    d1, d2 = str(tmp_path / "gp"), str(tmp_path / "el")
    write_pvtu("s", grid, u, stress, strain, nl, cost, wg, outdir=d1)
    write_pvtu(
        "s", grid, u,
        stress.sum(axis=3) * wg,
        strain.sum(axis=3) * wg,
        nl.astype(np.int64).sum(axis=3),
        cost.sum(axis=3) / 8.0,
        wg, outdir=d2, reduced=True,
    )
    for r in range(grid.nproc):
        f = f"s-subdo-{r}.vtu"
        assert open(os.path.join(d1, f)).read() == open(
            os.path.join(d2, f)
        ).read()


def test_driver_vtu_fields_matches_host_reduction():
    """The driver's jitted device-side GP->element reduction (Simulation.
    vtu_fields: axis choice, wg scaling, /8.0 cost average, int cast) must
    reproduce the host numpy reduction that the unreduced write_pvtu path
    performs (ADVICE r2 #2: the actual device reduction was untested)."""
    import jax

    from macroc_tpu.driver import Simulation
    from macroc_tpu.fem.kernels import compute_strains

    cfg = MacroConfig(
        nx=4, ny=3, nz=3, lx=3.0, ly=2.0, lz=2.0, bc_type=0,
        dtype="float64",
    )
    sim = Simulation(cfg, n_devices=1, log=lambda s: None)
    u, state = sim.problem.init_fields()
    U = np.asarray(cfg.displacement(1), sim.problem.dtype)
    u, state, diag = sim.problem.time_step_jit(u, state, U)
    u_real, el_stress, el_strain, el_cost, el_nl = jax.tree.map(
        np.asarray, sim._vtu_fields_jit(u, diag)
    )
    wg = sim.grid.wg
    stress = np.asarray(diag.stress, np.float64)
    strain = np.asarray(
        compute_strains(sim.problem.unpad_u(u), sim.problem.B), np.float64
    )
    cost = np.asarray(diag.cost, np.float64)
    nl = np.asarray(diag.non_linear)
    assert np.allclose(u_real, np.asarray(sim.problem.unpad_u(u)),
                       rtol=0, atol=0)
    assert np.allclose(el_stress, stress.sum(axis=3) * wg, rtol=1e-14)
    assert np.allclose(el_strain, strain.sum(axis=3) * wg, rtol=1e-14)
    assert np.allclose(el_cost, cost.sum(axis=3) / 8.0, rtol=1e-14)
    assert el_nl.dtype.kind == "i"
    assert (el_nl == nl.astype(np.int64).sum(axis=3)).all()


def test_checkpoint_roundtrip(tmp_path):
    d = str(tmp_path / "ck")
    tree = (jnp.arange(12.0).reshape(3, 4), {"a": jnp.ones((2, 2))})
    ckpt.save(d, 7, tree)
    ckpt.save(d, 9, tree)
    out = ckpt.load_latest(d, tree)
    assert out is not None
    step, loaded = out
    assert step == 9
    assert np.allclose(np.asarray(loaded[0]), np.arange(12.0).reshape(3, 4))
    assert np.allclose(np.asarray(loaded[1]["a"]), 1.0)
    assert ckpt.load_latest(str(tmp_path / "none"), tree) is None


def test_vtu_binary_roundtrip(tmp_path):
    """encoding='binary' (VTK inline base64) must carry exactly the arrays
    the ascii path formats — decoded and compared field by field."""
    import base64
    import struct

    from macroc_tpu.io.vtu import _piece_arrays, _VTK_DTYPE

    rng = np.random.default_rng(4)
    grid = StructuredGrid3D(nx=5, ny=3, nz=4, lx=4.0, ly=2.0, lz=3.0,
                            procs=(2, 1, 1))
    ne = (4, 2, 3)
    u = rng.normal(size=(5, 3, 4, 3))
    stress = rng.normal(size=ne + (8, 6))
    strain = rng.normal(size=ne + (8, 6))
    nl = rng.random(ne + (8,)) > 0.5
    cost = rng.random(ne + (8,))
    path = write_pvtu("bin", grid, u, stress, strain, nl, cost, wg=0.125,
                      outdir=str(tmp_path), encoding="binary")
    assert os.path.exists(path)

    el_strain = strain.sum(axis=3) * 0.125
    el_stress = stress.sum(axis=3) * 0.125
    el_cost = cost.sum(axis=3) / 8.0
    el_nl = nl.astype(np.int64).sum(axis=3)

    for r in range(grid.nproc):
        b = grid.local_box(r)
        ref = _piece_arrays(grid, b, r, u, el_strain, el_stress, el_nl,
                            el_cost)
        tree = ET.parse(os.path.join(tmp_path, f"bin-subdo-{r}.vtu"))
        for da in tree.iter("DataArray"):
            assert da.get("format") == "binary"
            raw = base64.b64decode(da.text.strip())
            (nbytes,) = struct.unpack("<I", raw[:4])
            assert nbytes == len(raw) - 4
            dec = np.frombuffer(raw[4:], dtype=_VTK_DTYPE[da.get("type")])
            name = {"Position": "points", "non-linear": "non_linear"}.get(
                da.get("name") or da.get("Name"), da.get("Name")
            )
            want = np.asarray(ref[name]).ravel()
            assert dec.size == want.size, name
            np.testing.assert_allclose(
                dec.astype(np.float64),
                want.astype(np.float64),
                rtol=0, atol=0, err_msg=name,
            )


def _vtk_appended_arrays(path):
    """Parse a VTK appended-raw .vtu: {name: ndarray}."""
    import struct

    from macroc_tpu.io.vtu import _VTK_DTYPE

    raw = open(path, "rb").read()
    head, _, tail = raw.partition(b'<AppendedData encoding="raw">')
    data = tail[tail.index(b"_") + 1:]
    out = {}
    root = ET.fromstring(head.decode() + "</VTKFile>")
    for da in root.iter("DataArray"):
        off = int(da.get("offset"))
        (nbytes,) = struct.unpack("<I", data[off:off + 4])
        arr = np.frombuffer(
            data[off + 4:off + 4 + nbytes],
            dtype=_VTK_DTYPE[da.get("type")],
        )
        out[da.get("Name")] = arr
    return out


def test_vtu_appended_roundtrip(tmp_path):
    """encoding='appended' (VTK appended raw — the production default) must
    carry exactly the arrays the ascii path formats."""
    from macroc_tpu.io.vtu import _piece_arrays

    rng = np.random.default_rng(11)
    grid = StructuredGrid3D(nx=5, ny=3, nz=4, lx=4.0, ly=2.0, lz=3.0,
                            procs=(2, 1, 1))
    ne = (4, 2, 3)
    u = rng.normal(size=(5, 3, 4, 3))
    stress = rng.normal(size=ne + (8, 6))
    strain = rng.normal(size=ne + (8, 6))
    nl = rng.random(ne + (8,)) > 0.5
    cost = rng.random(ne + (8,))
    path = write_pvtu("app", grid, u, stress, strain, nl, cost, wg=0.125,
                      outdir=str(tmp_path), encoding="appended")
    assert os.path.exists(path)

    el_strain = strain.sum(axis=3) * 0.125
    el_stress = stress.sum(axis=3) * 0.125
    el_cost = cost.sum(axis=3) / 8.0
    el_nl = nl.astype(np.int64).sum(axis=3)
    for r in range(grid.nproc):
        b = grid.local_box(r)
        ref = _piece_arrays(grid, b, r, np.asarray(u, np.float64), el_strain,
                            el_stress, el_nl, el_cost)
        got = _vtk_appended_arrays(
            os.path.join(tmp_path, f"app-subdo-{r}.vtu")
        )
        for name, key in [("Position", "points"), ("connectivity",
                          "connectivity"), ("offsets", "offsets"),
                          ("types", "types"), ("displ", "displ"),
                          ("part", "part"), ("cost", "cost"),
                          ("non-linear", "non_linear"),
                          ("strain", "strain"), ("stress", "stress")]:
            want = np.asarray(ref[key]).ravel()
            np.testing.assert_allclose(
                got[name].astype(np.float64), want.astype(np.float64),
                rtol=0, atol=0, err_msg=name,
            )


def test_write_pvtu_ranks_subset_and_offset_views(tmp_path):
    """ranks= + OffsetView patches (the per-process path) must write pieces
    byte-identical to the global-array path."""
    from macroc_tpu.io.vtu import OffsetView

    rng = np.random.default_rng(5)
    grid = StructuredGrid3D(nx=6, ny=3, nz=5, lx=4.0, ly=2.0, lz=3.0,
                            procs=(2, 1, 2))
    u = rng.normal(size=(6, 3, 5, 3))
    ne = (5, 2, 4)
    el_stress = rng.normal(size=ne + (6,))
    el_strain = rng.normal(size=ne + (6,))
    el_nl = rng.integers(0, 9, size=ne)
    el_cost = rng.normal(size=ne)

    d_all = str(tmp_path / "all")
    write_pvtu("s", grid, u, el_stress, el_strain, el_nl, el_cost, grid.wg,
               outdir=d_all, reduced=True)

    # per-"process" emulation: each fake process covers half the grid in x
    # with a 2-node halo and writes only its pieces
    d_mp = str(tmp_path / "mp")
    for fake, (x0, x1, ranks) in enumerate(
        [(0, 5, [0, 2]), (1, 6, [1, 3])]
    ):
        def pv(a, lo=x0, hi=x1):
            return OffsetView(np.ascontiguousarray(a[lo:hi]), (lo, 0, 0))

        write_pvtu(
            "s", grid, pv(u), pv(el_stress), pv(el_strain), pv(el_nl),
            pv(el_cost), grid.wg, outdir=d_mp, reduced=True,
            ranks=ranks, write_master=(fake == 0),
        )
    for r in range(4):
        f = f"s-subdo-{r}.vtu"
        assert open(os.path.join(d_mp, f)).read() == open(
            os.path.join(d_all, f)
        ).read(), f
    assert open(os.path.join(d_mp, "s.pvtu")).read() == open(
        os.path.join(d_all, "s.pvtu")
    ).read()
