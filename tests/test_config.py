"""CLI flag parsing — PETSc options-database compatibility."""

from macroc_tpu.config import MacroConfig, parse_cli


def test_defaults_match_reference():
    # include/macroc.h:36-51 + src/init.c:29-64,141
    c = MacroConfig()
    assert (c.nx, c.ny, c.nz) == (40, 3, 40)
    assert (c.lx, c.ly, c.lz) == (50.0, 1.0, 50.0)
    assert c.dt == 0.001 and c.ts == 1 and c.final_time == 1.0
    assert c.u_max == -1.0 and c.vtu_freq == -1
    assert c.newton_max_its == 5
    assert c.newton_min_tol == 0.1 and c.newton_rel_tol == 1e-4
    assert c.bc_type == 1  # BC_CIRCLE (init.c:64)
    assert c.rad == 1.0
    assert (c.ksp_rtol, c.ksp_abstol, c.ksp_dtol, c.ksp_maxits) == (
        1e-5, 1e-50, 1e4, 10000,
    )
    assert c.micro_n == 2 and c.micro_type == 1
    m = c.micro_mat_1
    assert (m.E, m.nu, m.Sy, m.Ka) == (1e7, 0.25, 1e4, 1e7)


def test_reference_flags():
    c = parse_cli(
        "-da_grid_x 5 -da_grid_y 2 -da_grid_z 2 -ts 5 -dt 0.01 "
        "-bc_type 0 -newton_max_its 3 -newton_min_tol 0.5 "
        "-newton_rel_tol 1e-6 -vtu_freq 2 -lx 7 -micro_n 4".split()
    )
    assert (c.nx, c.ny, c.nz) == (5, 2, 2)
    assert c.ts == 5 and c.dt == 0.01
    assert c.bc_type == 0 and c.newton_max_its == 3
    assert c.newton_min_tol == 0.5 and c.newton_rel_tol == 1e-6
    assert c.vtu_freq == 2 and c.lx == 7.0 and c.micro_n == 4


def test_unknown_flags_ignored():
    # PETSc tolerates unknown options — the reference's own scripts pass
    # -new_its which the code never reads (SURVEY.md §5.6)
    c = parse_cli("-new_its 4 -new_tol 1.0 -da_grid_x 6 -bogus".split())
    assert c.nx == 6
    assert c.newton_max_its == 5  # untouched


def test_material_array_parsing():
    c = parse_cli(["-micro_mat_1", "2.0e7,0.3,5.0e4,2.0e7"])
    m = c.micro_mat_1
    assert (m.E, m.nu, m.Sy, m.Ka) == (2e7, 0.3, 5e4, 2e7)
    # mat_2 untouched
    assert c.micro_mat_2.E == 1e7


def test_displacement_ramp():
    # U = U_MAX * t/T (bcs.c:52-58 intent)
    c = MacroConfig(dt=0.1, final_time=1.0, u_max=-2.0)
    assert c.displacement(0) == 0.0
    assert abs(c.displacement(5) - (-1.0)) < 1e-15
