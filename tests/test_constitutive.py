"""Constitutive engine oracles: elasticity closed form, J2 radial return
against an independent scalar implementation, consistent tangent against
finite differences of the stress map."""

import jax.numpy as jnp
import numpy as np
import pytest

from macroc_tpu.config import MaterialParams
from macroc_tpu.constitutive import ElasticEngine, J2Engine
from macroc_tpu.constitutive.elastic import elastic_matrix
from macroc_tpu.constitutive.j2 import J2State

MAT = MaterialParams()  # E=1e7, nu=0.25, Sy=1e4, Ka=1e7 (reference defaults)


def test_elastic_matrix_isotropy():
    C = elastic_matrix(MAT)
    lam, mu = MAT.lam, MAT.mu
    assert np.isclose(C[0, 0], lam + 2 * mu)
    assert np.isclose(C[0, 1], lam)
    assert np.isclose(C[3, 3], mu)
    # uniaxial strain -> sigma_xx/eps_xx = lam+2mu
    eps = np.zeros(6)
    eps[0] = 1e-4
    sig = C @ eps
    assert np.isclose(sig[0], (lam + 2 * mu) * 1e-4)
    assert np.isclose(sig[1], lam * 1e-4)


def test_elastic_engine():
    eng = ElasticEngine(MAT, dtype=jnp.float64)
    eps = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8, 6)) * 1e-4)
    r = eng.homogenize(eps, ())
    C = elastic_matrix(MAT)
    assert np.allclose(np.asarray(r.stress), np.asarray(eps) @ C.T, atol=1e-9)
    assert not bool(np.asarray(r.non_linear).any())


def scalar_radial_return(eps, eps_p, alpha, mat):
    """Independent scalar J2 return map (tensor arithmetic, no Voigt tricks)."""
    lam, mu, Sy, Ka = mat.lam, mat.mu, mat.Sy, mat.Ka

    def to_tensor(v, eng):
        f = 0.5 if eng else 1.0
        return np.array(
            [
                [v[0], f * v[3], f * v[4]],
                [f * v[3], v[1], f * v[5]],
                [f * v[4], f * v[5], v[2]],
            ]
        )

    e = to_tensor(eps, True) - to_tensor(eps_p, True)
    sig_tr = lam * np.trace(e) * np.eye(3) + 2 * mu * e
    s = sig_tr - np.trace(sig_tr) / 3 * np.eye(3)
    snorm = np.sqrt((s * s).sum())
    f_tr = snorm - np.sqrt(2 / 3) * (Sy + Ka * alpha)
    if f_tr <= 0:
        return sig_tr, eps_p, alpha, f_tr
    dg = f_tr / (2 * mu + 2 / 3 * Ka)
    n = s / snorm
    sig = sig_tr - 2 * mu * dg * n
    eps_p_t = to_tensor(eps_p, True) + dg * n
    eps_p_new = np.array(
        [eps_p_t[0, 0], eps_p_t[1, 1], eps_p_t[2, 2],
         2 * eps_p_t[0, 1], 2 * eps_p_t[0, 2], 2 * eps_p_t[1, 2]]
    )
    alpha_new = alpha + np.sqrt(2 / 3) * dg
    return sig, eps_p_new, alpha_new, f_tr


def from_tensor(t):
    return np.array([t[0, 0], t[1, 1], t[2, 2], t[0, 1], t[0, 2], t[1, 2]])


@pytest.mark.parametrize("scale", [1e-5, 5e-4, 5e-3])
def test_j2_vs_scalar_oracle(scale):
    rng = np.random.default_rng(42)
    eng = J2Engine(MAT, dtype=jnp.float64)
    eps = rng.normal(size=(5, 6)) * scale
    eps_p0 = rng.normal(size=(5, 6)) * scale * 0.1
    alpha0 = np.abs(rng.normal(size=(5,))) * scale * 0.1
    state = J2State(eps_p=jnp.asarray(eps_p0), alpha=jnp.asarray(alpha0))
    r = eng.homogenize(jnp.asarray(eps), state)
    for i in range(5):
        sig, eps_p, alpha, f_tr = scalar_radial_return(
            eps[i], eps_p0[i], alpha0[i], MAT
        )
        assert np.allclose(np.asarray(r.stress)[i], from_tensor(sig), rtol=1e-10)
        assert np.isclose(np.asarray(r.f_trial)[i], f_tr, rtol=1e-10)
        assert np.allclose(
            np.asarray(r.trial_state.eps_p)[i], eps_p, rtol=1e-9, atol=1e-18
        )
        assert np.isclose(np.asarray(r.trial_state.alpha)[i], alpha, rtol=1e-10)
        assert bool(np.asarray(r.non_linear)[i]) == (f_tr > 0)


def test_j2_consistent_tangent_fd():
    """ctan must be the derivative d sigma / d eps of the return map."""
    rng = np.random.default_rng(1)
    eng = J2Engine(MAT, dtype=jnp.float64)
    # strain large enough to be solidly plastic
    eps0 = rng.normal(size=(6,)) * 3e-3
    state = J2State(eps_p=jnp.zeros(6), alpha=jnp.asarray(0.0))
    r0 = eng.homogenize(jnp.asarray(eps0), state)
    assert bool(r0.non_linear)
    h = 1e-7
    fd = np.zeros((6, 6))
    for j in range(6):
        ep = eps0.copy()
        em = eps0.copy()
        ep[j] += h
        em[j] -= h
        sp = np.asarray(eng.homogenize(jnp.asarray(ep), state).stress)
        sm = np.asarray(eng.homogenize(jnp.asarray(em), state).stress)
        fd[:, j] = (sp - sm) / (2 * h)
    ct = np.asarray(r0.ctan)
    assert np.allclose(ct, fd, rtol=2e-4, atol=1e-2 * np.abs(fd).max())


def test_j2_uniaxial_yield_and_hardening():
    """Monotonic uniaxial strain: stress leaves the elastic line at yield and
    continues with the hardening slope; update_vars commits state."""
    eng = J2Engine(MAT, dtype=jnp.float64)
    state = eng.init_state(())
    stresses = []
    n_steps, de = 60, 5e-5  # yield is crossed around step ~25
    for i in range(1, n_steps + 1):
        eps = jnp.asarray([i * de, 0, 0, 0, 0, 0], dtype=jnp.float64)
        r = eng.homogenize(eps, state)
        state = r.trial_state  # update_vars
        stresses.append(float(r.stress[0]))
    s = np.array(stresses)
    dsig = np.diff(s)
    assert dsig[-1] != pytest.approx(dsig[0])  # yield actually crossed
    # initial slope = lam + 2 mu; post-yield slope strictly smaller, positive
    el_slope = (MAT.lam + 2 * MAT.mu) * de
    assert np.allclose(dsig[:5], el_slope, rtol=1e-9)
    assert dsig[-1] < 0.9 * el_slope
    assert dsig[-1] > 0  # hardening
    # with history committed, the response stays on the hardening branch
    assert np.all(np.diff(dsig[-10:]) < 1e-6 * el_slope)


def test_j2_elastic_unloading():
    """After plastic loading, a small strain reversal must be elastic."""
    eng = J2Engine(MAT, dtype=jnp.float64)
    state = eng.init_state(())
    eps = jnp.asarray([3e-3, 0, 0, 0, 0, 0], dtype=jnp.float64)
    r = eng.homogenize(eps, state)
    assert bool(r.non_linear)
    state = r.trial_state
    eps2 = eps.at[0].add(-1e-4)  # unload along the loading direction
    r2 = eng.homogenize(eps2, state)
    assert not bool(r2.non_linear)
    C = elastic_matrix(MAT)
    dsig = np.asarray(r2.stress) - np.asarray(r.stress)
    assert np.allclose(dsig, C @ (np.asarray(eps2 - eps)), rtol=1e-8)


def test_make_engine_auto_routing():
    """constitutive='auto' (the default) must pick the engine the FLAGS
    describe: micro-FE whenever mat_1 != mat_2 and the geometry actually
    places material 2, closed-form J2 otherwise (VERDICT r1 #4: a
    reference launch line with -micro_mat_2 previously computed the wrong
    physics unless the user added a non-reference flag)."""
    import jax.numpy as jnp

    from macroc_tpu.config import MIC_HOMOGENEOUS, MacroConfig, MaterialParams
    from macroc_tpu.constitutive import J2Engine, make_engine
    from macroc_tpu.constitutive.microfe import MicroFEEngine

    soft = MaterialParams(E=1e6, nu=0.3, Sy=5e3, Ka=2e6)
    # heterogeneous flags -> micro-FE
    cfg = MacroConfig(micro_mat_2=soft, micro_type=1, micro_n=4)
    assert isinstance(make_engine(cfg, jnp.float64), MicroFEEngine)
    # identical materials (the reference default) -> closed form is exact
    assert isinstance(make_engine(MacroConfig(), jnp.float64), J2Engine)
    # different materials but geometry never places material 2 -> J2
    cfg = MacroConfig(micro_mat_2=soft, micro_type=MIC_HOMOGENEOUS)
    assert isinstance(make_engine(cfg, jnp.float64), J2Engine)
