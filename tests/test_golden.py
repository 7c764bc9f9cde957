"""Golden regression: residual traces, KSP iteration counts, forces and
displacement norms of canonical configs must match the blessed values
(tests/goldens/*.json; regenerate deliberately with make_goldens.py).

This replaces the reference's stable-vs-develop stdout diffing
(tests/compare_test.sh) with structured comparisons at solver tolerance.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from make_goldens import CONFIGS, GOLDEN_DIR, run_config  # noqa: E402
# (pytest puts tests/ on sys.path; make_goldens is import-safe under the
# conftest-configured CPU platform)


def _load(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.json")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated (run tests/make_goldens.py)")
    with open(path) as f:
        return json.load(f)


@pytest.mark.parametrize("name", list(CONFIGS))
def test_golden(name):
    golden = _load(name)
    got = run_config(CONFIGS[name])
    assert len(got["steps"]) == len(golden["steps"])
    for gs, es in zip(got["steps"], golden["steps"]):
        assert gs["ksp_its"] == es["ksp_its"], f"ts {es['ts']}: KSP its"
        assert gs["nl_gps"] == es["nl_gps"]
        assert gs["converged"] == es["converged"]
        assert np.allclose(gs["res_norms"], es["res_norms"], rtol=1e-8), (
            f"ts {es['ts']}: residual trace {gs['res_norms']} != "
            f"{es['res_norms']}"
        )
        assert np.isclose(gs["force"], es["force"], rtol=1e-8, atol=1e-12)
        assert np.isclose(
            gs["f_trial_max"], es["f_trial_max"], rtol=1e-8, atol=1e-12
        )
    assert np.isclose(got["u_norm"], golden["u_norm"], rtol=1e-9)
    assert np.isclose(got["u_min"], golden["u_min"], rtol=1e-8, atol=1e-15)
    assert np.isclose(got["u_max"], golden["u_max"], rtol=1e-8, atol=1e-15)
