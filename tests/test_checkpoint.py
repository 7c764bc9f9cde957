"""Sharded checkpoint format: per-shard blocks, resharding on load, legacy
compatibility (VERDICT r2 next #5 — no global gather; memory bounded by the
local shard)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from macroc_tpu.utils import checkpoint as ckpt


def _mesh(shape, axes):
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, axes)


def _tree(dtype=jnp.float64):
    u = jnp.arange(8 * 4 * 8 * 3, dtype=dtype).reshape(8, 4, 8, 3)
    eps = jnp.arange(8 * 4 * 8 * 8 * 6, dtype=dtype).reshape(8, 4, 8, 8, 6)
    return (u, {"eps_p": eps, "step_scalar": jnp.asarray(3.0, dtype)})


def test_roundtrip_single_device(tmp_path):
    tree = _tree()
    path = ckpt.save(str(tmp_path), 7, tree)
    assert os.path.isdir(path) and path.endswith("step_7")
    step, loaded = ckpt.load_latest(str(tmp_path), tree)
    assert step == 7
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_save_has_one_block_per_shard(tmp_path):
    mesh = _mesh((2, 1, 4), ("x", "y", "z"))
    s = NamedSharding(mesh, P("x", "y", "z"))
    tree = jax.tree.map(lambda a: jax.device_put(a, s) if a.ndim else a,
                        _tree())
    ckpt.save(str(tmp_path), 1, tree)
    import json

    with open(tmp_path / "step_1" / "proc_0.json") as f:
        blocks = json.load(f)["blocks"]
    # 8 devices x 2 sharded leaves + 1 replicated scalar (replica 0 only)
    n_u = sum(1 for b in blocks if b["leaf"] == 0)
    assert n_u == 8
    starts = sorted(tuple(b["start"]) for b in blocks if b["leaf"] == 0)
    assert starts[0] == (0, 0, 0, 0) and starts[-1] == (4, 0, 6, 0)
    # scalar leaf saved exactly once despite 8-way replication
    scalar_blocks = [b for b in blocks if b["leaf"] == 2]
    assert len(scalar_blocks) == 1


def test_load_under_different_decomposition(tmp_path):
    """A checkpoint written under a (2,1,4) mesh restores bit-exact under
    (4,1,2) — the resume-with-different-rank-count case."""
    tree = _tree()
    s_a = NamedSharding(_mesh((2, 1, 4), ("x", "y", "z")), P("x", "y", "z"))
    tree_a = jax.tree.map(lambda a: jax.device_put(a, s_a) if a.ndim else a,
                          tree)
    ckpt.save(str(tmp_path), 2, tree_a)

    s_b = NamedSharding(_mesh((4, 1, 2), ("x", "y", "z")), P("x", "y", "z"))
    like = jax.tree.map(lambda a: jax.device_put(a, s_b) if a.ndim else a,
                        tree)
    step, loaded = ckpt.load_latest(str(tmp_path), like)
    assert step == 2
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the loaded arrays actually carry the NEW sharding
    u_loaded = loaded[0]
    assert u_loaded.sharding.is_equivalent_to(s_b, u_loaded.ndim)


def test_legacy_flat_npz_still_loads(tmp_path):
    tree = _tree()
    leaves = jax.tree.leaves(tree)
    np.savez(
        tmp_path / "step_5.npz",
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    step, loaded = ckpt.load_latest(str(tmp_path), tree)
    assert step == 5
    for a, b in zip(leaves, jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_prefers_highest_step(tmp_path):
    tree = _tree()
    ckpt.save(str(tmp_path), 1, tree)
    tree2 = jax.tree.map(lambda a: a + 1, tree)
    ckpt.save(str(tmp_path), 10, tree2)
    step, loaded = ckpt.load_latest(str(tmp_path), tree)
    assert step == 10
    np.testing.assert_array_equal(
        np.asarray(loaded[0]), np.asarray(tree2[0])
    )


def test_partial_coverage_raises(tmp_path):
    tree = _tree()
    ckpt.save(str(tmp_path), 3, tree)
    # corrupt: drop a block from the index
    import json

    idx_path = tmp_path / "step_3" / "proc_0.json"
    with open(idx_path) as f:
        idx = json.load(f)
    idx["blocks"] = idx["blocks"][1:]
    with open(idx_path, "w") as f:
        json.dump(idx, f)
    with pytest.raises(ValueError, match="not fully covered"):
        ckpt.load(str(tmp_path / "step_3"), tree)


def test_load_latest_falls_back_to_old_after_midpublish_crash(tmp_path):
    """A crash between save's move-aside (step_<N> -> step_<N>.old) and
    the staging publish leaves only the .old copy; resume must use it
    instead of silently falling back to an older step (ADVICE r4)."""
    import os

    from macroc_tpu.utils import checkpoint

    tree1 = (jnp.arange(6.0).reshape(2, 3), jnp.ones((4,)))
    tree2 = (jnp.arange(6.0).reshape(2, 3) * 2, jnp.full((4,), 7.0))
    ck = str(tmp_path)
    checkpoint.save(ck, 1, tree1)
    checkpoint.save(ck, 2, tree2)
    # simulate the crash window: published copy moved aside, publish lost
    os.replace(
        os.path.join(ck, "step_2"), os.path.join(ck, "step_2.old")
    )
    got = checkpoint.load_latest(ck, tree1)
    assert got is not None and got[0] == 2
    for a, b in zip(got[1], tree2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a published dir still wins over a same-step .old leftover
    checkpoint.save(ck, 2, tree2)
    assert checkpoint.load_latest(ck, tree1)[0] == 2
