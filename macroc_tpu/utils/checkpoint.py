"""Sharded checkpoint/resume of (u, constitutive internal-variable state).

TPU-native addition (the reference has NO restart capability; production
runs are 10,000 steps — SURVEY.md §5.4, scripts/launch_jobs.sh:56).

Format: a ``step_<N>/`` DIRECTORY holding one ``proc_<p>.npz`` per jax
process plus a ``proc_<p>.json`` index.  Every process writes ONLY the
addressable shards of each pytree leaf (deduplicated by ``replica_id == 0``)
— no ``process_allgather``, so peak host memory is bounded by the LOCAL
shard even for production FE² state (~7 GB of micro internal variables at
50x3x50/micro_n=10; VERDICT r2 weak #3).  Publication is atomic: shards are
written into ``step_<N>.writing/``, a cross-process barrier confirms every
piece landed, and the primary renames the directory.

Resume reassembles each leaf with ``jax.make_array_from_callback`` against
the CALLER's sharding: every process materializes only the slices its
devices address, reading them out of whichever proc files cover them — so a
checkpoint written by P processes restores under any process count.

Legacy round-2 single-file ``step_<N>.npz`` checkpoints still load.

REQUIREMENT: ``ckpt_dir`` must be a filesystem shared by all processes
(NFS/GCS-fuse/lustre — standard on pods and the reference's SLURM clusters):
``load`` reads every ``proc_<p>.npz`` regardless of which process wrote it,
and the atomic publish assumes one directory visible to all.  A missing
shard file fails loudly at load (see _BlockReader.read).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

_STEP_DIR_RE = re.compile(r"step_(\d+)$")
_STEP_NPZ_RE = re.compile(r"step_(\d+)\.npz$")
_STEP_OLD_RE = re.compile(r"step_(\d+)\.old$")


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def _addressable_blocks(leaf) -> List[Tuple[Tuple[int, ...], np.ndarray]]:
    """(start_offsets, data) for every addressable, non-replicated shard of
    a leaf.  Host numpy / fully-replicated jax arrays count as one block
    owned by process 0."""
    if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
        shards = leaf.addressable_shards
        blocks = []
        for s in shards:
            if s.replica_id != 0:
                continue  # another device holds the identical copy
            starts = tuple(
                (sl.start or 0) for sl in s.index
            ) if s.index else (0,) * leaf.ndim
            blocks.append((starts, np.asarray(s.data)))
        return blocks
    if jax.process_index() == 0:
        a = np.asarray(leaf)
        return [((0,) * a.ndim, a)]
    return []


def _barrier(tag: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def save(ckpt_dir: str, step: int, tree: Any, write: bool = True) -> str:
    """Save a pytree at ``ckpt_dir/step_<N>/`` (per-process shard files).

    Every process participates and writes its own shards; ``write`` is
    retained for API compatibility but no longer gates participation.
    Returns the published directory path."""
    del write
    final = os.path.join(ckpt_dir, f"step_{step}")
    staging = final + ".writing"
    pid = jax.process_index()
    # a crashed earlier save (possibly under a different process count) may
    # have left stale proc_<p> files in the staging dir; publishing them
    # alongside fresh ones would make resume fail with overlap overcount —
    # the primary clears the dir before anyone writes
    if pid == 0 and os.path.isdir(staging):
        import shutil

        shutil.rmtree(staging)
    _barrier(f"ckpt_clean_{step}")
    os.makedirs(staging, exist_ok=True)

    leaves, _ = _flatten(tree)
    index: Dict[str, Any] = {"blocks": []}
    arrays: Dict[str, np.ndarray] = {}
    for i, leaf in enumerate(leaves):
        for j, (starts, data) in enumerate(_addressable_blocks(leaf)):
            key = f"l{i}_b{j}"
            arrays[key] = data
            index["blocks"].append(
                dict(leaf=i, key=key, start=list(starts),
                     shape=list(data.shape))
            )
    npz_tmp = os.path.join(staging, f"proc_{pid}.npz.tmp")
    with open(npz_tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(npz_tmp, os.path.join(staging, f"proc_{pid}.npz"))
    with open(os.path.join(staging, f"proc_{pid}.json"), "w") as f:
        json.dump(index, f)

    _barrier(f"ckpt_save_{step}")
    if pid == 0:
        import shutil

        # overwrite without a destruction window: move the old step aside,
        # publish, then drop the old copy — a crash at any point leaves at
        # least one complete copy on disk (step_<N> or step_<N>.old)
        old = final + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(final):
            os.replace(final, old)
        os.replace(staging, final)  # atomic publish
        if os.path.isdir(old):
            shutil.rmtree(old)
    _barrier(f"ckpt_publish_{step}")
    return final


class _BlockReader:
    """Lazily opens proc_<p>.npz files and serves global-index slices
    assembled from the saved blocks of one leaf."""

    def __init__(self, ckpt_dir: str):
        self.dir = ckpt_dir
        self._files: Dict[str, Any] = {}
        # leaf id -> [(start, shape, file, key)]
        self.blocks: Dict[int, List[Tuple]] = {}
        for name in sorted(os.listdir(ckpt_dir)):
            if not (name.startswith("proc_") and name.endswith(".json")):
                continue
            with open(os.path.join(ckpt_dir, name)) as f:
                idx = json.load(f)
            npz = name[: -len(".json")] + ".npz"
            for b in idx["blocks"]:
                self.blocks.setdefault(b["leaf"], []).append(
                    (tuple(b["start"]), tuple(b["shape"]), npz, b["key"])
                )

    def _data(self, npz: str, key: str) -> np.ndarray:
        if npz not in self._files:
            self._files[npz] = np.load(os.path.join(self.dir, npz))
        return self._files[npz][key]

    def read(self, leaf: int, index: Tuple[slice, ...],
             shape: Tuple[int, ...], dtype) -> np.ndarray:
        """Materialize global slice `index` of a leaf from its blocks."""
        sls = tuple(sl.indices(n) for sl, n in zip(index, shape))
        starts = [s for s, _, _ in sls]
        sizes = [e - s for s, e, _ in sls]
        out = np.zeros(sizes, dtype=dtype)
        filled = 0
        for bstart, bshape, npz, key in self.blocks.get(leaf, []):
            # overlap of [bstart, bstart+bshape) with [starts, starts+sizes)
            lo = [max(bs, s) for bs, s in zip(bstart, starts)]
            hi = [
                min(bs + bn, s + n)
                for bs, bn, s, n in zip(bstart, bshape, starts, sizes)
            ]
            if any(l >= h for l, h in zip(lo, hi)):
                continue
            src = tuple(
                slice(l - bs, h - bs) for l, h, bs in zip(lo, hi, bstart)
            )
            dst = tuple(
                slice(l - s, h - s) for l, h, s in zip(lo, hi, starts)
            )
            out[dst] = self._data(npz, key)[src]
            filled += int(np.prod([h - l for l, h in zip(lo, hi)]))
        if filled != int(np.prod(sizes)):
            raise ValueError(
                f"checkpoint {self.dir}: leaf {leaf} slice {index} not fully "
                "covered by saved shards — if this is a multi-host run, "
                "check that the checkpoint dir is on a filesystem shared by "
                "ALL processes (each proc_<p>.npz must be readable here)"
            )
        return out

    def close(self):
        for f in self._files.values():
            f.close()


def _restore_leaf(reader: _BlockReader, i: int, like) -> Any:
    import jax.numpy as jnp

    la = np.asarray(like) if not isinstance(like, jax.Array) else like
    shape, dtype = tuple(la.shape), la.dtype
    sharding = getattr(like, "sharding", None)
    if (
        isinstance(like, jax.Array)
        and sharding is not None
        and len(getattr(sharding, "device_set", [None])) > 1
    ):
        # distributed target: each device fetches only its own slice
        return jax.make_array_from_callback(
            shape,
            sharding,
            lambda idx: reader.read(i, idx, shape, dtype),
        )
    full = reader.read(i, (slice(None),) * len(shape), shape, dtype)
    return jnp.asarray(full)


def load(path: str, like: Any) -> Any:
    """Load a pytree saved by `save`, using `like` for structure, dtypes and
    (for jax.Array leaves) the target sharding.  Accepts both the sharded
    directory format and the legacy single-file .npz."""
    leaves, treedef = _flatten(like)
    if os.path.isdir(path):
        reader = _BlockReader(path)
        try:
            new = [
                _restore_leaf(reader, i, l) for i, l in enumerate(leaves)
            ]
        finally:
            reader.close()
        return jax.tree_util.tree_unflatten(treedef, new)
    # legacy flat npz
    import jax.numpy as jnp

    with np.load(path) as data:
        new = [
            jnp.asarray(
                np.asarray(data[f"leaf_{i}"]).astype(np.asarray(l).dtype)
            )
            for i, l in enumerate(leaves)
        ]
    return jax.tree_util.tree_unflatten(treedef, new)


def load_latest(ckpt_dir: str, like: Any) -> Optional[Tuple[int, Any]]:
    """(step, tree) of the newest checkpoint in ckpt_dir, or None.

    ``step_<N>.old`` directories (the previous copy that `save` moves aside
    during its atomic overwrite) count as valid fallbacks when the
    published ``step_<N>`` is absent: a crash between the move-aside and
    the publish leaves ONLY the .old copy, which is the complete previous
    checkpoint (ADVICE r4: resume used to silently skip it)."""
    if not os.path.isdir(ckpt_dir):
        return None
    cands: Dict[int, Tuple[int, str]] = {}  # step -> (priority, path)
    for name in os.listdir(ckpt_dir):
        full = os.path.join(ckpt_dir, name)
        if _STEP_DIR_RE.match(name) and os.path.isdir(full):
            s, prio = int(_STEP_DIR_RE.match(name).group(1)), 1
        elif _STEP_NPZ_RE.match(name):
            s, prio = int(_STEP_NPZ_RE.match(name).group(1)), 1
        elif _STEP_OLD_RE.match(name) and os.path.isdir(full):
            s, prio = int(_STEP_OLD_RE.match(name).group(1)), 0
        else:
            continue
        if s not in cands or prio > cands[s][0]:
            cands[s] = (prio, full)
    if not cands:
        return None
    best_step = max(cands)
    return best_step, load(cands[best_step][1], like)
