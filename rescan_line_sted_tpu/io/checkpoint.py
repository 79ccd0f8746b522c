"""Checkpoint / resume for long sweeps (SURVEY.md section 6).

The reference has no checkpointing (scripts rerun from scratch); the rebuild
checkpoints per-chunk sweep results to ``.npz`` so an interrupted dose/FOV
sweep resumes where it stopped. Generic pytree state (e.g. a mid-RL estimate
or accumulated canvas) can also be saved/loaded.

No orbax dependency: sweeps produce small host-side arrays and a flat npz is
simpler, inspectable, and has no async machinery to misuse.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(tree) -> tuple[dict[str, np.ndarray], str]:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    return arrays, str(treedef)


def save_state(path: str, tree) -> None:
    """Save any pytree of arrays to ``path`` (.npz)."""
    arrays, treedef = _flatten(tree)
    np.savez(path, __treedef__=np.asarray(treedef), **arrays)


def load_state(path: str, like):
    """Load a pytree saved by :func:`save_state`; ``like`` gives the structure.

    Raises ``ValueError`` if the stored treedef or any leaf shape/dtype
    disagrees with ``like`` -- resuming after a config change must fail
    loudly, not silently misassign leaves.
    """
    with np.load(path, allow_pickle=False) as data:
        leaves, treedef = jax.tree.flatten(like)
        stored_def = str(data["__treedef__"])
        if stored_def != str(treedef):
            raise ValueError(
                f"checkpoint {path!r} treedef mismatch:\n"
                f"  stored:   {stored_def}\n  expected: {treedef}")
        loaded = []
        for i, leaf in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            want_shape = np.shape(leaf)
            want_dtype = np.asarray(leaf).dtype
            if arr.shape != want_shape or arr.dtype != want_dtype:
                raise ValueError(
                    f"checkpoint {path!r} leaf {i} mismatch: stored "
                    f"{arr.dtype}{list(arr.shape)}, expected "
                    f"{want_dtype}{list(want_shape)}")
            loaded.append(arr)
        return jax.tree.unflatten(treedef, loaded)


class SweepCheckpoint:
    """Chunked-sweep checkpoint directory.

    Usage::

        ckpt = SweepCheckpoint(dir)
        for i, chunk in enumerate(chunks):
            if ckpt.has(i):
                results.append(ckpt.load(i, like=example))
                continue
            out = run(chunk)
            ckpt.save(i, out)
            results.append(out)
    """

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self._meta_path = os.path.join(directory, "meta.json")

    def _chunk_path(self, i: int) -> str:
        return os.path.join(self.directory, f"chunk_{i:05d}.npz")

    def has(self, i: int) -> bool:
        return os.path.exists(self._chunk_path(i))

    def save(self, i: int, tree) -> None:
        tmp = self._chunk_path(i) + ".tmp.npz"
        save_state(tmp, tree)
        os.replace(tmp, self._chunk_path(i))  # atomic: no torn checkpoints

    def load(self, i: int, like):
        return load_state(self._chunk_path(i), like)

    def completed(self) -> list[int]:
        out = []
        for name in os.listdir(self.directory):
            # strictly chunk_<digits>.npz: a stale chunk_*.npz.tmp.npz left
            # by an interrupted save must not crash (or count as) a resume
            stem = name[len("chunk_"):-len(".npz")]
            if (name.startswith("chunk_") and name.endswith(".npz")
                    and stem.isdigit()):
                out.append(int(stem))
        return sorted(out)

    def write_meta(self, **meta) -> None:
        with open(self._meta_path, "w") as f:
            json.dump(meta, f, indent=2)

    def read_meta(self) -> dict:
        if not os.path.exists(self._meta_path):
            return {}
        with open(self._meta_path) as f:
            return json.load(f)
