"""Checkpoint/resume — component C16 (SURVEY.md sections 2, 5).

The reference has no checkpointing [SURVEY.md section 5]; this is new
surface for long multi-host jobs: atomically persist optimizer state, chain
state (positions, step size, mass matrix, RNG keys), and configs. Uses
orbax-style atomic directory swap over numpy archives — dependency-free and
multi-host safe (only process 0 writes; restore is collective-free).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save(path, tree, step=None, extra_json=None):
    """Atomically save a pytree of arrays to `path` (a directory)."""
    if jax.process_index() != 0:
        return
    leaves, treedef = _flatten(tree)
    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=parent, prefix=".ckpt_tmp_")
    try:
        np.savez(
            os.path.join(tmp, "arrays.npz"),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
        )
        meta = {
            "treedef": str(treedef),
            "num_leaves": len(leaves),
            "step": step,
            "extra": extra_json or {},
        }
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
        # Atomic replace: move any existing checkpoint ASIDE first (rename,
        # not rmtree), swing tmp into place, then delete the old one — a
        # crash at any point leaves either the old or the new checkpoint
        # restorable, never neither. Works whether `path` was a directory or
        # a stray regular file.
        old = path.rstrip(os.sep) + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)  # stale leftover from a previous crash
        elif os.path.exists(old):
            os.remove(old)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)
        elif os.path.exists(old):
            os.remove(old)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def peek_meta(path):
    """Read a checkpoint's meta.json without restoring arrays.

    Lets callers build the restore probe tree from the saved key names
    (e.g. GP.load deciding whether log_alpha is present). Returns the meta
    dict, or None if no checkpoint exists at path (or its .old fallback).
    """
    for p in (path, path.rstrip(os.sep) + ".old"):
        mp = os.path.join(p, "meta.json")
        if os.path.exists(mp) and os.path.exists(os.path.join(p, "arrays.npz")):
            with open(mp) as f:
                return json.load(f)
    return None


def restore(path, example_tree):
    """Restore a pytree saved by `save`, shaped like example_tree.

    Returns (tree, meta) or (None, None) if path doesn't exist.
    """
    if not os.path.exists(os.path.join(path, "arrays.npz")):
        # crash mid-swap in save() can leave only the renamed-aside copy
        old = path.rstrip(os.sep) + ".old"
        if os.path.exists(os.path.join(old, "arrays.npz")):
            path = old
        else:
            return None, None
    blob = np.load(os.path.join(path, "arrays.npz"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    leaves, treedef = _flatten(example_tree)
    if meta["num_leaves"] != len(leaves):
        raise ValueError(
            f"checkpoint has {meta['num_leaves']} leaves, example tree has "
            f"{len(leaves)}")
    new_leaves = [blob[f"leaf_{i}"] for i in range(len(leaves))]
    restored = jax.tree.unflatten(treedef, new_leaves)
    return restored, meta
