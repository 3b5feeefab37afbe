"""Checkpoint / resume of params + optimizer state.

The reference has no model save/load at all (SURVEY.md §5 — training runs
a fixed iteration count and prints timings).  On TPU this is cheap to add
and required for elastic multi-host recovery, so it is a first-class
capability here.  Orbax is used when importable; a portable npz fallback
covers minimal environments.
"""
from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(path: str, params, opt_state=None, step: int = 0) -> str:
    """Write a checkpoint directory (orbax) or .npz file (fallback)."""
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        payload = {"params": params, "step": np.int64(step)}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        ckptr.save(path, payload, force=True)
        return path
    except Exception:
        leaves, treedef = _flatten(
            {"params": params, "opt_state": opt_state, "step": step}
        )
        arrs = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves) if l is not None}
        np.savez(path if path.endswith(".npz") else path + ".npz", **arrs)
        return path if path.endswith(".npz") else path + ".npz"


def load_checkpoint(path: str, like=None):
    """Load a checkpoint saved by save_checkpoint.

    like: an example pytree {'params': ..., 'opt_state': ..., 'step': ...}
    used to restore structure (required for the npz fallback, recommended
    for orbax).
    """
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        if like is not None:
            return ckptr.restore(os.path.abspath(path), item=like)
        return ckptr.restore(os.path.abspath(path))
    except Exception:
        if like is None:
            raise
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        leaves, treedef = _flatten(like)
        new_leaves = []
        j = 0
        for leaf in leaves:
            if leaf is None:
                new_leaves.append(None)
            else:
                new_leaves.append(data[f"leaf_{j}"])
                j += 1
        return jax.tree_util.tree_unflatten(treedef, new_leaves)
