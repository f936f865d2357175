"""Checkpoint / resume: serialize framework pytrees to .npz.

The reference has no checkpointing (SURVEY.md §5); here every long-lived
object — preconditioner factors (the expensive one-time LDL^T), solver
results, GHN caches — is a pytree of arrays plus static metadata, so a
checkpoint is a flat array archive plus a treedef signature.  Typical use:
factorize once, ``save_pytree(M, path)``, and reload across processes /
restarts without re-running the factorization.
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def _encode_meta(treedef) -> str:
    return str(treedef)


def save_pytree(tree, path: str) -> None:
    """Serialize a pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        _encode_meta(treedef).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_pytree(template, path: str):
    """Load arrays saved by ``save_pytree`` into ``template``'s structure.

    ``template`` supplies the treedef and static metadata (pytrees carry
    non-array configuration in aux data, which .npz cannot hold); its array
    leaves are replaced by the checkpointed ones.  The stored treedef
    signature is checked against the template's.
    """
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    stored_sig = bytes(data["__treedef__"]).decode()
    if stored_sig != _encode_meta(treedef):
        raise ValueError(
            "checkpoint structure mismatch:\n"
            f"  stored:   {stored_sig[:200]}\n"
            f"  template: {_encode_meta(treedef)[:200]}")
    n = len(leaves)
    new_leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
