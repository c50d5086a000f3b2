"""Checkpoint save/restore (orbax).

The reference repo only *hooks* checkpointing (``interface/__init__.py:40-41,
64-69`` carries metadata/supporting_arrays/uuid; actual save/load lives in
anemoi-training). Here the framework owns it: parameters + stateful processor
buffers (the persistent-buffer inclusion semantics of ``normalizer.py:104-107``
and ``imputer`` state) go through orbax; metadata/config/uuid go to a JSON
sidecar; supporting arrays to an ``.npz``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(
    path: str,
    *,
    params: Any,
    processor_state: Optional[dict] = None,
    opt_state: Any = None,
    step: Optional[int] = None,
    metadata: Optional[dict] = None,
    config: Optional[dict] = None,
    supporting_arrays: Optional[dict] = None,
    run_id: Optional[str] = None,
) -> str:
    """Write a checkpoint directory; returns the path."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)

    tree = {"params": params}
    if processor_state:
        tree["processor_state"] = processor_state
    if opt_state is not None:
        tree["opt_state"] = opt_state

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "arrays"), tree, force=True)
    ckptr.wait_until_finished()

    sidecar = {
        "step": step,
        "metadata": metadata or {},
        "config": config or {},
        "run_id": run_id,
        "format_version": 1,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(sidecar, f, default=str)

    if supporting_arrays:
        np.savez(os.path.join(path, "supporting_arrays.npz"), **supporting_arrays)
    return path


def load_checkpoint(path: str, target: Any = None) -> dict:
    """Restore a checkpoint directory into a dict.

    ``target``: optional pytree of matching structure (e.g.
    ``{"params": ..., "opt_state": ...}``) for sharded/layout-aware restore.
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        tree = ckptr.restore(os.path.join(path, "arrays"), abstract)
    else:
        tree = ckptr.restore(os.path.join(path, "arrays"))

    out = dict(tree)
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            out.update(json.load(f))
    sup_path = os.path.join(path, "supporting_arrays.npz")
    if os.path.exists(sup_path):
        with np.load(sup_path) as z:
            out["supporting_arrays"] = {k: z[k] for k in z.files}
    return out
