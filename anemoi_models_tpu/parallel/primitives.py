"""Explicit collective primitives matching the reference distributed API.

The reference exposes five grid-sharding primitives with hand-written
autograd pairings (``distributed/graph.py:20-137``, ``distributed/
primitives.py:21-143``): ``shard_tensor``, ``gather_tensor``, ``sync_tensor``,
``reduce_shard_tensor``, ``reduce_tensor``. In the GSPMD design these are
normally *implicit* (sharding constraints, ``parallel/api.py``); this module
provides the explicit equivalents for code that wants reference-API parity or
manual control inside ``shard_map`` regions. Adjoints come from JAX AD — no
hand-written backward passes.

Outside a mesh/shard_map context every primitive is the identity, mirroring
the reference's ``model_comm_group=None`` short-circuit
(``primitives.py:42-44``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from anemoi_models_tpu.parallel.api import constrain, get_mesh

__all__ = [
    "shard_tensor",
    "gather_tensor",
    "sync_tensor",
    "reduce_shard_tensor",
    "reduce_tensor",
    "get_shape_shards",
    "change_channels_in_shape",
]


def _axis_active(axis: str) -> bool:
    mesh = get_mesh()
    return mesh is not None and axis in mesh.axis_names and mesh.shape[axis] > 1


def shard_tensor(x: jnp.ndarray, dim: int = 0, axis: str = "model") -> jnp.ndarray:
    """Constrain ``x`` to be sharded along ``dim`` over the mesh ``axis``.

    GSPMD equivalent of reference ``shard_tensor`` (``distributed/graph.py:20``):
    forward split / backward gather falls out of AD through the constraint.
    """
    if not _axis_active(axis):
        return x
    spec = tuple(axis if i == dim % x.ndim else None for i in range(x.ndim))
    return constrain(x, spec)


def gather_tensor(x: jnp.ndarray, dim: int = 0, axis: str = "model") -> jnp.ndarray:
    """Constrain ``x`` to be replicated (gathered) along the mesh ``axis``.

    Equivalent of reference ``gather_tensor`` (``graph.py:47``): forward
    all-gather / backward split.
    """
    if not _axis_active(axis):
        return x
    return constrain(x, (None,) * x.ndim)


def sync_tensor(x: jnp.ndarray, dim: int = 0, axis: str = "model") -> jnp.ndarray:
    """Full-tensor view for local computation: forward all-gather with the
    reduce+re-shard adjoint (reference ``graph.py:92-113``). Under GSPMD this
    is ``gather_tensor``; AD produces the paired reduce-scatter.
    """
    return gather_tensor(x, dim, axis)


def reduce_shard_tensor(x: jnp.ndarray, dim: int = 0, axis: str = "model") -> jnp.ndarray:
    """Reduce partial results then shard (reference ``graph.py:70-89``)."""
    return shard_tensor(x, dim, axis)


def reduce_tensor(x: jnp.ndarray, axis: str = "model", axis_name: Optional[str] = None) -> jnp.ndarray:
    """All-reduce (sum). Inside ``shard_map`` pass ``axis_name`` for an
    explicit fp32 ``psum`` (the reference's fp32-allreduce option,
    ``primitives.py:112-143``); under plain GSPMD it's a replication
    constraint.
    """
    if axis_name is not None:
        dtype = x.dtype
        return jax.lax.psum(x.astype(jnp.float32), axis_name).astype(dtype)
    return gather_tensor(x, 0, axis)


def get_shape_shards(x: jnp.ndarray, dim: int, num_shards: int) -> list[tuple[int, ...]]:
    """Per-shard shapes under tensor_split semantics (reference
    ``distributed/shapes.py:19-24``)."""
    base, rem = divmod(x.shape[dim], num_shards)
    shapes = []
    for i in range(num_shards):
        size = base + (1 if i < rem else 0)
        shapes.append(tuple(size if d == dim else s for d, s in enumerate(x.shape)))
    return shapes


def change_channels_in_shape(shapes: list[tuple[int, ...]], channels: int) -> list[tuple[int, ...]]:
    """Swap the channel (last) dim of every shard shape (reference
    ``shapes.py:27-29``)."""
    return [tuple(list(s[:-1]) + [channels]) for s in shapes]
