"""Hoist trace-time constants into runtime arguments.

The graph-table design bakes edge tables into jitted programs as HLO
literals: ``GatherTables`` / ``HaloTables`` / ``MapperShardTables`` are
static pytrees whose numpy arrays enter the trace via ``jnp.asarray`` and
lower as constants. At production scale (O1280: 61.7M encoder edges) those
literals multiply the SPMD partitioner's host memory and the program size —
the round-4 O1280 train step OOM-killed a 125 GB compile host at lowering.

Measured fact (``examples/const_diag.py``): every such table is a
*top-level* jaxpr constant — none are buried inside remat / custom_vjp /
shard_map sub-jaxprs (those all take layout arrays as primal args). So a
mechanical hoist suffices: trace the function once, then replay its jaxpr
with the constants passed as ordinary runtime arguments. The lowered
program then receives the tables as parameters (device buffers fed once),
not literals.

This recovers, at the jit boundary, what the reference gets from buffer
registration — edge tensors live in the state dict, not the program
(``/root/reference/src/anemoi/models/layers/mapper.py:119-148``).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.core as core

__all__ = ["hoist_constants"]


def hoist_constants(
    fn: Callable, *example_args: Any
) -> tuple[Callable, list[Any]]:
    """Split ``fn``'s trace-time constants out as runtime arguments.

    Returns ``(wrapped, consts)`` with ``wrapped(consts, *args) ==
    fn(*args)``; ``consts`` is the list of constant arrays the trace
    captured (graph tables, edge attributes, coordinate buffers, ...).

    ``example_args`` may be concrete arrays or ``jax.ShapeDtypeStruct``s;
    later calls must use the same pytree structure / shapes. Differentiation
    must already be *inside* ``fn`` (replaying a jaxpr is not a
    differentiable wrapper) — hoist a train step, not a loss. Sharding
    constraints recorded in the trace replay unchanged, so run the trace
    under the same mesh you will compile under.
    """
    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*example_args)
    out_tree = jax.tree_util.tree_structure(out_shape)
    consts = list(closed.consts)

    def wrapped(consts: Sequence[Any], *args: Any):
        flat, _ = jax.tree_util.tree_flatten(args)
        out = core.eval_jaxpr(closed.jaxpr, list(consts), *flat)
        return jax.tree_util.tree_unflatten(out_tree, out)

    return wrapped, consts
