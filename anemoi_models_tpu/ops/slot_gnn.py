"""Slot-layout GNN (edge-MLP) convolution for bandwidth-ordered graphs.

The GNN flavor's hot loop — ``edges_new = MLP(cat[x_i, x_j, e]) + e`` then
scatter-sum over destinations (reference ``layers/conv.py:27-76``) — in the
same slot layout as ``ops/slot_attention.py``: destinations in static blocks,
sources gathered from one contiguous slab (one-hot MXU matmuls in the Pallas
kernel), edge features *threaded between layers in slot layout* so the
per-edge (E, C) tensor never round-trips through HBM in edge order. Aggregation
is a sum, so the slot and outlier contributions combine by addition — no
softmax merge needed.

The edge MLP runs as a pure function of an extracted flax parameter tree
(``apply_mlp_params`` mirrors ``layers/mlp.MLP`` exactly), which keeps the
parameter layout identical across ``graph_impl`` choices and lets the Pallas
branch pass weights through ``jax.custom_vjp`` explicitly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from anemoi_models_tpu.graphs.kernel_plan import EdgeKernelPlan
from anemoi_models_tpu.layers.utils import get_activation

__all__ = ["SlotEdges", "apply_mlp_params", "to_slot_edges", "planned_gnn_conv"]


class SlotEdges(NamedTuple):
    """Edge features split into kernel-plan layout (threaded across layers)."""

    slots: jnp.ndarray  # (B, R, C) slot-layout edges (masked rows are zero)
    outliers: jnp.ndarray  # (B, E_out, C) outlier-list edges


def apply_mlp_params(w: dict, x: jnp.ndarray, activation: str, dtype) -> jnp.ndarray:
    """Pure-array twin of ``layers/mlp.MLP`` (hidden layers + final LayerNorm)
    applied with an extracted flax param tree."""
    act = get_activation(activation)
    i = 0
    n_dense = sum(1 for k in w if k.startswith("Dense_"))
    while f"Dense_{i}" in w:
        d = w[f"Dense_{i}"]
        x = x @ d["kernel"].astype(dtype) + d["bias"].astype(dtype)
        if i < n_dense - 1:
            x = act(x)
        i += 1
    ln = w["AutocastLayerNorm_0"]["LayerNorm_0"]
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    x = ((x32 - mu) / jnp.sqrt(var + 1e-6)).astype(x.dtype)
    return x * ln["scale"].astype(x.dtype) + ln["bias"].astype(x.dtype)


def to_slot_edges(edge_attr: jnp.ndarray, plan: EdgeKernelPlan) -> SlotEdges:
    """Convert (B, E, C) edge-order features into the plan's slot layout."""
    from anemoi_models_tpu.ops.dense_graph import _masked_pos_take, take_rows

    num_edges = edge_attr.shape[-2]

    def adj_slots(g):
        return _masked_pos_take(g, plan.slot_of_edge, num_edges, axis=-2)

    def adj_out(g):
        return _masked_pos_take(g, plan.out_pos_of_edge, num_edges, axis=-2)

    slots = take_rows(edge_attr, plan.edge_ids, -2, adj_slots)
    slots = slots * jnp.asarray(plan.slot_mask)
    outliers = take_rows(edge_attr, plan.outlier_edge_ids, -2, adj_out)
    return SlotEdges(slots=slots, outliers=outliers)


def _slot_gnn_once(x, e_slots, w, plan: EdgeKernelPlan, activation: str):
    """Single-sample slot-path conv: (N, C), (R, C) -> (agg (N, C) fp32,
    msg (R, C)). jnp twin of the Pallas kernel."""
    n, c = x.shape
    npad, cap, nb = plan.padded_dst, plan.cap, plan.block_nodes

    from anemoi_models_tpu.ops.dense_graph import _transpose_sum, take_rows

    block_of = np.arange(npad * cap) // (nb * cap)
    gsrc = plan.slab_start.astype(np.int64)[block_of] + plan.src_slab_idx[:, 0]

    def adj_src(g):
        return _transpose_sum(g, plan.t_src, n)

    x_j = take_rows(x, gsrc, 0, adj_src)  # (R, C)
    xpad = jnp.pad(x, ((0, npad - n), (0, 0)))
    x_i = jnp.repeat(xpad, cap, axis=0)  # (R, C)

    h = apply_mlp_params(w, jnp.concatenate([x_i, x_j, e_slots], axis=-1), activation, x.dtype)
    mask = jnp.asarray(plan.slot_mask)  # (R, 1)
    msg = (h + e_slots) * mask
    agg = msg.astype(jnp.float32).reshape(npad, cap, c).sum(axis=1)[:n]
    return agg, msg


def planned_gnn_conv(
    x: jnp.ndarray,  # (B, N, C) node features (self-graph)
    edges: "SlotEdges | jnp.ndarray",  # threaded slot edges, or (B, E, C) first call
    w: dict,  # extracted MLP param tree
    plan: EdgeKernelPlan,
    activation: str = "SiLU",
    impl: str = "auto",
) -> tuple[jnp.ndarray, SlotEdges]:
    """GraphConv aggregation through the kernel plan.

    Returns ``(agg (B, N, C), edges_new SlotEdges)`` — the threading
    equivalent of the reference's ``(out, edges_new)``.
    """
    from anemoi_models_tpu.graphs.kernel_plan import MultiPassPlan

    if isinstance(plan, MultiPassPlan):
        raise ValueError(
            "planned_gnn_conv is single-pass: the GNN path threads edge "
            "state in slot layout between layers, which a multi-window "
            "chain would have to replicate per pass. Use passes=1 for the "
            "GNN flavor (multi-window plans are an attention-path feature)."
        )
    if not isinstance(edges, SlotEdges):
        edges = to_slot_edges(edges, plan)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "reference"
    n_dense = sum(1 for k in w if k.startswith("Dense_"))
    if impl == "pallas" and n_dense != 3:
        # the kernel implements the default 3-Dense edge MLP; deeper MLPs
        # (mlp_extra_layers > 0) run the jnp twin
        impl = "reference"

    o_src = plan.outlier_src
    o_dst = plan.outlier_dst

    def outlier_part(x1, e1, w):
        """(N, C), (E_out, C) -> (agg fp32, msg) via the (small) outlier list."""
        if not len(o_src):
            return jnp.zeros_like(x1, dtype=jnp.float32), e1
        from anemoi_models_tpu.ops.dense_graph import (
            TransposeBundle,
            _transpose_sum,
            bucketed_neighbor_sum,
            take_rows,
        )

        n = x1.shape[0]

        def adj_s(g):
            return _transpose_sum(g, plan.t_out_src, n)

        def adj_d(g):
            return _transpose_sum(g, plan.t_out_dst, n)

        x_j = take_rows(x1, o_src, 0, adj_s)
        x_i = take_rows(x1, o_dst, 0, adj_d)
        h = apply_mlp_params(
            w, jnp.concatenate([x_i, x_j, e1], axis=-1), activation, x1.dtype
        )
        msg = h + e1
        agg = bucketed_neighbor_sum(
            msg.astype(jnp.float32),
            plan.out_tables[0],
            plan.out_tables[1],
            transpose=TransposeBundle(plan.out_transpose),
        )
        return agg, msg

    def one(x1, e_slots1, e_out1):
        agg_s, msg_s = _slot_gnn_once(x1, e_slots1, w, plan, activation)
        agg_o, msg_o = outlier_part(x1, e_out1, w)
        return (agg_s + agg_o).astype(x1.dtype), msg_s, msg_o

    if impl != "pallas":
        agg, ms, mo = jax.vmap(one)(x, edges.slots, edges.outliers)
        return agg, SlotEdges(slots=ms, outliers=mo)

    # kernel forward, twin-recompute backward (gather-only adjoints)
    @jax.custom_vjp
    def conv(x, es, eo, w):
        def one_p(x1, e1, eo1):
            from anemoi_models_tpu.ops.pallas.gnn_conv import slot_gnn_pallas

            agg_s, msg_s = slot_gnn_pallas(x1, e1, w, plan, activation)
            agg_o, msg_o = outlier_part(x1, eo1, w)
            return (agg_s + agg_o).astype(x1.dtype), msg_s, msg_o

        # unrolled batch: Mosaic does not batch the kernel under vmap
        outs = [one_p(x[i], es[i], eo[i]) for i in range(x.shape[0])]
        return tuple(jnp.stack(t) for t in zip(*outs))

    def conv_fwd(x, es, eo, w):
        return conv(x, es, eo, w), (x, es, eo, w)

    def conv_bwd(res, g):
        x, es, eo, w = res

        def ref(x, es, eo, w):
            def one_r(x1, e1, eo1):
                agg_s, msg_s = _slot_gnn_once(x1, e1, w, plan, activation)
                agg_o, msg_o = outlier_part(x1, eo1, w)
                return (agg_s + agg_o).astype(x1.dtype), msg_s, msg_o

            return jax.vmap(one_r)(x, es, eo)

        _, vjp = jax.vjp(ref, x, es, eo, w)
        return vjp(g)

    conv.defvjp(conv_fwd, conv_bwd)
    agg, ms, mo = conv(x, edges.slots, edges.outliers, w)
    return agg, SlotEdges(slots=ms, outliers=mo)
