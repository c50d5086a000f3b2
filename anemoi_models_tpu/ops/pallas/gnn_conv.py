"""Fused Pallas TPU kernel for the slot-layout GNN (edge-MLP) convolution.

The GNN flavor's hot loop (reference ``layers/conv.py:27-76``): per
destination block, DMA one contiguous source slab HBM→VMEM, materialize
``x_i``/``x_j`` by one-hot matmuls on the MXU, run the edge MLP
(Dense→act→Dense→act→Dense→LayerNorm, fp32 statistics) entirely in VMEM,
add the threaded slot edge features, mask, and group-sum into the
destinations. Neither the (E, 3C) MLP input nor the (E, C) message tensor
ever exists in HBM — only the (R, C) slot-layout edges stream through,
and those are reused as the next layer's edge features
(``ops/slot_gnn.SlotEdges``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anemoi_models_tpu.graphs.kernel_plan import EdgeKernelPlan
from anemoi_models_tpu.layers.utils import get_activation

__all__ = ["slot_gnn_pallas"]


def _kernel(
    # scalar prefetch
    slab_start_ref,
    # inputs
    x_ref,  # (NB, C) destination-block node features
    x_any,  # (Ns_pad, C) in ANY/HBM for the slab DMA
    e_ref,  # (RB, C) slot edge features
    idx_ref,  # (RB, 1) int32
    mask_ref,  # (RB, 1) f32
    w0_ref,  # (3C, C)
    b0_ref,  # (1, C)
    w1_ref,  # (C, C)
    b1_ref,  # (1, C)
    w2_ref,  # (C, C)
    b2_ref,  # (1, C)
    ln_ref,  # (2, C) [scale; bias]
    # outputs
    agg_ref,  # (NB, C) f32
    msg_ref,  # (RB, C)
    # scratch
    x_slab,  # (S, C)
    sem,
    *,
    nb: int,
    cap: int,
    slab: int,
    c: int,
    activation: str,
):
    b = pl.program_id(0)
    start = pl.multiple_of(slab_start_ref[b], 8)
    copy = pltpu.make_async_copy(x_any.at[pl.ds(start, slab)], x_slab, sem)
    copy.start()

    act = get_activation(activation)
    rb = nb * cap
    cdtype = x_ref.dtype

    slot_rows = jax.lax.broadcasted_iota(jnp.int32, (rb, slab), 1)
    gather_oh = (slot_rows == idx_ref[:]).astype(cdtype)
    rep_rows = jax.lax.broadcasted_iota(jnp.int32, (rb, nb), 0) // cap
    rep_cols = jax.lax.broadcasted_iota(jnp.int32, (rb, nb), 1)
    rep_oh = (rep_rows == rep_cols).astype(cdtype)

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    e = e_ref[:]
    x_i = dot(rep_oh, x_ref[:]).astype(cdtype)
    h = dot(x_i, w0_ref[0:c]) + dot(e, w0_ref[2 * c : 3 * c])

    copy.wait()
    x_j = dot(gather_oh, x_slab[:]).astype(cdtype)
    h = h + dot(x_j, w0_ref[c : 2 * c]) + b0_ref[0].astype(jnp.float32)
    h = act(h).astype(cdtype)
    h = act(dot(h, w1_ref[:]) + b1_ref[0].astype(jnp.float32)).astype(cdtype)
    h = dot(h, w2_ref[:]) + b2_ref[0].astype(jnp.float32)  # (RB, C) fp32

    # LayerNorm with fp32 statistics over the channel lanes
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    hn = ((h - mu) * jax.lax.rsqrt(var + 1e-6)).astype(cdtype)
    hn = hn * ln_ref[0:1].astype(cdtype) + ln_ref[1:2].astype(cdtype)

    msg = (hn + e) * mask_ref[:].astype(cdtype)
    msg_ref[:] = msg
    agg_ref[:] = jnp.sum(msg.astype(jnp.float32).reshape(nb, cap, c), axis=1)


def slot_gnn_pallas(
    x: jnp.ndarray,  # (N, C)
    e_slots: jnp.ndarray,  # (R, C)
    w: dict,  # extracted flax MLP param tree
    plan: EdgeKernelPlan,
    activation: str = "SiLU",
    interpret: bool = False,
):
    """Kernel-backed twin of ``ops.slot_gnn._slot_gnn_once``."""
    n, c = x.shape
    nb, cap, slab = plan.block_nodes, plan.cap, plan.slab_width
    nblk, npad = plan.num_blocks, plan.padded_dst
    rb = nb * cap
    dtype = x.dtype

    n_dense = sum(1 for k in w if k.startswith("Dense_"))
    assert n_dense == 3, "slot_gnn_pallas supports the default 3-Dense edge MLP"

    xpad = jnp.pad(x, ((0, npad - n), (0, 0)))
    ns_pad = max(-(-n // 8) * 8, slab)
    x_any = jnp.pad(x, ((0, ns_pad - n), (0, 0)))
    ln = w["AutocastLayerNorm_0"]["LayerNorm_0"]
    args = [
        jnp.asarray(plan.slab_start),
        xpad,
        x_any,
        e_slots.astype(dtype),
        jnp.asarray(plan.src_slab_idx),
        jnp.asarray(plan.slot_mask),
        w["Dense_0"]["kernel"].astype(dtype),
        w["Dense_0"]["bias"].astype(dtype)[None],
        w["Dense_1"]["kernel"].astype(dtype),
        w["Dense_1"]["bias"].astype(dtype)[None],
        w["Dense_2"]["kernel"].astype(dtype),
        w["Dense_2"]["bias"].astype(dtype)[None],
        jnp.stack([ln["scale"], ln["bias"]]).astype(dtype),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nb, c), lambda b, ss: (b, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((rb, c), lambda b, ss: (b, 0)),
            pl.BlockSpec((rb, 1), lambda b, ss: (b, 0)),
            pl.BlockSpec((rb, 1), lambda b, ss: (b, 0)),
            pl.BlockSpec((3 * c, c), lambda b, ss: (0, 0)),
            pl.BlockSpec((1, c), lambda b, ss: (0, 0)),
            pl.BlockSpec((c, c), lambda b, ss: (0, 0)),
            pl.BlockSpec((1, c), lambda b, ss: (0, 0)),
            pl.BlockSpec((c, c), lambda b, ss: (0, 0)),
            pl.BlockSpec((1, c), lambda b, ss: (0, 0)),
            pl.BlockSpec((2, c), lambda b, ss: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, c), lambda b, ss: (b, 0)),
            pl.BlockSpec((rb, c), lambda b, ss: (b, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab, c), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _kernel, nb=nb, cap=cap, slab=slab, c=c, activation=activation
    )
    agg, msg = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((npad, c), jnp.float32),
            jax.ShapeDtypeStruct((npad * cap, c), dtype),
        ],
        interpret=interpret,
    )(*args)
    return agg[:n], msg
