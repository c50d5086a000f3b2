"""Fused Pallas TPU kernel for slot-layout per-edge attention.

The GraphTransformer hot loop (reference ``layers/conv.py:79-142``) for
bandwidth-ordered graphs (``graphs/kernel_plan.py``). Per destination block:

1. one contiguous ``slab_width``-row window of k/v is DMA'd HBM→VMEM
   (arbitrary start offset from the scalar-prefetched plan);
2. neighbor rows are *gathered by one-hot matmul on the MXU* — Mosaic cannot
   vector-gather in VMEM, but an (R, S) one-hot built from ``iota == idx``
   comparisons feeds the systolic array directly and never touches HBM;
3. raw edge attributes (A ≈ 15 wide) are projected to (R, C) in VMEM, so the
   wide per-edge tensors the XLA path materializes in HBM
   ((nodes, cap, C) gathers — the dominant byte stream, see PERF.md) never
   exist;
4. masked per-destination softmax runs over the static ``cap`` slot axis in
   fp32 and the kernel emits merge-form partials (num, den, m) so out-of-plan
   edges combine exactly (``ops/slot_attention.py``).

The backward pass recomputes through the jnp twin
(``slot_attention_partials``) under ``jax.custom_vjp`` — same math, no N×cap×C
HBM tensors in the forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anemoi_models_tpu.graphs.kernel_plan import EdgeKernelPlan

__all__ = ["slot_attention_partials_pallas"]

_NEG = -1e30


def _kernel(
    # scalar prefetch
    slab_start_ref,
    # inputs
    q_ref,  # (NB, C)
    k_any,  # (Ns_pad, C) in ANY/HBM
    v_any,  # (Ns_pad, C)
    idx_ref,  # (RB, 1) int32 slab-local source row per slot
    mask_ref,  # (RB, 1) f32 slot validity
    a_ref,  # (RB, A2) raw edge attrs (ones-augmented, mask-zeroed)
    w_ref,  # (A2, C) edge projection
    # outputs
    num_ref,  # (NB, C) f32
    den_ref,  # (NB, H) f32
    m_ref,  # (NB, H) f32
    # scratch
    k_slab,  # (S, C)
    v_slab,  # (S, C)
    sem_k,
    sem_v,
    *,
    nb: int,
    cap: int,
    slab: int,
    heads: int,
    head_dim: int,
):
    b = pl.program_id(0)
    start = pl.multiple_of(slab_start_ref[b], 8)
    copy_k = pltpu.make_async_copy(k_any.at[pl.ds(start, slab)], k_slab, sem_k)
    copy_v = pltpu.make_async_copy(v_any.at[pl.ds(start, slab)], v_slab, sem_v)
    copy_k.start()
    copy_v.start()

    rb = nb * cap
    c = heads * head_dim
    cdtype = q_ref.dtype

    # one-hot matrices from iota comparisons (VPU) — these feed the MXU as
    # the gather/replicate operators and live only in registers/VMEM
    slot_rows = jax.lax.broadcasted_iota(jnp.int32, (rb, slab), 1)
    gather_oh = (slot_rows == idx_ref[:]).astype(cdtype)  # (RB, S)
    rep_rows = jax.lax.broadcasted_iota(jnp.int32, (rb, nb), 0) // cap
    rep_cols = jax.lax.broadcasted_iota(jnp.int32, (rb, nb), 1)
    rep_oh = (rep_rows == rep_cols).astype(cdtype)  # (RB, NB)

    e_n = jax.lax.dot_general(
        a_ref[:], w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (RB, C)
    q_rep = jax.lax.dot_general(
        rep_oh, q_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (RB, C)

    copy_k.wait()
    k_n = jax.lax.dot_general(
        gather_oh, k_slab[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (RB, C)

    # per-head contraction via block-diagonal group-sum matmul
    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 0) // head_dim
    head_cols = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 1)
    g1 = (head_of_col == head_cols).astype(jnp.float32)  # (C, H)
    scale = 1.0 / np.sqrt(head_dim)
    logits = jax.lax.dot_general(
        q_rep * (k_n + e_n), g1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (RB, H)
    logits = jnp.where(mask_ref[:] > 0, logits, _NEG)

    lg = logits.reshape(nb, cap, heads)
    m = jnp.max(lg, axis=1)  # (NB, H)
    w = jnp.exp(lg - m[:, None, :]) * mask_ref[:].reshape(nb, cap, 1)
    den = jnp.sum(w, axis=1)  # (NB, H)

    copy_v.wait()
    v_n = jax.lax.dot_general(
        gather_oh, v_slab[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (RB, C)
    he = g1.T  # (H, C) head-expansion
    w_c = jax.lax.dot_general(
        w.reshape(rb, heads), he, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (RB, C)
    num = jnp.sum((w_c * (v_n + e_n)).reshape(nb, cap, c), axis=1)  # (NB, C)

    num_ref[:] = num
    den_ref[:] = den
    m_ref[:] = m


def _pad_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, rows - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def slot_attention_partials_pallas(
    query: jnp.ndarray,  # (N, H, D)
    key: jnp.ndarray,  # (Ns, H, D)
    value: jnp.ndarray,  # (Ns, H, D)
    a_slots: jnp.ndarray,  # (R, A2) ones-augmented raw edge attrs
    w_aug: jnp.ndarray,  # (A2, H, D)
    plan: EdgeKernelPlan,
    interpret: bool = False,
):
    """Kernel-backed twin of ``slot_attention_partials`` (same partials out)."""
    n, h, d = query.shape
    ns = key.shape[0]
    c = h * d
    nb, cap, slab = plan.block_nodes, plan.cap, plan.slab_width
    nblk, npad = plan.num_blocks, plan.padded_dst
    rb = nb * cap

    q2 = _pad_rows(query.reshape(n, c), npad)
    ns_pad = max(-(-ns // 8) * 8, slab)
    k2 = _pad_rows(key.reshape(ns, c), ns_pad)
    v2 = _pad_rows(value.reshape(ns, c), ns_pad)
    w_flat = w_aug.reshape(w_aug.shape[0], c).astype(q2.dtype)
    a2 = a_slots.astype(q2.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nb, c), lambda b, ss: (b, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((rb, 1), lambda b, ss: (b, 0)),
            pl.BlockSpec((rb, 1), lambda b, ss: (b, 0)),
            pl.BlockSpec((rb, a2.shape[1]), lambda b, ss: (b, 0)),
            pl.BlockSpec((w_flat.shape[0], c), lambda b, ss: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, c), lambda b, ss: (b, 0)),
            pl.BlockSpec((nb, h), lambda b, ss: (b, 0)),
            pl.BlockSpec((nb, h), lambda b, ss: (b, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab, c), k2.dtype),
            pltpu.VMEM((slab, c), v2.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _kernel, nb=nb, cap=cap, slab=slab, heads=h, head_dim=d
    )
    num, den, m = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((npad, c), jnp.float32),
            jax.ShapeDtypeStruct((npad, h), jnp.float32),
            jax.ShapeDtypeStruct((npad, h), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(plan.slab_start),
        q2,
        k2,
        v2,
        jnp.asarray(plan.src_slab_idx),
        jnp.asarray(plan.slot_mask),
        a2,
        w_flat,
    )
    from anemoi_models_tpu.ops.slot_attention import AttentionPartials

    return AttentionPartials(num=num[:n].reshape(n, h, d), den=den[:n], m=m[:n])
