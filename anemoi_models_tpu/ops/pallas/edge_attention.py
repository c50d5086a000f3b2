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

The backward is a second hand-written kernel (``_bwd_kernel``): it re-DMAs the
k/v slabs, rebuilds the one-hot gathers in VMEM, and emits dq, per-block
dk/dv slab gradients (overlap-added into source rows by static interval
coloring + concatenation outside — slab starts are host-static, so windows
of one color are disjoint and assemble in parallel), d(edge attrs) and an
accumulated d(edge projection) — so neither
pass ever materializes an (N·cap, C) tensor in HBM. The vjp drops the
m-cotangent: the partials consumer (``merge_partials``/``finalize_partials``)
is invariant under the gauge (num, den, m) → (num·e^{-δ}, den·e^{-δ}, m+δ),
which forces g_m = num·g_num + den·g_den identically, so the gradient taken
at fixed m is the true gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anemoi_models_tpu.graphs.kernel_plan import EdgeKernelPlan

__all__ = [
    "slot_attention_partials_pallas",
    "slot_attention_partials_kernel",
    "slot_attention_arrays_kernel",
]

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


def _pallas_fwd(
    starts,  # (nblk,) int32 — scalar-prefetched slab starts
    q2,  # (npad, C)
    k2,  # (ns_pad, C) rows multiple of 8, >= slab
    v2,
    idx,  # (R, 1) int32
    mask,  # (R, 1) f32
    a2,  # (R, A2)
    w_flat,  # (A2, C)
    *,
    nb: int,
    cap: int,
    slab: int,
    heads: int,
    head_dim: int,
    interpret: bool,
):
    """Shared forward pallas_call; layout args are operands (traced or not)."""
    c = heads * head_dim
    nblk = starts.shape[0]
    rb = nb * cap
    npad = nblk * nb

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
            pl.BlockSpec((nb, heads), lambda b, ss: (b, 0)),
            pl.BlockSpec((nb, heads), lambda b, ss: (b, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab, c), k2.dtype),
            pltpu.VMEM((slab, c), v2.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _kernel, nb=nb, cap=cap, slab=slab, heads=heads, head_dim=head_dim
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((npad, c), jnp.float32),
            jax.ShapeDtypeStruct((npad, heads), jnp.float32),
            jax.ShapeDtypeStruct((npad, heads), jnp.float32),
        ],
        interpret=interpret,
    )(starts, q2, k2, v2, idx, mask, a2, w_flat)


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
    npad = plan.padded_dst

    q2 = _pad_rows(query.reshape(n, c), npad)
    ns_pad = max(-(-ns // 8) * 8, slab)
    k2 = _pad_rows(key.reshape(ns, c), ns_pad)
    v2 = _pad_rows(value.reshape(ns, c), ns_pad)
    w_flat = w_aug.reshape(w_aug.shape[0], c).astype(q2.dtype)
    a2 = a_slots.astype(q2.dtype)

    num, den, m = _pallas_fwd(
        jnp.asarray(plan.slab_start),
        q2, k2, v2,
        jnp.asarray(plan.src_slab_idx),
        jnp.asarray(plan.slot_mask),
        a2, w_flat,
        nb=nb, cap=cap, slab=slab, heads=h, head_dim=d, interpret=interpret,
    )
    from anemoi_models_tpu.ops.slot_attention import AttentionPartials

    return AttentionPartials(num=num[:n].reshape(n, h, d), den=den[:n], m=m[:n])


def _bwd_kernel(
    # scalar prefetch
    slab_start_ref,
    # inputs
    q_ref,  # (NB, C)
    k_any,  # (Ns_pad, C) in ANY/HBM
    v_any,  # (Ns_pad, C)
    idx_ref,  # (RB, 1) int32
    mask_ref,  # (RB, 1) f32
    a_ref,  # (RB, A2)
    w_ref,  # (A2, C)
    m_ref,  # (NB, H) f32 — forward max logits (the softmax gauge)
    gn_ref,  # (NB, C) f32 — cotangent of num
    gd_ref,  # (NB, H) f32 — cotangent of den
    # outputs
    dq_ref,  # (NB, C) f32
    dk_ref,  # (S, C) f32 — this block's slab gradient
    dv_ref,  # (S, C) f32
    da_ref,  # (RB, A2) f32
    dw_ref,  # (A2, C) f32 — accumulated over all blocks
    # scratch
    k_slab,
    v_slab,
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
    f32 = jnp.float32
    cdtype = q_ref.dtype  # bf16 on TPU: one-hot matmuls ride the fast MXU path

    slot_rows = jax.lax.broadcasted_iota(jnp.int32, (rb, slab), 1)
    gather_hit = slot_rows == idx_ref[:]
    gather_oh = gather_hit.astype(cdtype)  # (RB, S)
    rep_rows = jax.lax.broadcasted_iota(jnp.int32, (rb, nb), 0) // cap
    rep_cols = jax.lax.broadcasted_iota(jnp.int32, (rb, nb), 1)
    rep_hit = rep_rows == rep_cols
    rep_oh = rep_hit.astype(cdtype)  # (RB, NB)
    rep_oh_f = rep_hit.astype(f32)  # replicates the f32 cotangents exactly

    def mm(lhs, rhs, contract):
        return jax.lax.dot_general(
            lhs, rhs, (contract, ((), ())), preferred_element_type=f32
        )

    e_n = mm(a_ref[:].astype(f32), w_ref[:].astype(f32), ((1,), (0,)))  # (RB, C)
    q_rep = mm(rep_oh, q_ref[:], ((1,), (0,)))  # (RB, C)

    copy_k.wait()
    k_n = mm(gather_oh, k_slab[:], ((1,), (0,)))  # (RB, C)

    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 0) // head_dim
    head_cols = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 1)
    g1 = (head_of_col == head_cols).astype(f32)  # (C, H)
    he = g1.T  # (H, C)
    scale = 1.0 / np.sqrt(head_dim)

    ke = k_n + e_n
    logits = mm(q_rep * ke, g1, ((1,), (0,))) * scale  # (RB, H)
    m_rep = mm(rep_oh_f, m_ref[:], ((1,), (0,)))  # (RB, H)
    # live slots satisfy logits <= m (m is their max), so the clamp is exact;
    # it only guards dead destinations where m is the -1e30 floor and the
    # unmasked recomputed logit would overflow exp to inf (then inf*0 = NaN)
    w = jnp.exp(jnp.minimum(logits - m_rep, 0.0)) * mask_ref[:]  # (RB, H)

    gn_rep = mm(rep_oh_f, gn_ref[:], ((1,), (0,)))  # (RB, C)
    gd_rep = mm(rep_oh_f, gd_ref[:], ((1,), (0,)))  # (RB, H)

    copy_v.wait()
    v_n = mm(gather_oh, v_slab[:], ((1,), (0,)))  # (RB, C)
    u = v_n + e_n  # (RB, C)

    # dl_s = w_s · (g_num · u_s + g_den)  — per (slot, head)
    s1 = mm(gn_rep * u, g1, ((1,), (0,)))  # (RB, H)
    dl = w * (s1 + gd_rep)  # (RB, H)
    dl_c = mm(dl, he, ((1,), (0,))) * scale  # (RB, C) head-expanded

    dq_rep = dl_c * ke
    dq_ref[:] = mm(rep_oh_f, dq_rep, ((0,), (0,)))  # (NB, C)

    dk_n = dl_c * q_rep
    w_c = mm(w, he, ((1,), (0,)))  # (RB, C)
    dv_n = w_c * gn_rep
    # transpose one-hot matmuls scatter the slot grads into slab rows; the
    # cdtype cast keeps them on the fast MXU path (f32 accumulation)
    dk_ref[:] = mm(gather_oh, dk_n.astype(cdtype), ((0,), (0,)))  # (S, C)
    dv_ref[:] = mm(gather_oh, dv_n.astype(cdtype), ((0,), (0,)))

    de_n = dk_n + dv_n  # e enters both k+e and v+e
    da_ref[:] = mm(de_n, w_ref[:].astype(f32), ((1,), (1,)))  # (RB, A2)
    dw_part = mm(a_ref[:].astype(f32), de_n, ((0,), (0,)))  # (A2, C)

    @pl.when(b == 0)
    def _init():
        dw_ref[:] = dw_part

    @pl.when(b > 0)
    def _acc():
        dw_ref[:] = dw_ref[:] + dw_part


def _pallas_bwd(
    starts,  # (nblk,) int32
    q2,  # (npad, C)
    k2,  # (ns_pad, C)
    v2,
    idx,  # (R, 1)
    mask,  # (R, 1)
    a2,  # (R, A2)
    w_flat,  # (A2, C)
    m2,  # (npad, H) f32
    gn2,  # (npad, C) f32
    gd2,  # (npad, H) f32
    *,
    nb: int,
    cap: int,
    slab: int,
    heads: int,
    head_dim: int,
    interpret: bool,
):
    """Shared backward pallas_call. Returns raw per-block outputs
    (dq, dk_slabs, dv_slabs, da, dw); slab gradients still need overlap-add."""
    c = heads * head_dim
    nblk = starts.shape[0]
    rb = nb * cap
    npad = nblk * nb

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
            pl.BlockSpec((nb, heads), lambda b, ss: (b, 0)),
            pl.BlockSpec((nb, c), lambda b, ss: (b, 0)),
            pl.BlockSpec((nb, heads), lambda b, ss: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, c), lambda b, ss: (b, 0)),
            pl.BlockSpec((slab, c), lambda b, ss: (b, 0)),
            pl.BlockSpec((slab, c), lambda b, ss: (b, 0)),
            pl.BlockSpec((rb, a2.shape[1]), lambda b, ss: (b, 0)),
            pl.BlockSpec((w_flat.shape[0], c), lambda b, ss: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab, c), k2.dtype),
            pltpu.VMEM((slab, c), v2.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, nb=nb, cap=cap, slab=slab, heads=heads, head_dim=head_dim
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((npad, c), jnp.float32),
            jax.ShapeDtypeStruct((nblk * slab, c), jnp.float32),
            jax.ShapeDtypeStruct((nblk * slab, c), jnp.float32),
            jax.ShapeDtypeStruct((npad * cap, a2.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((w_flat.shape[0], c), jnp.float32),
        ],
        interpret=interpret,
    )(starts, q2, k2, v2, idx, mask, a2, w_flat, m2, gn2, gd2)


def _slot_attention_bwd_pallas(
    query, key, value, a_slots, w_aug, m, g_num, g_den, plan, interpret=False
):
    """Hand-written backward: (dq, dk, dv, da_slots, dw_aug) in primal dtypes."""
    n, h, d = query.shape
    ns = key.shape[0]
    c = h * d
    nb, cap, slab = plan.block_nodes, plan.cap, plan.slab_width
    nblk, npad = plan.num_blocks, plan.padded_dst

    q2 = _pad_rows(query.reshape(n, c), npad)
    ns_pad = max(-(-ns // 8) * 8, slab)
    k2 = _pad_rows(key.reshape(ns, c), ns_pad)
    v2 = _pad_rows(value.reshape(ns, c), ns_pad)
    w_flat = w_aug.reshape(w_aug.shape[0], c).astype(q2.dtype)
    a2 = a_slots.astype(q2.dtype)
    m2 = _pad_rows(m.astype(jnp.float32), npad)
    gn2 = _pad_rows(g_num.reshape(n, c).astype(jnp.float32), npad)
    gd2 = _pad_rows(g_den.astype(jnp.float32), npad)

    dq, dk_slabs, dv_slabs, da, dw = _pallas_bwd(
        jnp.asarray(plan.slab_start),
        q2, k2, v2,
        jnp.asarray(plan.src_slab_idx),
        jnp.asarray(plan.slot_mask),
        a2, w_flat, m2, gn2, gd2,
        nb=nb, cap=cap, slab=slab, heads=h, head_dim=d, interpret=interpret,
    )

    dk_slabs = dk_slabs.reshape(nblk, slab, c)
    dv_slabs = dv_slabs.reshape(nblk, slab, c)
    starts_np = np.asarray(plan.slab_start, dtype=np.int64)
    color_blocks = _color_slab_blocks(starts_np, slab)
    dk_full = _overlap_add_colored(dk_slabs, color_blocks, starts_np, slab, ns_pad, c)
    dv_full = _overlap_add_colored(dv_slabs, color_blocks, starts_np, slab, ns_pad, c)

    return (
        dq[:n].reshape(n, h, d).astype(query.dtype),
        dk_full[:ns].reshape(ns, h, d).astype(key.dtype),
        dv_full[:ns].reshape(ns, h, d).astype(value.dtype),
        da.astype(a_slots.dtype),
        dw.reshape(w_aug.shape).astype(w_aug.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def slot_attention_partials_kernel(query, key, value, a_slots, w_aug, plan, interpret=False):
    """``slot_attention_partials_pallas`` with a hand-written backward kernel.

    Valid under one contract: the consumer of the returned partials must be
    invariant to the m-gauge (num, den, m) → (num·e^{-δ}, den·e^{-δ}, m+δ),
    which ``merge_partials`` + ``finalize_partials`` are. Under that gauge
    invariance the m-cotangent carries no independent information and the
    backward is exact with m held fixed at its forward value.
    """
    return slot_attention_partials_pallas(query, key, value, a_slots, w_aug, plan, interpret)


def _kernel_fwd(query, key, value, a_slots, w_aug, plan, interpret=False):
    out = slot_attention_partials_pallas(query, key, value, a_slots, w_aug, plan, interpret)
    return out, (query, key, value, a_slots, w_aug, out.m)


def _kernel_bwd(plan, interpret, res, g):
    query, key, value, a_slots, w_aug, m = res
    return _slot_attention_bwd_pallas(
        query, key, value, a_slots, w_aug, m, g.num, g.den, plan, interpret
    )


slot_attention_partials_kernel.defvjp(_kernel_fwd, _kernel_bwd)


# ---------------------------------------------------------------------------
# Arrays-parameterized variant: the plan arrays are *operands*, not baked
# constants — required inside shard_map, where every shard runs one SPMD
# program over its own (stacked, shard-sliced) plan (graphs/kernel_plan.py:
# build_halo_kernel_plans). Static dims (nb, cap, slab) are nondiff args.
# ---------------------------------------------------------------------------


def _arrays_fwd_impl(query, key, value, a_slots, w_aug, starts, src_idx, slot_mask,
                     nb, cap, slab, interpret):
    n, h, d = query.shape
    c = h * d
    nblk = starts.shape[0]
    npad = nblk * nb
    ns = key.shape[0]
    ns_pad = max(-(-ns // 8) * 8, slab)

    q2 = _pad_rows(query.reshape(n, c), npad)
    k2 = _pad_rows(key.reshape(ns, c), ns_pad)
    v2 = _pad_rows(value.reshape(ns, c), ns_pad)
    w_flat = w_aug.reshape(w_aug.shape[0], c).astype(q2.dtype)
    a2 = a_slots.astype(q2.dtype)

    num, den, m = _pallas_fwd(
        starts, q2, k2, v2, src_idx, slot_mask, a2, w_flat,
        nb=nb, cap=cap, slab=slab, heads=h, head_dim=d, interpret=interpret,
    )
    from anemoi_models_tpu.ops.slot_attention import AttentionPartials

    return AttentionPartials(num=num[:n].reshape(n, h, d), den=den[:n], m=m[:n])


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def slot_attention_arrays_kernel(query, key, value, a_slots, w_aug,
                                 starts, src_idx, slot_mask,
                                 nb, cap, slab, interpret=False):
    """Hand-written fwd+bwd kernels over traced plan arrays.

    Same m-gauge contract as :func:`slot_attention_partials_kernel`. The
    slab-gradient overlap-add runs as a short ``lax.scan`` (num_blocks per
    shard is small) because traced starts preclude static interval coloring.
    """
    return _arrays_fwd_impl(query, key, value, a_slots, w_aug,
                            starts, src_idx, slot_mask, nb, cap, slab, interpret)


def _arrays_fwd(query, key, value, a_slots, w_aug, starts, src_idx, slot_mask,
                nb, cap, slab, interpret=False):
    out = _arrays_fwd_impl(query, key, value, a_slots, w_aug,
                           starts, src_idx, slot_mask, nb, cap, slab, interpret)
    return out, (query, key, value, a_slots, w_aug, starts, src_idx, slot_mask, out.m)


def _arrays_bwd(nb, cap, slab, interpret, res, g):
    query, key, value, a_slots, w_aug, starts, src_idx, slot_mask, m = res
    n, h, d = query.shape
    c = h * d
    nblk = starts.shape[0]
    npad = nblk * nb
    ns = key.shape[0]
    ns_pad = max(-(-ns // 8) * 8, slab)

    q2 = _pad_rows(query.reshape(n, c), npad)
    k2 = _pad_rows(key.reshape(ns, c), ns_pad)
    v2 = _pad_rows(value.reshape(ns, c), ns_pad)
    w_flat = w_aug.reshape(w_aug.shape[0], c).astype(q2.dtype)
    a2 = a_slots.astype(q2.dtype)
    m2 = _pad_rows(m.astype(jnp.float32), npad)
    gn2 = _pad_rows(g.num.reshape(n, c).astype(jnp.float32), npad)
    gd2 = _pad_rows(g.den.astype(jnp.float32), npad)

    dq, dk_slabs, dv_slabs, da, dw = _pallas_bwd(
        starts, q2, k2, v2, src_idx, slot_mask, a2, w_flat, m2, gn2, gd2,
        nb=nb, cap=cap, slab=slab, heads=h, head_dim=d, interpret=interpret,
    )

    dk_slabs = dk_slabs.reshape(nblk, slab, c)
    dv_slabs = dv_slabs.reshape(nblk, slab, c)

    def overlap_add(acc, inp):
        start, gk, gv = inp
        ak = jax.lax.dynamic_slice(acc[0], (start, 0), (slab, c))
        av = jax.lax.dynamic_slice(acc[1], (start, 0), (slab, c))
        return (
            jax.lax.dynamic_update_slice(acc[0], ak + gk, (start, 0)),
            jax.lax.dynamic_update_slice(acc[1], av + gv, (start, 0)),
        ), None

    zero = jnp.zeros((ns_pad, c), jnp.float32)
    (dk_full, dv_full), _ = jax.lax.scan(
        overlap_add, (zero, zero), (starts, dk_slabs, dv_slabs)
    )

    f0 = jax.dtypes.float0
    return (
        dq[:n].reshape(n, h, d).astype(query.dtype),
        dk_full[:ns].reshape(ns, h, d).astype(key.dtype),
        dv_full[:ns].reshape(ns, h, d).astype(value.dtype),
        da.astype(a_slots.dtype),
        dw.reshape(w_aug.shape).astype(w_aug.dtype),
        np.zeros(starts.shape, dtype=f0),
        np.zeros(src_idx.shape, dtype=f0),
        jnp.zeros_like(slot_mask),
    )


slot_attention_arrays_kernel.defvjp(_arrays_fwd, _arrays_bwd)


# ---------------------------------------------------------------------------
# Feats (commuted-dataflow) variant: DMA ONE narrow feature slab and project
# k/v *inside* VMEM — the round-3 commuted-projection insight carried into
# the kernel. vs the k/v kernel above: half the slab DMA bytes, one one-hot
# gather instead of two, and the per-node k/v tensors (2 x Ns x C written +
# slab-read from HBM) never exist. The projections ride the MXU on slab rows
# (S x F x 2C per block — noise next to the gather matmuls), and the
# backward emits the SAME per-block dk/dv slab gradients as the k/v kernel:
# the chain through w_kv (df = dk w_k^T + dv w_v^T, dw_kv = f^T dkv,
# db_kv = sum dkv) runs OUTSIDE as per-node XLA matmuls on the
# overlap-added slab grads.
# ---------------------------------------------------------------------------


def _feats_kernel(
    # scalar prefetch
    slab_start_ref,
    # inputs
    q_ref,  # (NB, C)
    f_any,  # (Ns_pad, F) in ANY/HBM — narrow source features
    wkv_ref,  # (F, 2C) fused [k|v] projection
    bkv_ref,  # (1, 2C) fused [k|v] bias
    idx_ref,  # (RB, 1) int32 slab-local source row per slot
    mask_ref,  # (RB, 1) f32 slot validity
    a_ref,  # (RB, A2) raw edge attrs (ones-augmented, mask-zeroed)
    w_ref,  # (A2, C) edge projection
    # outputs
    num_ref,  # (NB, C) f32
    den_ref,  # (NB, H) f32
    m_ref,  # (NB, H) f32
    # scratch
    f_slab,  # (S, F)
    sem_f,
    *,
    nb: int,
    cap: int,
    slab: int,
    heads: int,
    head_dim: int,
):
    b = pl.program_id(0)
    start = pl.multiple_of(slab_start_ref[b], 8)
    copy_f = pltpu.make_async_copy(f_any.at[pl.ds(start, slab)], f_slab, sem_f)
    copy_f.start()

    rb = nb * cap
    c = heads * head_dim
    cdtype = q_ref.dtype

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

    copy_f.wait()
    # in-VMEM projection of the slab: the per-node k/v tensors never exist.
    # bf16 rounding after the f32-accumulated matmul matches the wide path's
    # lin_kv output dtype, so the gathered values agree with the k/v kernel
    kv_slab = (
        jax.lax.dot_general(
            f_slab[:], wkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bkv_ref[:]
    ).astype(cdtype)  # (S, 2C)
    k_n = jax.lax.dot_general(
        gather_oh, kv_slab[:, :c], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (RB, C)

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

    v_n = jax.lax.dot_general(
        gather_oh, kv_slab[:, c:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (RB, C)
    he = g1.T  # (H, C)
    w_c = jax.lax.dot_general(
        w.reshape(rb, heads), he, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (RB, C)
    num = jnp.sum((w_c * (v_n + e_n)).reshape(nb, cap, c), axis=1)  # (NB, C)

    num_ref[:] = num
    den_ref[:] = den
    m_ref[:] = m


def _pallas_feats_fwd(
    starts,  # (nblk,) int32
    q2,  # (npad, C)
    f2,  # (ns_pad, F) rows multiple of 8, >= slab
    wkv,  # (F, 2C)
    bkv,  # (1, 2C)
    idx,  # (R, 1) int32
    mask,  # (R, 1) f32
    a2,  # (R, A2)
    w_flat,  # (A2, C)
    *,
    nb: int,
    cap: int,
    slab: int,
    heads: int,
    head_dim: int,
    interpret: bool,
):
    c = heads * head_dim
    f_dim = f2.shape[1]
    nblk = starts.shape[0]
    rb = nb * cap
    npad = nblk * nb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nb, c), lambda b, ss: (b, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((f_dim, 2 * c), lambda b, ss: (0, 0)),
            pl.BlockSpec((1, 2 * c), lambda b, ss: (0, 0)),
            pl.BlockSpec((rb, 1), lambda b, ss: (b, 0)),
            pl.BlockSpec((rb, 1), lambda b, ss: (b, 0)),
            pl.BlockSpec((rb, a2.shape[1]), lambda b, ss: (b, 0)),
            pl.BlockSpec((w_flat.shape[0], c), lambda b, ss: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, c), lambda b, ss: (b, 0)),
            pl.BlockSpec((nb, heads), lambda b, ss: (b, 0)),
            pl.BlockSpec((nb, heads), lambda b, ss: (b, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab, f_dim), f2.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _feats_kernel, nb=nb, cap=cap, slab=slab, heads=heads, head_dim=head_dim
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((npad, c), jnp.float32),
            jax.ShapeDtypeStruct((npad, heads), jnp.float32),
            jax.ShapeDtypeStruct((npad, heads), jnp.float32),
        ],
        interpret=interpret,
    )(starts, q2, f2, wkv, bkv, idx, mask, a2, w_flat)


def _feats_bwd_kernel(
    # scalar prefetch
    slab_start_ref,
    # inputs
    q_ref,  # (NB, C)
    f_any,  # (Ns_pad, F) in ANY/HBM
    wkv_ref,  # (F, 2C)
    bkv_ref,  # (1, 2C)
    idx_ref,  # (RB, 1) int32
    mask_ref,  # (RB, 1) f32
    a_ref,  # (RB, A2)
    w_ref,  # (A2, C)
    m_ref,  # (NB, H) f32 — forward max logits (the softmax gauge)
    gn_ref,  # (NB, C) f32
    gd_ref,  # (NB, H) f32
    # outputs
    dq_ref,  # (NB, C) f32
    dk_ref,  # (S, C) f32 — this block's k-cotangent slab
    dv_ref,  # (S, C) f32
    da_ref,  # (RB, A2) f32
    dw_ref,  # (A2, C) f32 — accumulated over all blocks
    # scratch
    f_slab,
    sem_f,
    *,
    nb: int,
    cap: int,
    slab: int,
    heads: int,
    head_dim: int,
):
    b = pl.program_id(0)
    start = pl.multiple_of(slab_start_ref[b], 8)
    copy_f = pltpu.make_async_copy(f_any.at[pl.ds(start, slab)], f_slab, sem_f)
    copy_f.start()

    rb = nb * cap
    c = heads * head_dim
    f32 = jnp.float32
    cdtype = q_ref.dtype

    slot_rows = jax.lax.broadcasted_iota(jnp.int32, (rb, slab), 1)
    gather_oh = (slot_rows == idx_ref[:]).astype(cdtype)  # (RB, S)
    rep_rows = jax.lax.broadcasted_iota(jnp.int32, (rb, nb), 0) // cap
    rep_cols = jax.lax.broadcasted_iota(jnp.int32, (rb, nb), 1)
    rep_hit = rep_rows == rep_cols
    rep_oh = rep_hit.astype(cdtype)  # (RB, NB)
    rep_oh_f = rep_hit.astype(f32)

    def mm(lhs, rhs, contract):
        return jax.lax.dot_general(
            lhs, rhs, (contract, ((), ())), preferred_element_type=f32
        )

    e_n = mm(a_ref[:].astype(f32), w_ref[:].astype(f32), ((1,), (0,)))  # (RB, C)
    q_rep = mm(rep_oh, q_ref[:], ((1,), (0,)))  # (RB, C)

    copy_f.wait()
    kv_slab = (
        mm(f_slab[:], wkv_ref[:], ((1,), (0,))) + bkv_ref[:]
    ).astype(cdtype)  # (S, 2C) — must match the forward's rounding exactly
    k_n = mm(gather_oh, kv_slab[:, :c], ((1,), (0,)))  # (RB, C)

    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 0) // head_dim
    head_cols = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 1)
    g1 = (head_of_col == head_cols).astype(f32)  # (C, H)
    he = g1.T  # (H, C)
    scale = 1.0 / np.sqrt(head_dim)

    ke = k_n + e_n
    logits = mm(q_rep * ke, g1, ((1,), (0,))) * scale  # (RB, H)
    m_rep = mm(rep_oh_f, m_ref[:], ((1,), (0,)))  # (RB, H)
    w = jnp.exp(jnp.minimum(logits - m_rep, 0.0)) * mask_ref[:]  # (RB, H)

    gn_rep = mm(rep_oh_f, gn_ref[:], ((1,), (0,)))  # (RB, C)
    gd_rep = mm(rep_oh_f, gd_ref[:], ((1,), (0,)))  # (RB, H)

    v_n = mm(gather_oh, kv_slab[:, c:], ((1,), (0,)))  # (RB, C)
    u = v_n + e_n

    s1 = mm(gn_rep * u, g1, ((1,), (0,)))  # (RB, H)
    dl = w * (s1 + gd_rep)  # (RB, H)
    dl_c = mm(dl, he, ((1,), (0,))) * scale  # (RB, C)

    dq_rep = dl_c * ke
    dq_ref[:] = mm(rep_oh_f, dq_rep, ((0,), (0,)))  # (NB, C)

    dk_n = dl_c * q_rep
    w_c = mm(w, he, ((1,), (0,)))  # (RB, C)
    dv_n = w_c * gn_rep
    dk_ref[:] = mm(gather_oh, dk_n.astype(cdtype), ((0,), (0,)))  # (S, C)
    dv_ref[:] = mm(gather_oh, dv_n.astype(cdtype), ((0,), (0,)))

    de_n = dk_n + dv_n
    da_ref[:] = mm(de_n, w_ref[:].astype(f32), ((1,), (1,)))  # (RB, A2)
    dw_part = mm(a_ref[:].astype(f32), de_n, ((0,), (0,)))  # (A2, C)

    @pl.when(b == 0)
    def _init():
        dw_ref[:] = dw_part

    @pl.when(b > 0)
    def _acc():
        dw_ref[:] = dw_ref[:] + dw_part


def _pallas_feats_bwd(
    starts, q2, f2, wkv, bkv, idx, mask, a2, w_flat, m2, gn2, gd2,
    *, nb, cap, slab, heads, head_dim, interpret,
):
    """Backward pallas_call for the feats kernel. Returns per-block
    (dq, dk_slabs, dv_slabs, da, dw_edge); slab gradients are the per-node
    k/v cotangents and still need overlap-add + the w_kv chain outside."""
    c = heads * head_dim
    f_dim = f2.shape[1]
    nblk = starts.shape[0]
    rb = nb * cap
    npad = nblk * nb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nb, c), lambda b, ss: (b, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((f_dim, 2 * c), lambda b, ss: (0, 0)),
            pl.BlockSpec((1, 2 * c), lambda b, ss: (0, 0)),
            pl.BlockSpec((rb, 1), lambda b, ss: (b, 0)),
            pl.BlockSpec((rb, 1), lambda b, ss: (b, 0)),
            pl.BlockSpec((rb, a2.shape[1]), lambda b, ss: (b, 0)),
            pl.BlockSpec((w_flat.shape[0], c), lambda b, ss: (0, 0)),
            pl.BlockSpec((nb, heads), lambda b, ss: (b, 0)),
            pl.BlockSpec((nb, c), lambda b, ss: (b, 0)),
            pl.BlockSpec((nb, heads), lambda b, ss: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, c), lambda b, ss: (b, 0)),
            pl.BlockSpec((slab, c), lambda b, ss: (b, 0)),
            pl.BlockSpec((slab, c), lambda b, ss: (b, 0)),
            pl.BlockSpec((rb, a2.shape[1]), lambda b, ss: (b, 0)),
            pl.BlockSpec((w_flat.shape[0], c), lambda b, ss: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab, f_dim), f2.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _feats_bwd_kernel, nb=nb, cap=cap, slab=slab, heads=heads, head_dim=head_dim
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((npad, c), jnp.float32),
            jax.ShapeDtypeStruct((nblk * slab, c), jnp.float32),
            jax.ShapeDtypeStruct((nblk * slab, c), jnp.float32),
            jax.ShapeDtypeStruct((npad * cap, a2.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((w_flat.shape[0], c), jnp.float32),
        ],
        interpret=interpret,
    )(starts, q2, f2, wkv, bkv, idx, mask, a2, w_flat, m2, gn2, gd2)


def _color_slab_blocks(starts_np: np.ndarray, slab: int) -> list:
    """Greedy interval coloring of the (static) slab windows: blocks within
    one color have disjoint [start, start+slab) windows, so each color
    assembles with ONE static concatenation and the colors sum — a handful
    of parallel dense ops instead of a num_blocks-long sequential scan."""
    color_blocks: list[list[int]] = []  # per color: block ids, start-sorted
    color_end: list[int] = []  # per color: end row of its last window
    for blk in np.argsort(starts_np, kind="stable"):
        s = int(starts_np[blk])
        for ci, end in enumerate(color_end):
            if s >= end:
                color_blocks[ci].append(int(blk))
                color_end[ci] = s + slab
                break
        else:
            color_blocks.append([int(blk)])
            color_end.append(s + slab)
    return color_blocks


def _overlap_add_colored(
    slabs: jnp.ndarray,  # (nblk, slab, width)
    color_blocks: list,
    starts_np: np.ndarray,
    slab: int,
    total_rows: int,
    width: int,
) -> jnp.ndarray:
    def assemble(blocks: list[int]) -> jnp.ndarray:
        segs, pos = [], 0
        for blk in blocks:
            s = int(starts_np[blk])
            if s > pos:
                segs.append(jnp.zeros((s - pos, width), jnp.float32))
            segs.append(slabs[blk])
            pos = s + slab
        if pos < total_rows:
            segs.append(jnp.zeros((total_rows - pos, width), jnp.float32))
        return jnp.concatenate(segs, axis=0)

    return functools.reduce(jnp.add, (assemble(blocks) for blocks in color_blocks))


def slot_attention_feats_pallas(
    query: jnp.ndarray,  # (N, H, D)
    feats: jnp.ndarray,  # (Ns, F) narrow source features (pre-projection)
    w_kv: jnp.ndarray,  # (F, 2C) fused [k|v] projection
    b_kv: jnp.ndarray,  # (2C,) fused [k|v] bias
    a_slots: jnp.ndarray,  # (R, A2) ones-augmented raw edge attrs
    w_aug: jnp.ndarray,  # (A2, H, D)
    plan: EdgeKernelPlan,
    interpret: bool = False,
):
    """Commuted-dataflow twin of ``slot_attention_partials_pallas``: the
    kernel DMAs the narrow feature slab and projects k/v in VMEM. Emits the
    same merge-form partials, equal to the k/v kernel up to the f32-matmul →
    compute-dtype rounding point of the projection."""
    n, h, d = query.shape
    ns = feats.shape[0]
    c = h * d
    nb, cap, slab = plan.block_nodes, plan.cap, plan.slab_width
    npad = plan.padded_dst

    q2 = _pad_rows(query.reshape(n, c), npad)
    ns_pad = max(-(-ns // 8) * 8, slab)
    f2 = _pad_rows(feats, ns_pad)
    wkv2 = w_kv.astype(f2.dtype)
    bkv2 = b_kv.reshape(1, 2 * c).astype(jnp.float32)
    w_flat = w_aug.reshape(w_aug.shape[0], c).astype(q2.dtype)
    a2 = a_slots.astype(q2.dtype)

    num, den, m = _pallas_feats_fwd(
        jnp.asarray(plan.slab_start),
        q2, f2, wkv2, bkv2,
        jnp.asarray(plan.src_slab_idx),
        jnp.asarray(plan.slot_mask),
        a2, w_flat,
        nb=nb, cap=cap, slab=slab, heads=h, head_dim=d, interpret=interpret,
    )
    from anemoi_models_tpu.ops.slot_attention import AttentionPartials

    return AttentionPartials(num=num[:n].reshape(n, h, d), den=den[:n], m=m[:n])


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def slot_attention_feats_kernel(query, feats, w_kv, b_kv, a_slots, w_aug, plan, interpret=False):
    """``slot_attention_feats_pallas`` with a hand-written backward kernel.

    Same m-gauge contract as :func:`slot_attention_partials_kernel`. The
    backward kernel emits per-node k/v cotangents (slab grads, overlap-added
    by static interval coloring); the chain through the projection —
    ``df = dk w_kᵀ + dv w_vᵀ``, ``dw_kv = fᵀ [dk|dv]``, ``db_kv = Σ [dk|dv]``
    — runs outside as per-node XLA matmuls.
    """
    return slot_attention_feats_pallas(query, feats, w_kv, b_kv, a_slots, w_aug, plan, interpret)


def _feats_kernel_fwd(query, feats, w_kv, b_kv, a_slots, w_aug, plan, interpret=False):
    out = slot_attention_feats_pallas(query, feats, w_kv, b_kv, a_slots, w_aug, plan, interpret)
    return out, (query, feats, w_kv, b_kv, a_slots, w_aug, out.m)


def _feats_kernel_bwd(plan, interpret, res, g):
    query, feats, w_kv, b_kv, a_slots, w_aug, m = res
    n, h, d = query.shape
    ns = feats.shape[0]
    c = h * d
    nb, cap, slab = plan.block_nodes, plan.cap, plan.slab_width
    nblk, npad = plan.num_blocks, plan.padded_dst

    q2 = _pad_rows(query.reshape(n, c), npad)
    ns_pad = max(-(-ns // 8) * 8, slab)
    f2 = _pad_rows(feats, ns_pad)
    wkv2 = w_kv.astype(f2.dtype)
    bkv2 = b_kv.reshape(1, 2 * c).astype(jnp.float32)
    w_flat = w_aug.reshape(w_aug.shape[0], c).astype(q2.dtype)
    a2 = a_slots.astype(q2.dtype)
    m2 = _pad_rows(m.astype(jnp.float32), npad)
    gn2 = _pad_rows(g.num.reshape(n, c).astype(jnp.float32), npad)
    gd2 = _pad_rows(g.den.astype(jnp.float32), npad)

    dq, dk_slabs, dv_slabs, da, dw_edge = _pallas_feats_bwd(
        jnp.asarray(plan.slab_start),
        q2, f2, wkv2, bkv2,
        jnp.asarray(plan.src_slab_idx),
        jnp.asarray(plan.slot_mask),
        a2, w_flat, m2, gn2, gd2,
        nb=nb, cap=cap, slab=slab, heads=h, head_dim=d, interpret=interpret,
    )

    dk_slabs = dk_slabs.reshape(nblk, slab, c)
    dv_slabs = dv_slabs.reshape(nblk, slab, c)
    starts_np = np.asarray(plan.slab_start, dtype=np.int64)
    color_blocks = _color_slab_blocks(starts_np, slab)
    dk_full = _overlap_add_colored(dk_slabs, color_blocks, starts_np, slab, ns_pad, c)
    dv_full = _overlap_add_colored(dv_slabs, color_blocks, starts_np, slab, ns_pad, c)

    # chain through the in-kernel projection, as per-NODE matmuls: the slab
    # grads ARE the per-node k/v cotangents after overlap-add
    dkv = jnp.concatenate([dk_full[:ns], dv_full[:ns]], axis=-1)  # (Ns, 2C) f32
    df = jax.lax.dot_general(
        dkv, w_kv.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(feats.dtype)  # (Ns, F)
    dw_kv = jax.lax.dot_general(
        feats.astype(jnp.float32), dkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w_kv.dtype)  # (F, 2C)
    db_kv = dkv.sum(axis=0).astype(b_kv.dtype)  # (2C,)

    return (
        dq[:n].reshape(n, h, d).astype(query.dtype),
        df,
        dw_kv,
        db_kv,
        da.astype(a_slots.dtype),
        dw_edge.reshape(w_aug.shape).astype(w_aug.dtype),
    )


slot_attention_feats_kernel.defvjp(_feats_kernel_fwd, _feats_kernel_bwd)
