"""Slot-layout edge attention with exact two-source softmax merging.

The TPU-native formulation of the GraphTransformer per-edge attention
(reference ``layers/conv.py:79-142``) for bandwidth-ordered graphs:

- **slot path**: destinations are processed in static blocks; each block's
  neighbor sources live in one contiguous ``slab_width`` window of the source
  tensor (``graphs/kernel_plan.py``). Neighbor k/v rows are materialized from
  the slab by one-hot matmuls — MXU work instead of HBM gathers. The edge
  bias ``q·e`` and value term ``Σ α·e`` factor through the *raw* edge
  attributes (A ≈ 15 dims) because ``e = W_e·a`` is linear: only narrow
  per-slot tensors are ever built.
- **outlier path**: edges the plan could not place (long-range multiscale
  levels, degree overflow) run as plain COO segment ops.
- both paths emit softmax *partials* ``(num, den, m)`` that merge exactly, so
  splitting the edge set never changes the result.

``slot_attention_partials`` is the jnp twin of the Pallas kernel
(``ops/pallas/edge_attention.py``) — same math, runs on any backend, and is
the correctness oracle for both the forward and the hand-written backward
kernel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from anemoi_models_tpu.graphs.kernel_plan import EdgeKernelPlan
from anemoi_models_tpu.ops.segment import segment_max, segment_sum

__all__ = [
    "AttentionPartials",
    "PlannedTables",
    "slot_attention_partials",
    "coo_attention_partials",
    "dense_outlier_partials",
    "halo_planned_edge_inputs",
    "merge_partials",
    "finalize_partials",
    "planned_edge_attention",
    "planned_edge_attention_feats",
    "slot_attention_feats_partials",
]

_NEG = -1e30


class AttentionPartials(NamedTuple):
    num: jnp.ndarray  # (N, H, D) fp32 — Σ exp(logit - m) · (v + e)
    den: jnp.ndarray  # (N, H) fp32 — Σ exp(logit - m)
    m: jnp.ndarray  # (N, H) fp32 — per-destination max logit (−1e30 if none)


@jax.tree_util.register_static
class PlannedTables:
    """Marker passed through the layer stack in place of bucketed tables when
    an edge set should run through the kernel plan (``graph_impl="pallas"``).
    Registered as a *static* pytree so it rides through nn.remat/jit as
    compile-time metadata (the plan arrays are baked-in constants)."""

    def __init__(self, plan: EdgeKernelPlan, impl: str = "auto"):
        self.plan = plan
        self.impl = impl


def _affine_from_closure(edge_transform, a_dim: int, num_heads: int, head_dim: int):
    """Extract (W_aug) of the linear edge projection from its closure.

    ``edge_transform: (..., A) -> (..., H, D)`` is affine in the attributes;
    probing it with a basis recovers ``W`` and ``b`` as parameter-only
    expressions XLA folds at compile time. Returns (A+1, H, D) with the bias
    as the last row (the slot layout augments attributes with a ones column).
    """
    eye = jnp.concatenate([jnp.eye(a_dim), jnp.zeros((1, a_dim))], axis=0)  # (A+1, A)
    probed = edge_transform(eye)  # (A+1, H, D): rows = W + b, last = b
    b = probed[-1]
    w = probed[:-1] - b[None]
    return jnp.concatenate([w, b[None]], axis=0)  # (A+1, H, D)


def halo_planned_edge_inputs(a0: jnp.ndarray, sp, edge_transform):
    """Build the sharded slot/outlier edge inputs for the halo kernel path.

    ``a0`` (E, A) raw edge attributes (batch-invariant). Returns
    ``(a_slots (S, R, A+1), e_out (S, Eo, H, D), w_aug (A+1, H, D))`` with
    scatter-free gather adjoints: padded id slots point at an appended
    sentinel zero row and every real edge is read exactly once, so each
    adjoint is one masked position-take (``slot_pos_of_edge`` /
    ``out_pos_of_edge``).
    """
    from anemoi_models_tpu.ops.dense_graph import _masked_pos_take, take_rows

    e = a0.shape[0]
    a0p = jnp.concatenate([a0, jnp.zeros_like(a0[:1])], axis=0)

    def pad_row(g):
        return jnp.concatenate([g, jnp.zeros_like(g[:1])], axis=0)

    def adj_slots(g):  # (S, R, A) -> (E+1, A)
        flat = g.reshape(-1, g.shape[-1])
        return pad_row(_masked_pos_take(flat, sp.slot_pos_of_edge, e, axis=-2))

    # plan arrays stay host numpy (concrete): converting under an nn.remat
    # trace stages a tracer that the custom_vjp closure would leak
    a_slots = take_rows(a0p, sp.edge_ids, 0, adj_slots)
    a_slots = jnp.concatenate(
        [a_slots, jnp.ones_like(a_slots[..., :1])], axis=-1
    ) * jnp.asarray(sp.slot_mask)

    def adj_out(g):  # (S, Eo, A) -> (E+1, A)
        flat = g.reshape(-1, g.shape[-1])
        return pad_row(_masked_pos_take(flat, sp.out_pos_of_edge, e, axis=-2))

    a_out = take_rows(a0p, sp.out_eid, 0, adj_out)
    e_out = edge_transform(a_out)  # (S, Eo, H, D)
    h, d = e_out.shape[-2:]
    w_aug = _affine_from_closure(edge_transform, a0.shape[-1], h, d)
    return a_slots, e_out, w_aug


def slot_attention_partials(
    query: jnp.ndarray,  # (N, H, D)
    key: jnp.ndarray,  # (Ns, H, D)
    value: jnp.ndarray,  # (Ns, H, D)
    a_slots: jnp.ndarray,  # (R, A') raw edge attrs per slot (ones-augmented)
    w_aug: jnp.ndarray,  # (A', H, D) edge projection (bias folded in)
    plan: EdgeKernelPlan,
) -> AttentionPartials:
    """Blocked slot-layout attention partials (jnp; kernel-equivalent math)."""
    n, h, d = query.shape
    npad = plan.padded_dst
    cap, nb = plan.cap, plan.block_nodes
    scale = 1.0 / np.sqrt(d)

    mask = jnp.asarray(plan.slot_mask[:, 0])  # (R,)

    # global source row per slot; padded slots point at row 0 and are masked
    block_of = np.arange(npad * cap) // (nb * cap)
    gsrc = plan.slab_start.astype(np.int64)[block_of] + plan.src_slab_idx[:, 0]

    if plan.t_src is not None:
        from anemoi_models_tpu.ops.dense_graph import _transpose_sum, take_rows

        ns = key.shape[0]

        def adj_src(g):
            gf = g.reshape(-1, h * d)
            return _transpose_sum(gf, plan.t_src, ns).reshape(ns, h, d)

        k_n = take_rows(key, gsrc, 0, adj_src)  # (R, H, D)
        v_n = take_rows(value, gsrc, 0, adj_src)
    else:
        k_n = jnp.take(key, gsrc, axis=0)
        v_n = jnp.take(value, gsrc, axis=0)
    e_n = jnp.einsum("ra,ahd->rhd", a_slots, w_aug)  # (R, H, D)

    qpad = jnp.pad(query, ((0, npad - n), (0, 0), (0, 0)))
    q_rep = jnp.repeat(qpad, cap, axis=0)  # (R, H, D)

    logits = jnp.einsum(
        "rhd,rhd->rh", q_rep, k_n + e_n, preferred_element_type=jnp.float32
    ) * scale
    logits = jnp.where(mask[:, None] > 0, logits, _NEG)

    lg = logits.reshape(npad, cap, h)
    m = jnp.max(lg, axis=1)  # (Np, H)
    w = jnp.exp(lg - m[:, None]) * jnp.asarray(plan.slot_mask[:, 0]).reshape(npad, cap)[..., None]
    den = jnp.sum(w, axis=1)  # (Np, H)
    contrib = (v_n + e_n).astype(jnp.float32).reshape(npad, cap, h, d)
    num = jnp.einsum("nch,nchd->nhd", w, contrib)
    return AttentionPartials(num=num[:n], den=den[:n], m=m[:n])


def coo_attention_partials(
    query: jnp.ndarray,  # (N, H, D)
    key: jnp.ndarray,  # (Ns, H, D)
    value: jnp.ndarray,  # (Ns, H, D)
    e_proj: jnp.ndarray,  # (E, H, D) projected edge features for these edges
    src: jnp.ndarray,  # (E,) int32
    dst: jnp.ndarray,  # (E,) int32
    num_dst: int,
    t_src=None,  # transpose tables -> gather-only backward for key/value
    t_dst=None,  # same for query
) -> AttentionPartials:
    """Plain COO segment-op partials for edges outside the kernel plan.

    (The sharded halo path uses :func:`dense_outlier_partials` instead —
    its forward avoids the segment ops' HLO scatters.)
    """
    h, d = query.shape[-2:]
    scale = 1.0 / np.sqrt(d)

    def make_adj(t_tab, rows):
        if t_tab is None:
            return None
        from anemoi_models_tpu.ops.dense_graph import _transpose_sum

        def adj(g):
            return _transpose_sum(g.reshape(-1, h * d), t_tab, rows).reshape(rows, h, d)

        return adj

    from anemoi_models_tpu.ops.dense_graph import take_rows

    q_i = take_rows(query, dst, 0, make_adj(t_dst, query.shape[0]))
    k_j = take_rows(key, src, 0, make_adj(t_src, key.shape[0])) + e_proj
    v_j = take_rows(value, src, 0, make_adj(t_src, value.shape[0])) + e_proj
    logits = jnp.einsum("ehd,ehd->eh", q_i, k_j, preferred_element_type=jnp.float32) * scale
    m = segment_max(logits, dst, num_dst)  # (N, H); -inf where no edges
    m = jnp.maximum(m, _NEG)
    w = jnp.exp(logits - jnp.take(m, dst, axis=0))
    den = segment_sum(w, dst, num_dst)
    contrib = (w[..., None] * v_j.astype(jnp.float32)).reshape(len(src), h * d)
    num = segment_sum(contrib, dst, num_dst).reshape(num_dst, h, d)
    return AttentionPartials(num=num, den=den, m=m)


def dense_outlier_partials(
    query: jnp.ndarray,  # (N, H, D)
    key: jnp.ndarray,  # (Ns, H, D)
    value: jnp.ndarray,  # (Ns, H, D)
    e_out: jnp.ndarray,  # (Eo, H, D) projected outlier edge features
    out_src: jnp.ndarray,  # (Eo,) int32 source rows
    t_src,  # PaddedTranspose over source rows (k/v gather adjoint)
    dst_tab: jnp.ndarray,  # (N, Md) int32 outlier positions per destination
    dst_mask: jnp.ndarray,  # (N, Md) bool
    dst_inv: jnp.ndarray,  # (Eo,) int32 flattened (N·Md) slot per position
) -> AttentionPartials:
    """Outlier partials as dense per-destination masked reductions.

    Unlike :func:`coo_attention_partials` (segment ops → forward scatters),
    every op here is a take or a static-width reduce, so forward AND
    backward are scatter-free — usable inside shard_map with traced,
    shard-sliced layout arrays (the halo kernel path).
    """
    from anemoi_models_tpu.ops.dense_graph import padded_take, table_take

    h, d = query.shape[-2:]
    scale = 1.0 / np.sqrt(d)
    k_j = padded_take(key, out_src, t_src.tab, t_src.mask) + e_out  # (Eo, H, D)
    v_j = padded_take(value, out_src, t_src.tab, t_src.mask) + e_out
    ke = table_take(k_j, dst_tab, dst_mask, dst_inv)  # (N, Md, H, D)
    ve = table_take(v_j, dst_tab, dst_mask, dst_inv)
    logits = jnp.einsum(
        "nhd,nmhd->nmh", query, ke, preferred_element_type=jnp.float32
    ) * scale
    logits = jnp.where(dst_mask[..., None], logits, _NEG)
    m = jnp.maximum(jnp.max(logits, axis=1), _NEG)  # (N, H)
    w = jnp.exp(jnp.minimum(logits - m[:, None], 0.0)) * dst_mask[..., None]
    den = jnp.sum(w, axis=1)
    num = jnp.einsum("nmh,nmhd->nhd", w, ve.astype(jnp.float32))
    return AttentionPartials(num=num, den=den, m=m)


def merge_partials(p1: AttentionPartials, p2: AttentionPartials) -> AttentionPartials:
    """Exact combination of two disjoint-edge-set softmax partials."""
    m = jnp.maximum(p1.m, p2.m)
    f1 = jnp.where(p1.den > 0, jnp.exp(p1.m - m), 0.0)
    f2 = jnp.where(p2.den > 0, jnp.exp(p2.m - m), 0.0)
    return AttentionPartials(
        num=p1.num * f1[..., None] + p2.num * f2[..., None],
        den=p1.den * f1 + p2.den * f2,
        m=m,
    )


def finalize_partials(p: AttentionPartials, out_dtype) -> jnp.ndarray:
    """(num, den, m) -> attention output (N, H, D)."""
    return (p.num / jnp.maximum(p.den, 1e-16)[..., None]).astype(out_dtype)


def _passes_of(plan):
    """(pass plans, final plan) — a MultiPassPlan unrolls to its chain."""
    from anemoi_models_tpu.graphs.kernel_plan import MultiPassPlan

    plans = plan.plans if isinstance(plan, MultiPassPlan) else (plan,)
    return plans, plans[-1]


def _slot_attrs(a0: jnp.ndarray, plan: EdgeKernelPlan) -> jnp.ndarray:
    """(E, A) raw edge attrs -> (R, A+1) ones-augmented, mask-zeroed slot
    attributes for one plan (scatter-free adjoint via slot_of_edge)."""
    if plan.slot_of_edge is not None:
        from anemoi_models_tpu.ops.dense_graph import _masked_pos_take, take_rows

        num_edges = a0.shape[0]

        def adj_a(g):
            return _masked_pos_take(g, plan.slot_of_edge, num_edges, axis=-2)

        a_slots = take_rows(a0, plan.edge_ids, 0, adj_a)
    else:
        a_slots = jnp.take(a0, jnp.asarray(plan.edge_ids), axis=0)
    a_slots = jnp.concatenate([a_slots, jnp.ones_like(a_slots[:, :1])], axis=-1)
    return a_slots * jnp.asarray(plan.slot_mask)


def _outlier_attrs(a0: jnp.ndarray, plan: EdgeKernelPlan) -> jnp.ndarray:
    """Raw attrs of a plan's outlier edges (scatter-free adjoint)."""
    if plan.out_pos_of_edge is not None and len(plan.outlier_src):
        from anemoi_models_tpu.ops.dense_graph import _masked_pos_take, take_rows

        def adj_ao(g):
            return _masked_pos_take(g, plan.out_pos_of_edge, a0.shape[0], axis=-2)

        return take_rows(a0, plan.outlier_edge_ids, 0, adj_ao)
    return jnp.take(a0, jnp.asarray(plan.outlier_edge_ids), axis=0)


def planned_edge_attention(
    query: jnp.ndarray,  # (B, N, H, D)
    key: jnp.ndarray,  # (B, Ns, H, D)
    value: jnp.ndarray,  # (B, Ns, H, D)
    edge_attr_raw: jnp.ndarray,  # (B, E, A) raw edge attributes
    edge_transform,  # affine (..., A) -> (..., H, D)
    plan,  # EdgeKernelPlan | MultiPassPlan
    impl: str = "auto",
) -> jnp.ndarray:
    """Full per-edge attention through the kernel plan.

    Drop-in equivalent of the bucketed-table path for a planned edge set:
    slot partials (Pallas kernel on TPU, jnp twin elsewhere) merged with the
    COO outlier partials. A :class:`MultiPassPlan` runs one slot pass per
    window chain link and merges the partials exactly — the same softmax
    split that already folds in the outlier path.
    """
    h, d = query.shape[-2:]
    a_dim = edge_attr_raw.shape[-1]
    w_aug = _affine_from_closure(edge_transform, a_dim, h, d)
    plans, last = _passes_of(plan)

    # slot attributes: batch-invariant (trainable edge params repeat over
    # batch), so build from batch element 0 and augment with the ones column
    a0 = edge_attr_raw[0]
    a_slots_per_pass = [_slot_attrs(a0, p) for p in plans]

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "reference"

    o_src = jnp.asarray(last.outlier_src)
    o_dst = jnp.asarray(last.outlier_dst)
    e_out = edge_transform(_outlier_attrs(a0, last))

    def batched(q, k, v, e_out, slot_fn):
        def one(q1, k1, v1):
            p = slot_fn(q1, k1, v1, a_slots_per_pass[0], w_aug, plans[0])
            for a_s, pp in zip(a_slots_per_pass[1:], plans[1:]):
                p = merge_partials(p, slot_fn(q1, k1, v1, a_s, w_aug, pp))
            if len(last.outlier_src):
                e1 = e_out[0] if e_out.ndim == 4 else e_out
                if last.out_tables is not None:
                    # bucketed outlier partials: scatter-free fwd AND bwd
                    from anemoi_models_tpu.ops.dense_graph import (
                        TransposeBundle,
                        bucketed_edge_attention,
                    )

                    num, den, mx = bucketed_edge_attention(
                        q1[None], k1[None], v1[None], e1[None],
                        last.out_tables[0], last.out_tables[1],
                        transpose=TransposeBundle(last.out_transpose),
                        return_partials=True,
                    )
                    p2 = AttentionPartials(num=num[0], den=den[0], m=mx[0])
                else:
                    p2 = coo_attention_partials(
                        q1, k1, v1, e1, o_src, o_dst, last.num_dst,
                        t_src=last.t_out_src, t_dst=last.t_out_dst,
                    )
                p = merge_partials(p, p2)
            return finalize_partials(p, value.dtype)

        if slot_fn is not ref_slot:
            # unroll the batch instead of vmapping the Pallas call (Mosaic
            # does not batch the kernel); B is small in the B=1-per-chip
            # serving regime
            return jnp.stack([one(q[i], k[i], v[i]) for i in range(q.shape[0])])
        if q.shape[0] == 1:
            return one(q[0], k[0], v[0])[None]
        return jax.vmap(one)(q, k, v)

    def ref_slot(q1, k1, v1, a_s, w_a, p):
        return slot_attention_partials(q1, k1, v1, a_s, w_a, p)

    if impl != "pallas":
        return batched(query, key, value, e_out, ref_slot)

    # forward AND backward are hand-written kernels (custom_vjp inside);
    # the outlier/merge/finalize surroundings differentiate normally through
    # the scatter-free transpose-table adjoints
    from anemoi_models_tpu.ops.pallas.edge_attention import slot_attention_partials_kernel

    interpret = jax.default_backend() != "tpu"

    def pallas_slot(q1, k1, v1, a_s, w_a, p):
        return slot_attention_partials_kernel(q1, k1, v1, a_s, w_a, p, interpret)

    return batched(query, key, value, e_out, pallas_slot)


def slot_attention_feats_partials(
    query: jnp.ndarray,  # (N, H, D)
    feats: jnp.ndarray,  # (Ns, F) narrow source features
    w_kv: jnp.ndarray,  # (F, 2C) fused [k|v] projection
    b_kv: jnp.ndarray,  # (2C,)
    a_slots: jnp.ndarray,
    w_aug: jnp.ndarray,
    plan: EdgeKernelPlan,
) -> AttentionPartials:
    """jnp twin of the feats (commuted-dataflow) kernel: project k/v per
    node, then run the slot partials — same values up to the projection's
    rounding point (the kernel projects gathered slab rows; per-row linear
    maps commute with row gathers)."""
    h, d = query.shape[-2:]
    c = h * d
    kv = (
        jnp.einsum("nf,fc->nc", feats, w_kv, preferred_element_type=jnp.float32)
        + b_kv
    ).astype(feats.dtype)
    key = kv[:, :c].reshape(-1, h, d)
    value = kv[:, c:].reshape(-1, h, d)
    return slot_attention_partials(query, key, value, a_slots, w_aug, plan)


def planned_edge_attention_feats(
    query: jnp.ndarray,  # (B, N, H, D)
    feats: jnp.ndarray,  # (B, Ns, F) narrow source features (post-LN)
    w_kv: jnp.ndarray,  # (F, 2C) probed fused [k|v] kernel
    b_kv: jnp.ndarray,  # (2C,) probed fused bias
    edge_attr_raw: jnp.ndarray,  # (B, E, A) raw edge attributes
    edge_transform,  # affine (..., A) -> (..., H, D)
    plan: EdgeKernelPlan,
    impl: str = "auto",
) -> jnp.ndarray:
    """Commuted-dataflow twin of :func:`planned_edge_attention`.

    The kernel DMAs ONE narrow feature slab per destination block and
    projects k/v inside VMEM (``ops/pallas/edge_attention._feats_kernel``):
    half the k/v kernel's slab bytes, one one-hot gather instead of two, and
    the per-node k/v tensors never exist in HBM. Outlier edges run the
    narrow bucketed path (k/v projected per *gathered* row — the same
    commute), so no path materializes a wide per-node or per-edge tensor.
    """
    h, d = query.shape[-2:]
    c = h * d
    a_dim = edge_attr_raw.shape[-1]
    w_aug = _affine_from_closure(edge_transform, a_dim, h, d)
    plans, last = _passes_of(plan)

    a0 = edge_attr_raw[0]
    a_slots_per_pass = [_slot_attrs(a0, p) for p in plans]

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "reference"

    has_outliers = len(last.outlier_src) > 0
    if has_outliers:
        a_out = _outlier_attrs(a0, last)

    def src_tf(g):
        """(..., cap, F) gathered rows -> (k, v) each (..., cap, H, D)."""
        kv = (
            jnp.einsum("...f,fc->...c", g, w_kv, preferred_element_type=jnp.float32)
            + b_kv
        ).astype(g.dtype)
        shape = (*kv.shape[:-1], h, d)
        return kv[..., :c].reshape(shape), kv[..., c:].reshape(shape)

    def slot_pass(q1, f1, a_s, pp):
        if impl == "pallas":
            from anemoi_models_tpu.ops.pallas.edge_attention import (
                slot_attention_feats_kernel,
            )

            interpret = jax.default_backend() != "tpu"
            return slot_attention_feats_kernel(
                q1, f1, w_kv, b_kv, a_s, w_aug, pp, interpret
            )
        return slot_attention_feats_partials(q1, f1, w_kv, b_kv, a_s, w_aug, pp)

    def one(q1, f1):
        p = slot_pass(q1, f1, a_slots_per_pass[0], plans[0])
        for a_s, pp in zip(a_slots_per_pass[1:], plans[1:]):
            p = merge_partials(p, slot_pass(q1, f1, a_s, pp))
        if has_outliers:
            assert last.out_tables is not None, (
                "feats outlier path needs the bucketed out_tables"
            )
            from anemoi_models_tpu.ops.dense_graph import (
                TransposeBundle,
                bucketed_edge_attention,
            )

            num, den, mx = bucketed_edge_attention(
                q1[None], f1[None], None, a_out[None],
                last.out_tables[0], last.out_tables[1],
                edge_transform=edge_transform,
                transpose=TransposeBundle(last.out_transpose),
                return_partials=True,
                src_transform=src_tf,
            )
            p = merge_partials(p, AttentionPartials(num=num[0], den=den[0], m=mx[0]))
        return finalize_partials(p, query.dtype)

    if query.shape[0] == 1:
        return one(query[0], feats[0])[None]
    # unroll the batch (the Pallas call does not vmap); B is small in the
    # B=1-per-chip serving regime
    return jnp.stack([one(query[i], feats[i]) for i in range(query.shape[0])])
