"""Dense (padded-neighbor) graph aggregation ops — the TPU fast path.

Given the build-time dense neighbor tables (``graphs/partition.py``),
aggregation and per-edge attention become gathers plus reductions over a
static ``max_degree`` axis: no scatter, no segment ops, fully vectorized on
the VPU with the contraction work on the MXU. These are numerically identical
to the ``ops/segment.py`` reference path (tests assert it).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

__all__ = ["gather_edges", "masked_neighbor_sum", "dense_edge_attention"]


def gather_edges(x_edges: jnp.ndarray, edge_ids: jnp.ndarray) -> jnp.ndarray:
    """Gather per-edge values into neighbor-table layout.

    x_edges (..., E, C), edge_ids (N, deg) -> (..., N, deg, C).
    """
    return jnp.take(x_edges, edge_ids, axis=-2)


def masked_neighbor_sum(
    x: jnp.ndarray, mask: jnp.ndarray, axis: int = -2
) -> jnp.ndarray:
    """Sum over the padded neighbor axis with validity masking.

    x (..., N, deg, C), mask (N, deg) -> (..., N, C).
    """
    return jnp.where(mask[..., None], x, 0).sum(axis=axis)


def dense_edge_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    edge_attr: Optional[jnp.ndarray],
    src_ids: jnp.ndarray,
    edge_ids: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Per-edge attention in dense neighbor-table form.

    query (B, N, H, D) [destination nodes], key/value (B, Ns, H, D),
    edge_attr (B, E, H, D) or None, tables (N, deg). Returns (B, N, H, D).

    Equivalent to :func:`anemoi_models_tpu.layers.conv.graph_transformer_conv`
    (which mirrors reference ``layers/conv.py:79-142``) but with softmax over
    a static degree axis instead of segment softmax.
    """
    out_channels = query.shape[-1]
    k_n = jnp.take(key, src_ids, axis=-3)  # (B, N, deg, H, D)
    v_n = jnp.take(value, src_ids, axis=-3)
    if edge_attr is not None:
        e_n = jnp.take(edge_attr, edge_ids, axis=-3)
        k_n = k_n + e_n
        v_n = v_n + e_n

    scale = 1.0 / jnp.sqrt(jnp.asarray(out_channels, jnp.float32))
    # fp32 accumulation of the q·k contraction (bf16-safe softmax logits)
    logits = jnp.einsum(
        "...nhd,...nkhd->...nkh", query, k_n, preferred_element_type=jnp.float32
    ) * scale
    logits = jnp.where(mask[..., None], logits, -jnp.inf)
    m = jnp.max(logits, axis=-2, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    w = jnp.exp(logits - m)
    w = jnp.where(mask[..., None], w, 0.0)
    denom = jnp.maximum(w.sum(axis=-2, keepdims=True), 1e-16)
    alpha = (w / denom).astype(value.dtype)
    return (v_n * alpha[..., None]).sum(axis=-3)


def bucketed_neighbor_sum(
    x_edges: jnp.ndarray, buckets, reassemble: jnp.ndarray
) -> jnp.ndarray:
    """Sum per-edge values into destinations using degree-bucketed tables.

    x_edges (..., E, C); returns (..., num_dst, C). Pure gathers + static
    reductions — no scatter, and no padding to the global max degree.
    """
    outs = []
    for _, edge_ids, _, mask in buckets:
        g = jnp.take(x_edges, edge_ids, axis=-2)  # (..., nb, cap, C)
        outs.append(jnp.where(mask[..., None], g, 0).sum(axis=-2))
    cat = jnp.concatenate(outs, axis=-2)
    return jnp.take(cat, reassemble, axis=-2)


def bucketed_edge_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    edge_attr,
    buckets,
    reassemble: jnp.ndarray,
    edge_transform=None,
) -> jnp.ndarray:
    """Per-edge attention over degree-bucketed tables.

    query (B, N, H, D) [destinations], key/value (B, Ns, H, D). Equivalent to
    :func:`dense_edge_attention` but each degree bucket is padded only to its
    own cap.

    ``edge_attr`` is either (B, E, H, D) projected edge features, or — when
    ``edge_transform`` is given — a *raw* (B, E, A) attribute tensor that is
    gathered narrow (A wide, cheap) and projected per bucket by
    ``edge_transform: (..., cap, A) -> (..., cap, H, D)``. Projecting after
    the gather keeps the E-wide projected tensor out of HBM entirely.
    """
    outs = []
    for node_ids, edge_ids, src_ids, mask in buckets:
        q_b = jnp.take(query, node_ids, axis=-3)  # (B, nb, H, D)
        k_n = jnp.take(key, src_ids, axis=-3)  # (B, nb, cap, H, D)
        v_n = jnp.take(value, src_ids, axis=-3)
        if edge_attr is not None:
            if edge_transform is not None:
                e_n = edge_transform(jnp.take(edge_attr, edge_ids, axis=-2))
            else:
                e_n = jnp.take(edge_attr, edge_ids, axis=-3)
            k_n = k_n + e_n
            v_n = v_n + e_n

        d = q_b.shape[-1]
        scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
        # fp32 accumulation of the q·k contraction (bf16-safe softmax logits)
        logits = jnp.einsum(
            "...nhd,...nkhd->...nkh", q_b, k_n, preferred_element_type=jnp.float32
        ) * scale
        logits = jnp.where(mask[..., None], logits, -jnp.inf)
        m = jnp.max(logits, axis=-2, keepdims=True)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        w = jnp.exp(logits - m)
        w = jnp.where(mask[..., None], w, 0.0)
        denom = jnp.maximum(w.sum(axis=-2, keepdims=True), 1e-16)
        alpha = (w / denom).astype(value.dtype)
        outs.append((v_n * alpha[..., None]).sum(axis=-3))
    cat = jnp.concatenate(outs, axis=-3)
    return jnp.take(cat, reassemble, axis=-3)
