"""Commuted-dataflow (feats) kernel path: one narrow slab DMA, k/v projected
in VMEM (``ops/pallas/edge_attention._feats_kernel``), outliers on the
narrow bucketed path. Must match the k/v planned path built from the same
projection, in values and grads, on both the jnp twin and the interpreted
Pallas kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.graphs.kernel_plan import build_edge_kernel_plan
from anemoi_models_tpu.ops.slot_attention import (
    planned_edge_attention,
    planned_edge_attention_feats,
)

H, D, A = 4, 8, 3
C = H * D
F = 16  # narrow feature width


def _setup(seed=0):
    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=3)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    plan = build_edge_kernel_plan(
        es.edge_index, n, n, block_nodes=32, cap=8, slab_width=64
    )
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(1, n, H, D), jnp.float32)
    feats = jnp.asarray(rng.randn(1, n, F), jnp.float32)
    w_kv = jnp.asarray(rng.randn(F, 2 * C) * 0.3, jnp.float32)
    b_kv = jnp.asarray(rng.randn(2 * C) * 0.1, jnp.float32)
    a_raw = jnp.asarray(rng.randn(es.num_edges, A), jnp.float32)[None]
    w = jnp.asarray(rng.randn(A, C) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)

    def edge_transform(a):
        e = a @ w + b
        return e.reshape(*e.shape[:-1], H, D)

    return plan, q, feats, w_kv, b_kv, a_raw, edge_transform


def _kv_from(feats, w_kv, b_kv):
    kv = feats @ w_kv + b_kv
    k, v = jnp.split(kv, 2, axis=-1)
    shape = (*k.shape[:-1], H, D)
    return k.reshape(shape), v.reshape(shape)


def test_feats_reference_matches_planned():
    plan, q, feats, w_kv, b_kv, a_raw, edge_transform = _setup()
    k, v = _kv_from(feats, w_kv, b_kv)
    ref = planned_edge_attention(q, k, v, a_raw, edge_transform, plan, impl="reference")
    out = planned_edge_attention_feats(
        q, feats, w_kv, b_kv, a_raw, edge_transform, plan, impl="reference"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-4)


def test_feats_pallas_interpret_matches_reference():
    plan, q, feats, w_kv, b_kv, a_raw, edge_transform = _setup(seed=1)
    ref = planned_edge_attention_feats(
        q, feats, w_kv, b_kv, a_raw, edge_transform, plan, impl="reference"
    )
    out = planned_edge_attention_feats(
        q, feats, w_kv, b_kv, a_raw, edge_transform, plan, impl="pallas"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-4)


def test_feats_pallas_grads_match_reference():
    """The hand-written backward kernel + outside w_kv chain vs JAX AD
    through the jnp twin — dq, dfeats, dw_kv, db_kv, and the edge-closure
    grads all agree."""
    plan, q, feats, w_kv, b_kv, a_raw, edge_transform = _setup(seed=2)

    def loss(impl, q, feats, w_kv, b_kv):
        out = planned_edge_attention_feats(
            q, feats, w_kv, b_kv, a_raw, edge_transform, plan, impl=impl
        )
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.01))

    g_ref = jax.grad(lambda *a: loss("reference", *a), argnums=(0, 1, 2, 3))(
        q, feats, w_kv, b_kv
    )
    g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3))(
        q, feats, w_kv, b_kv
    )
    for name, a, b in zip(("dq", "dfeats", "dw_kv", "db_kv"), g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-3, err_msg=name
        )


def test_feats_bf16():
    plan, q, feats, w_kv, b_kv, a_raw, edge_transform = _setup(seed=3)
    q, feats = q.astype(jnp.bfloat16), feats.astype(jnp.bfloat16)
    k, v = _kv_from(feats, w_kv.astype(jnp.bfloat16), b_kv.astype(jnp.bfloat16))
    ref = planned_edge_attention(
        q, k, v, a_raw.astype(jnp.bfloat16), edge_transform, plan, impl="reference"
    )
    out = planned_edge_attention_feats(
        q, feats, w_kv.astype(jnp.bfloat16), b_kv.astype(jnp.bfloat16),
        a_raw.astype(jnp.bfloat16), edge_transform, plan, impl="pallas",
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-2, rtol=5e-2
    )


def test_processor_planned_commute_matches_wide():
    """GraphTransformerProcessor(graph_impl='pallas') with kv_src_gather
    'commute': identical parameter tree to the wide planned path, matching
    outputs and parameter gradients."""
    import flax

    from anemoi_models_tpu.layers.processor import GraphTransformerProcessor

    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=3)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    x = jnp.asarray(np.random.RandomState(4).randn(1, n, 32), jnp.float32)
    kw = dict(num_layers=2, num_channels=32, num_chunks=1, num_heads=4,
              sub_graph=es, graph_impl="pallas")
    wide = GraphTransformerProcessor(kv_src_gather="wide", **kw)
    comm = GraphTransformerProcessor(kv_src_gather="commute", **kw)
    p = wide.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        comm.init(jax.random.key(0), x)
    )
    out_w = wide.apply(p, x)
    out_c = comm.apply(p, x)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_c), rtol=2e-5, atol=2e-5)

    def loss(m, pp):
        return (m.apply(pp, x) ** 2).sum()

    gw = flax.traverse_util.flatten_dict(jax.grad(lambda pp: loss(wide, pp))(p)["params"])
    gc = flax.traverse_util.flatten_dict(jax.grad(lambda pp: loss(comm, pp))(p)["params"])
    for kk, vv in gc.items():
        np.testing.assert_allclose(
            np.asarray(vv), np.asarray(gw[kk]), rtol=1e-3, atol=5e-4, err_msg=str(kk)
        )
