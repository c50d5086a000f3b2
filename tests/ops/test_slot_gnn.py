"""Slot-layout GNN conv: twin vs reference path, kernel interpret parity."""

import jax
import jax.numpy as jnp
import numpy as np

from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.graphs.kernel_plan import build_edge_kernel_plan

C = 16


def _setup():
    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=3)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    plan = build_edge_kernel_plan(es.edge_index, n, n, block_nodes=32, cap=8, slab_width=64)
    rng = np.random.RandomState(0)
    w = {
        "Dense_0": {
            "kernel": jnp.asarray(rng.randn(3 * C, C) * 0.2, jnp.float32),
            "bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32),
        },
        "Dense_1": {
            "kernel": jnp.asarray(rng.randn(C, C) * 0.2, jnp.float32),
            "bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32),
        },
        "Dense_2": {
            "kernel": jnp.asarray(rng.randn(C, C) * 0.2, jnp.float32),
            "bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32),
        },
        "AutocastLayerNorm_0": {
            "LayerNorm_0": {"scale": jnp.ones(C), "bias": jnp.zeros(C)}
        },
    }
    return g, es, n, plan, w, rng


def test_planned_gnn_matches_edge_order_reference():
    """Slot + outlier decomposition equals the plain edge-order computation."""
    from anemoi_models_tpu.ops.segment import segment_sum
    from anemoi_models_tpu.ops.slot_gnn import apply_mlp_params, planned_gnn_conv

    g, es, n, plan, w, rng = _setup()
    x = jnp.asarray(rng.randn(2, n, C), jnp.float32)
    e_edge = jnp.asarray(rng.randn(2, es.num_edges, C), jnp.float32)

    src, dst = jnp.asarray(es.edge_index)
    x_i = jnp.take(x, dst, axis=1)
    x_j = jnp.take(x, src, axis=1)
    msg = apply_mlp_params(
        w, jnp.concatenate([x_i, x_j, e_edge], -1), "SiLU", jnp.float32
    ) + e_edge
    ref = segment_sum(msg, dst, n)

    agg, edges_new = planned_gnn_conv(x, e_edge, w, plan, "SiLU", impl="reference")
    np.testing.assert_allclose(np.asarray(agg), np.asarray(ref), atol=2e-5, rtol=1e-4)

    # threading a second layer through the slot layout stays equivalent
    msg2 = apply_mlp_params(w, jnp.concatenate([x_i, x_j, msg], -1), "SiLU", jnp.float32) + msg
    ref2 = segment_sum(msg2, dst, n)
    agg2, _ = planned_gnn_conv(x, edges_new, w, plan, "SiLU", impl="reference")
    np.testing.assert_allclose(np.asarray(agg2), np.asarray(ref2), atol=2e-5, rtol=1e-4)


def test_planned_gnn_grads_scatter_free():
    from anemoi_models_tpu.ops.slot_gnn import planned_gnn_conv

    g, es, n, plan, w, rng = _setup()
    x = jnp.asarray(rng.randn(1, n, C), jnp.float32)
    e_edge = jnp.asarray(rng.randn(1, es.num_edges, C), jnp.float32)

    def loss(x, e, w):
        agg, _ = planned_gnn_conv(x, e, w, plan, "SiLU", impl="reference")
        return jnp.sum(agg**2)

    gx, ge, gw = jax.grad(loss, argnums=(0, 1, 2))(x, e_edge, w)
    assert jnp.isfinite(gx).all() and float(jnp.abs(gx).max()) > 0
    assert jnp.isfinite(ge).all()
    for kp, leaf in jax.tree_util.tree_leaves_with_path(gw):
        assert jnp.isfinite(leaf).all(), kp
    text = jax.jit(jax.grad(loss, argnums=(0, 1, 2))).lower(x, e_edge, w).compile().as_text()
    assert "scatter(" not in text


def test_gnn_kernel_interpret_matches_twin():
    from anemoi_models_tpu.ops.pallas.gnn_conv import slot_gnn_pallas
    from anemoi_models_tpu.ops.slot_gnn import _slot_gnn_once

    g, es, n, plan, w, rng = _setup()
    x = jnp.asarray(rng.randn(n, C), jnp.float32)
    R = plan.padded_dst * plan.cap
    e = jnp.asarray(rng.randn(R, C) * np.asarray(plan.slot_mask), jnp.float32)
    agg_r, msg_r = _slot_gnn_once(x, e, w, plan, "SiLU")
    agg_p, msg_p = slot_gnn_pallas(x, e, w, plan, "SiLU", interpret=True)
    np.testing.assert_allclose(np.asarray(agg_r), np.asarray(agg_p), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(msg_r), np.asarray(msg_p), atol=2e-5, rtol=1e-4)
