"""Planned (slot + outlier merge) edge attention vs the COO reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.graphs.kernel_plan import build_edge_kernel_plan
from anemoi_models_tpu.layers.conv import graph_transformer_conv
from anemoi_models_tpu.ops.slot_attention import planned_edge_attention

H, D, A = 4, 8, 3


def _setup(seed=0, refinements=3, slab=64, cap=8, nb=32):
    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=refinements)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    plan = build_edge_kernel_plan(
        es.edge_index, n, n, block_nodes=nb, cap=cap, slab_width=slab
    )
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(2, n, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(2, n, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(2, n, H, D), jnp.float32)
    a_raw = jnp.asarray(rng.randn(es.num_edges, A), jnp.float32)
    a_raw = jnp.broadcast_to(a_raw[None], (2, es.num_edges, A))
    w = jnp.asarray(rng.randn(A, H * D) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(H * D) * 0.1, jnp.float32)

    def edge_transform(a):
        e = a @ w + b
        return e.reshape(*e.shape[:-1], H, D)

    return g, es, plan, q, k, v, a_raw, edge_transform


def test_plan_has_outliers_and_coverage():
    _, es, plan, *_ = _setup()
    assert 0.5 < plan.coverage < 1.0  # multiscale edges force outliers
    assert len(plan.outlier_src) + int(plan.slot_mask.sum()) == es.num_edges


def test_planned_matches_reference():
    _, es, plan, q, k, v, a_raw, edge_transform = _setup()
    e_proj = edge_transform(a_raw)
    ref = graph_transformer_conv(q, k, v, e_proj, jnp.asarray(es.edge_index))
    out = planned_edge_attention(q, k, v, a_raw, edge_transform, plan, impl="reference")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-4)


def test_planned_matches_reference_bf16():
    _, es, plan, q, k, v, a_raw, edge_transform = _setup(seed=1)
    q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    e_proj = edge_transform(a_raw).astype(jnp.bfloat16)
    ref = graph_transformer_conv(q, k, v, e_proj, jnp.asarray(es.edge_index))
    out = planned_edge_attention(
        q, k, v, a_raw.astype(jnp.bfloat16), edge_transform, plan, impl="reference"
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-2, rtol=5e-2
    )


def test_planned_gradients_flow():
    _, es, plan, q, k, v, a_raw, edge_transform = _setup(seed=2)

    def loss(q, k, v):
        return jnp.sum(
            planned_edge_attention(q, k, v, a_raw, edge_transform, plan, impl="reference") ** 2
        )

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gname, g in (("q", gq), ("k", gk), ("v", gv)):
        assert jnp.isfinite(g).all(), gname
        assert float(jnp.abs(g).max()) > 0, gname

    # gradient agreement vs the reference path
    def loss_ref(q, k, v):
        e_proj = edge_transform(a_raw)
        return jnp.sum(
            graph_transformer_conv(q, k, v, e_proj, jnp.asarray(es.edge_index)) ** 2
        )

    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("slab,cap", [(32, 8), (128, 16)])
def test_planned_various_layouts(slab, cap):
    _, es, plan_default, q, k, v, a_raw, edge_transform = _setup()
    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=3)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    plan = build_edge_kernel_plan(es.edge_index, n, n, block_nodes=16, cap=cap, slab_width=slab)
    e_proj = edge_transform(a_raw)
    ref = graph_transformer_conv(q, k, v, e_proj, jnp.asarray(es.edge_index))
    out = planned_edge_attention(q, k, v, a_raw, edge_transform, plan, impl="reference")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-4)


def test_pallas_kernel_interpret_matches_twin():
    """The Pallas kernel (interpret mode on CPU) reproduces the jnp twin."""
    from anemoi_models_tpu.ops.pallas.edge_attention import slot_attention_partials_pallas
    from anemoi_models_tpu.ops.slot_attention import slot_attention_partials

    _, es, plan, q, k, v, a_raw, edge_transform = _setup()
    rng = np.random.RandomState(9)
    R = plan.padded_dst * plan.cap
    a_slots = jnp.asarray(rng.randn(R, A + 1), jnp.float32) * jnp.asarray(plan.slot_mask)
    w_aug = jnp.asarray(rng.randn(A + 1, H, D) * 0.3, jnp.float32)
    ref = slot_attention_partials(q[0], k[0], v[0], a_slots, w_aug, plan)
    out = slot_attention_partials_pallas(q[0], k[0], v[0], a_slots, w_aug, plan, interpret=True)
    np.testing.assert_allclose(np.asarray(ref.num), np.asarray(out.num), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ref.den), np.asarray(out.den), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ref.m), np.asarray(out.m), atol=1e-4, rtol=1e-4)


def test_pallas_backward_kernel_matches_twin_grads():
    """The hand-written backward kernel (interpret mode) reproduces the jnp
    twin's gradients through the full planned path (merge + finalize), for
    every differentiable input including the edge projection."""
    _, es, plan, q, k, v, a_raw, _ = _setup(seed=3)
    rng = np.random.RandomState(11)
    w = jnp.asarray(rng.randn(A, H * D) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(H * D) * 0.1, jnp.float32)
    gcot = jnp.asarray(rng.randn(2, q.shape[1], H, D), jnp.float32)

    def loss(q, k, v, a, w, b, impl):
        def edge_transform(x):
            e = x @ w + b
            return e.reshape(*e.shape[:-1], H, D)

        out = planned_edge_attention(q, k, v, a, edge_transform, plan, impl=impl)
        return jnp.sum(out * gcot)

    args = (q, k, v, a_raw, w, b)
    g_ref = jax.grad(lambda *a: loss(*a, "reference"), argnums=tuple(range(6)))(*args)
    g_ker = jax.grad(lambda *a: loss(*a, "pallas"), argnums=tuple(range(6)))(*args)
    for name, gr, gk in zip(("q", "k", "v", "a", "w", "b"), g_ref, g_ker):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gk), atol=2e-4, rtol=2e-3, err_msg=name
        )


def test_plan_degree_overflow_spills_to_outliers():
    """Destinations with more than cap in-window edges keep correctness via
    the outlier merge."""
    rng = np.random.RandomState(0)
    num_dst = num_src = 32
    # a hub node with 20 incoming edges (cap 8) + random sparse edges
    src = np.concatenate([rng.randint(0, num_src, 60), rng.permutation(num_src)[:20]])
    dst = np.concatenate([rng.randint(0, num_dst, 60), np.full(20, 7)])
    order = np.lexsort((src, dst))
    ei = np.stack([src[order], dst[order]]).astype(np.int32)
    plan = build_edge_kernel_plan(ei, num_dst, num_src, block_nodes=16, cap=8, slab_width=16)
    assert len(plan.outlier_src) > 0

    q = jnp.asarray(rng.randn(1, num_dst, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(1, num_src, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(1, num_src, H, D), jnp.float32)
    a_raw = jnp.asarray(rng.randn(1, ei.shape[1], A), jnp.float32)
    w = jnp.asarray(rng.randn(A, H * D) * 0.3, jnp.float32)

    def edge_transform(a):
        e = a @ w
        return e.reshape(*e.shape[:-1], H, D)

    ref = graph_transformer_conv(q, k, v, edge_transform(a_raw), jnp.asarray(ei))
    out = planned_edge_attention(q, k, v, a_raw, edge_transform, plan, impl="reference")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-4)


def test_slot_backward_scatter_free():
    """The slot-path backward lowers without any scatter op."""
    _, es, plan, q, k, v, a_raw, edge_transform = _setup()

    def loss(q, k, v, a):
        return jnp.sum(planned_edge_attention(q, k, v, a, edge_transform, plan, impl="reference") ** 2)

    text = (
        jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
        .lower(q, k, v, a_raw)
        .compile()
        .as_text()
    )
    assert "scatter(" not in text, "planned-path backward must be scatter-free"
