"""Shape-and-grad tests for the basic layers (MLP, graph attrs, convs,
attention) — the test pattern of the reference layer suite
(``tests/layers/*``): forward → shape assert → MSE loss → grad → every
parameter has a grad of matching shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.layers import (
    MLP,
    GraphConv,
    MultiHeadSelfAttention,
    NamedNodesAttributes,
    TrainableTensor,
    graph_transformer_conv,
)
from anemoi_models_tpu.graphs import build_enc_proc_dec_graph


def grad_check(module, params, *args, **kwargs):
    """MSE-loss grad: every param gets a finite grad of matching shape."""

    def loss(p):
        out = module.apply(p, *args, **kwargs)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.mean(leaf.astype(jnp.float32) ** 2) for leaf in leaves)

    grads = jax.grad(loss)(params)
    for (kp, g), (_, p) in zip(
        jax.tree_util.tree_leaves_with_path(grads), jax.tree_util.tree_leaves_with_path(params)
    ):
        assert g.shape == p.shape, f"grad shape mismatch at {kp}"
        assert jnp.isfinite(g).all(), f"non-finite grad at {kp}"


def test_mlp_shapes_and_grads():
    mlp = MLP(hidden_dim=32, out_features=16, n_extra_layers=1, activation="SiLU")
    x = jnp.ones((2, 10, 8))
    params = mlp.init(jax.random.key(0), x)
    out = mlp.apply(params, x)
    assert out.shape == (2, 10, 16)
    # layer count: in->hidden, (1+1) hidden, hidden->out = 4 Dense + LN
    dense_layers = [k for k in params["params"] if k.startswith("Dense")]
    assert len(dense_layers) == 4
    grad_check(mlp, params, x)


def test_mlp_no_layernorm_final_activation():
    mlp = MLP(hidden_dim=8, out_features=4, layer_norm=False, final_activation=True, activation="ReLU")
    x = jnp.asarray(np.random.randn(3, 8), dtype=jnp.float32)
    params = mlp.init(jax.random.key(0), x)
    out = mlp.apply(params, x)
    assert (out >= 0).all()  # final ReLU applied


def test_trainable_tensor():
    tt = TrainableTensor(tensor_size=7, trainable_size=3)
    x = jnp.ones((7, 5))
    params = tt.init(jax.random.key(0), x, 2)
    out = tt.apply(params, x, 2)
    assert out.shape == (2, 7, 8)
    assert params["params"]["trainable"].shape == (7, 3)
    # zero-init trainable part
    np.testing.assert_array_equal(np.asarray(out[..., 5:]), 0.0)


def test_trainable_tensor_zero_size():
    tt = TrainableTensor(tensor_size=7, trainable_size=0)
    x = jnp.ones((7, 5))
    params = tt.init(jax.random.key(0), x, 3)
    assert tt.apply(params, x, 3).shape == (3, 7, 5)


@pytest.fixture(scope="module")
def graph():
    return build_enc_proc_dec_graph(grid_lat=8, mesh_refinements=1)


def test_named_nodes_attributes(graph):
    nna = NamedNodesAttributes(num_trainable_params=4, graph_data=graph)
    params = nna.init(jax.random.key(0), "data", 2)
    out = nna.apply(params, "data", 2)
    n_data = graph["data"].num_nodes
    assert out.shape == (2, n_data, 2 * 2 + 4)
    out_h = nna.apply(params, "hidden", 2)
    assert out_h.shape == (2, graph["hidden"].num_nodes, 8)


def test_graph_conv(graph):
    es = graph[("data", "to", "hidden")]
    conv = GraphConv(out_channels=16)
    n_src, n_dst = graph["data"].num_nodes, graph["hidden"].num_nodes
    x_src = jnp.asarray(np.random.randn(2, n_src, 16), jnp.float32)
    x_dst = jnp.asarray(np.random.randn(2, n_dst, 16), jnp.float32)
    edge_attr = jnp.asarray(np.random.randn(2, es.num_edges, 16), jnp.float32)
    edge_index = jnp.asarray(es.edge_index)
    params = conv.init(jax.random.key(0), (x_src, x_dst), edge_attr, edge_index, n_dst)
    out, edges_new = conv.apply(params, (x_src, x_dst), edge_attr, edge_index, n_dst)
    assert out.shape == (2, n_dst, 16)
    assert edges_new.shape == (2, es.num_edges, 16)
    grad_check(conv, params, (x_src, x_dst), edge_attr, edge_index, n_dst)


def test_graph_conv_matches_manual_scatter(graph):
    """segment_sum aggregation == dense manual scatter."""
    es = graph[("hidden", "to", "hidden")]
    n = graph["hidden"].num_nodes
    conv = GraphConv(out_channels=8)
    x = jnp.asarray(np.random.randn(1, n, 8), jnp.float32)
    e = jnp.asarray(np.random.randn(1, es.num_edges, 8), jnp.float32)
    ei = jnp.asarray(es.edge_index)
    params = conv.init(jax.random.key(1), x, e, ei, n)
    out, edges_new = conv.apply(params, x, e, ei, n)
    manual = np.zeros((1, n, 8), np.float32)
    np.add.at(manual, (np.s_[:], np.asarray(ei[1])), np.asarray(edges_new))
    np.testing.assert_allclose(np.asarray(out), manual, atol=1e-4)


def test_graph_transformer_conv_softmax_normalized(graph):
    es = graph[("hidden", "to", "hidden")]
    n = graph["hidden"].num_nodes
    h, d = 4, 8
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, n, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(2, n, h, d), jnp.float32)
    v = jnp.ones((2, n, h, d), jnp.float32)
    ei = jnp.asarray(es.edge_index)
    # with constant value=1 and no edge attr, attention output must be exactly 1
    out = graph_transformer_conv(q, k, v, None, ei, n)
    assert out.shape == (2, n, h, d)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_attention_shapes_and_grads():
    mhsa = MultiHeadSelfAttention(num_heads=4, embed_dim=32, attention_impl="reference")
    x = jnp.asarray(np.random.randn(2, 24, 32), jnp.float32)
    params = mhsa.init(jax.random.key(0), x)
    out = mhsa.apply(params, x)
    assert out.shape == (2, 24, 32)
    grad_check(mhsa, params, x)


def test_attention_window_equals_full_when_large():
    x = jnp.asarray(np.random.randn(1, 16, 16), jnp.float32)
    full = MultiHeadSelfAttention(num_heads=2, embed_dim=16, attention_impl="reference")
    win = MultiHeadSelfAttention(num_heads=2, embed_dim=16, window_size=16, attention_impl="reference")
    params = full.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(full.apply(params, x)), np.asarray(win.apply(params, x)), atol=1e-5
    )


def test_attention_window_restricts():
    x = jnp.asarray(np.random.randn(1, 32, 16), jnp.float32)
    full = MultiHeadSelfAttention(num_heads=2, embed_dim=16, attention_impl="reference")
    win = MultiHeadSelfAttention(num_heads=2, embed_dim=16, window_size=2, attention_impl="reference")
    params = full.init(jax.random.key(0), x)
    assert not np.allclose(np.asarray(full.apply(params, x)), np.asarray(win.apply(params, x)))
