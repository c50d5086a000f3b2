"""Dense (padded-neighbor) path must match the segment reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.graphs.partition import bucketed_neighbor_tables, dense_neighbor_table
from anemoi_models_tpu.layers.conv import GraphConv, graph_transformer_conv
from anemoi_models_tpu.ops.dense_graph import gather_edges, masked_neighbor_sum
from anemoi_models_tpu.ops.segment import segment_sum


@pytest.fixture(scope="module")
def graph():
    return build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=1)


def _jnp_tables(edge_index, num_dst):
    buckets, reassemble = bucketed_neighbor_tables(edge_index, num_dst)
    return [tuple(jnp.asarray(a) for a in b) for b in buckets], jnp.asarray(reassemble)


def test_bucketed_tables_cover_all_edges(graph):
    es = graph[("data", "to", "hidden")]
    n = graph["hidden"].num_nodes
    buckets, reassemble = bucketed_neighbor_tables(es.edge_index, n)
    total = sum(int(b[3].sum()) for b in buckets)
    assert total == es.num_edges
    assert sum(len(b[0]) for b in buckets) == n
    # per-bucket caps are tight: every cap <= 2x that bucket's max degree
    for node_ids, edge_ids, src_ids, mask in buckets:
        degs = mask.sum(1)
        assert degs.max() <= mask.shape[1]


def test_dense_neighbor_table_roundtrip(graph):
    es = graph[("data", "to", "hidden")]
    n_dst = graph["hidden"].num_nodes
    edge_ids, src_ids, mask = dense_neighbor_table(es.edge_index, n_dst)
    # every edge appears exactly once
    assert mask.sum() == es.num_edges
    flat = edge_ids[mask]
    assert sorted(flat.tolist()) == list(range(es.num_edges))
    # src ids consistent with edge_index
    np.testing.assert_array_equal(es.edge_index[0][edge_ids[mask]], src_ids[mask])


def test_masked_sum_equals_segment_sum(graph):
    es = graph[("hidden", "to", "hidden")]
    n = graph["hidden"].num_nodes
    e = jnp.asarray(np.random.RandomState(0).randn(2, es.num_edges, 8), jnp.float32)
    seg = segment_sum(e, jnp.asarray(es.edge_index[1]), n)
    edge_ids, _, mask = dense_neighbor_table(es.edge_index, n)
    dense = masked_neighbor_sum(gather_edges(e, jnp.asarray(edge_ids)), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(dense), np.asarray(seg), atol=1e-5)


def test_graph_transformer_conv_dense_matches_segment(graph):
    es = graph[("hidden", "to", "hidden")]
    n = graph["hidden"].num_nodes
    h, d = 4, 8
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(2, n, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(2, n, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(2, n, h, d), jnp.float32)
    e = jnp.asarray(rng.randn(2, es.num_edges, h, d), jnp.float32)
    ei = jnp.asarray(es.edge_index)
    ref = graph_transformer_conv(q, k, v, e, ei, n)
    tables = _jnp_tables(es.edge_index, n)
    dense = graph_transformer_conv(q, k, v, e, ei, n, tables=tables)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_graph_conv_dense_matches_segment(graph):
    es = graph[("data", "to", "hidden")]
    n_src, n_dst = graph["data"].num_nodes, graph["hidden"].num_nodes
    conv = GraphConv(out_channels=8)
    rng = np.random.RandomState(2)
    x_src = jnp.asarray(rng.randn(1, n_src, 8), jnp.float32)
    x_dst = jnp.asarray(rng.randn(1, n_dst, 8), jnp.float32)
    e = jnp.asarray(rng.randn(1, es.num_edges, 8), jnp.float32)
    ei = jnp.asarray(es.edge_index)
    params = conv.init(jax.random.key(0), (x_src, x_dst), e, ei, n_dst)
    ref, edges_ref = conv.apply(params, (x_src, x_dst), e, ei, n_dst)
    tables = _jnp_tables(es.edge_index, n_dst)
    dense, edges_dense = conv.apply(params, (x_src, x_dst), e, ei, n_dst, tables)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(ref), atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(edges_ref), np.asarray(edges_dense))


def test_dense_grad_matches_segment_grad(graph):
    es = graph[("hidden", "to", "hidden")]
    n = graph["hidden"].num_nodes
    h, d = 2, 4
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, n, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(1, n, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(1, n, h, d), jnp.float32)
    ei = jnp.asarray(es.edge_index)
    tables = _jnp_tables(es.edge_index, n)

    g_ref = jax.grad(lambda k_: jnp.sum(graph_transformer_conv(q, k_, v, None, ei, n) ** 2))(k)
    g_dense = jax.grad(
        lambda k_: jnp.sum(graph_transformer_conv(q, k_, v, None, ei, n, tables=tables) ** 2)
    )(k)
    np.testing.assert_allclose(np.asarray(g_dense), np.asarray(g_ref), atol=1e-4, rtol=1e-3)


def test_transpose_adjoint_grads_match_and_scatter_free():
    """With a TransposeBundle, bucketed-attention grads equal the plain path
    and the compiled backward contains no scatter op at all."""
    from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
    from anemoi_models_tpu.graphs.partition import edge_set_gather_tables
    from anemoi_models_tpu.ops.dense_graph import (
        GatherTables,
        TransposeBundle,
        bucketed_edge_attention,
        bucketed_neighbor_sum,
    )

    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=2)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    buckets, reassemble, bundle = edge_set_gather_tables(es, n, n)
    tb = TransposeBundle(bundle)
    H, D = 4, 8
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, n, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(2, n, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(2, n, H, D), jnp.float32)
    e = jnp.asarray(rng.randn(2, es.num_edges, H, D), jnp.float32)

    def loss(q, k, v, e, transpose):
        return jnp.sum(
            bucketed_edge_attention(q, k, v, e, buckets, reassemble, transpose=transpose) ** 2
        )

    g_plain = jax.grad(lambda *a: loss(*a, None), argnums=(0, 1, 2, 3))(q, k, v, e)
    g_t = jax.grad(lambda *a: loss(*a, tb), argnums=(0, 1, 2, 3))(q, k, v, e)
    for name, a, b in zip("qkve", g_plain, g_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4, err_msg=name)

    hlo = jax.jit(jax.grad(lambda *a: loss(*a, tb), argnums=(0, 1, 2, 3))).lower(q, k, v, e).compile()
    text = hlo.as_text()
    assert "scatter(" not in text, "transpose-adjoint backward must be scatter-free"

    # neighbor_sum flavor too
    def loss2(e, transpose):
        return jnp.sum(bucketed_neighbor_sum(e[..., 0, :], buckets, reassemble, transpose) ** 2)

    ge_plain = jax.grad(lambda e: loss2(e, None))(e)
    ge_t = jax.grad(lambda e: loss2(e, tb))(e)
    np.testing.assert_allclose(np.asarray(ge_plain), np.asarray(ge_t), atol=1e-4, rtol=1e-4)
    text2 = jax.jit(jax.grad(lambda e: loss2(e, tb))).lower(e).compile().as_text()
    assert "scatter(" not in text2


def test_transpose_adjoint_bipartite_matches():
    """Bipartite (mapper-style) gather tables: transpose-adjoint grads equal
    the plain path when num_src != num_dst."""
    from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
    from anemoi_models_tpu.graphs.partition import edge_set_gather_tables
    from anemoi_models_tpu.ops.dense_graph import (
        TransposeBundle,
        bucketed_edge_attention,
    )

    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=2)
    es = g[("data", "to", "hidden")]  # encoder: data sources, hidden dsts
    n_src = g["data"].num_nodes
    n_dst = g["hidden"].num_nodes
    buckets, reassemble, bundle = edge_set_gather_tables(es, n_dst, n_src)
    tb = TransposeBundle(bundle)
    H, D = 2, 8
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, n_dst, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(1, n_src, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(1, n_src, H, D), jnp.float32)
    e = jnp.asarray(rng.randn(1, es.num_edges, H, D), jnp.float32)

    def loss(q, k, v, e, transpose):
        return jnp.sum(
            bucketed_edge_attention(q, k, v, e, buckets, reassemble, transpose=transpose) ** 2
        )

    g_plain = jax.grad(lambda *a: loss(*a, None), argnums=(0, 1, 2, 3))(q, k, v, e)
    g_t = jax.grad(lambda *a: loss(*a, tb), argnums=(0, 1, 2, 3))(q, k, v, e)
    for name, a, b in zip("qkve", g_plain, g_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4, err_msg=name)
