"""Shape-and-grad tests for blocks, chunks, processors, and mappers —
the block/chunk/processor/mapper × flavor matrix of the reference suite
(``tests/layers/{block,chunk,mapper,processor}``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.layers import (
    GNNBackwardMapper,
    GNNForwardMapper,
    GNNProcessor,
    GraphConvMapperBlock,
    GraphConvProcessorBlock,
    GraphTransformerBackwardMapper,
    GraphTransformerForwardMapper,
    GraphTransformerMapperBlock,
    GraphTransformerProcessor,
    GraphTransformerProcessorBlock,
    TransformerProcessor,
    TransformerProcessorBlock,
)

BATCH = 2
CH = 16


@pytest.fixture(scope="module")
def graph():
    return build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=1)


@pytest.fixture(scope="module")
def hidden_x(graph):
    n = graph["hidden"].num_nodes
    return jnp.asarray(np.random.RandomState(0).randn(BATCH, n, CH), jnp.float32)


def check_grads(module, params, *args, **kwargs):
    def loss(p):
        out = module.apply(p, *args, **kwargs)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.mean(leaf.astype(jnp.float32) ** 2) for leaf in leaves)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    assert flat, "no grads"
    for kp, g in flat:
        assert jnp.isfinite(g).all(), f"non-finite grad at {kp}"


def test_transformer_block(hidden_x):
    block = TransformerProcessorBlock(
        num_channels=CH, hidden_dim=4 * CH, num_heads=4, activation="GELU",
        window_size=None, attention_impl="reference",
    )
    params = block.init(jax.random.key(0), hidden_x)
    out = block.apply(params, hidden_x)
    assert out.shape == hidden_x.shape
    check_grads(block, params, hidden_x)


def test_graphconv_processor_block(graph, hidden_x):
    es = graph[("hidden", "to", "hidden")]
    block = GraphConvProcessorBlock(in_channels=CH, out_channels=CH)
    e = jnp.asarray(np.random.randn(BATCH, es.num_edges, CH), jnp.float32)
    ei = jnp.asarray(es.edge_index)
    params = block.init(jax.random.key(0), hidden_x, e, ei)
    (nodes, edges) = block.apply(params, hidden_x, e, ei)
    assert nodes.shape == hidden_x.shape
    assert edges.shape == e.shape
    check_grads(block, params, hidden_x, e, ei)


def test_graphconv_mapper_block_src_update(graph, hidden_x):
    es = graph[("data", "to", "hidden")]
    n_src = graph["data"].num_nodes
    x_src = jnp.asarray(np.random.randn(BATCH, n_src, CH), jnp.float32)
    e = jnp.asarray(np.random.randn(BATCH, es.num_edges, CH), jnp.float32)
    ei = jnp.asarray(es.edge_index)
    for update_src, changed in ((True, True), (False, False)):
        block = GraphConvMapperBlock(in_channels=CH, out_channels=CH, update_src_nodes=update_src)
        params = block.init(jax.random.key(0), (x_src, hidden_x), e, ei)
        (src_new, dst_new), _ = block.apply(params, (x_src, hidden_x), e, ei)
        assert dst_new.shape == hidden_x.shape
        assert (not np.allclose(np.asarray(src_new), np.asarray(x_src))) == changed


def test_graphtransformer_processor_block(graph, hidden_x):
    es = graph[("hidden", "to", "hidden")]
    block = GraphTransformerProcessorBlock(in_channels=CH, hidden_dim=4 * CH, out_channels=CH, num_heads=4)
    e = jnp.asarray(np.random.randn(BATCH, es.num_edges, 3), jnp.float32)
    ei = jnp.asarray(es.edge_index)
    params = block.init(jax.random.key(0), hidden_x, e, ei)
    nodes, edges = block.apply(params, hidden_x, e, ei)
    assert nodes.shape == hidden_x.shape
    assert edges.shape == e.shape  # edge attr passed through unchanged
    check_grads(block, params, hidden_x, e, ei)


def test_graphtransformer_block_chunked_matches_unchunked(graph, hidden_x):
    """Edge-chunked two-pass attention must equal single-pass exactly."""
    es = graph[("hidden", "to", "hidden")]
    e = jnp.asarray(np.random.randn(BATCH, es.num_edges, 3), jnp.float32)
    ei = jnp.asarray(es.edge_index)
    b1 = GraphTransformerProcessorBlock(in_channels=CH, hidden_dim=4 * CH, out_channels=CH, num_heads=4, num_chunks=1)
    b4 = GraphTransformerProcessorBlock(in_channels=CH, hidden_dim=4 * CH, out_channels=CH, num_heads=4, num_chunks=4)
    params = b1.init(jax.random.key(0), hidden_x, e, ei)
    out1, _ = b1.apply(params, hidden_x, e, ei)
    out4, _ = b4.apply(params, hidden_x, e, ei, None, False)  # deterministic=False -> uses num_chunks
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out4), atol=2e-4)


def test_transformer_processor(hidden_x):
    proc = TransformerProcessor(
        num_layers=4, num_channels=CH, num_chunks=2, num_heads=4, window_size=None,
        dropout_p=0.0, attention_impl="reference",
    )
    params = proc.init(jax.random.key(0), hidden_x)
    out = proc.apply(params, hidden_x)
    assert out.shape == hidden_x.shape
    # two chunk modules
    assert set(params["params"].keys()) == {"proc_0", "proc_1"}
    check_grads(proc, params, hidden_x)


def test_transformer_processor_layer_split():
    with pytest.raises(AssertionError):
        TransformerProcessor(num_layers=5, num_chunks=2, num_channels=CH).init(
            jax.random.key(0), jnp.ones((1, 8, CH))
        )


def test_gnn_processor(graph, hidden_x):
    proc = GNNProcessor(
        num_layers=4, num_channels=CH, num_chunks=2, trainable_size=4,
        sub_graph=graph[("hidden", "to", "hidden")],
    )
    params = proc.init(jax.random.key(0), hidden_x)
    out = proc.apply(params, hidden_x)
    assert out.shape == hidden_x.shape
    # first chunk embeds edges, second does not
    assert "emb_edges" in params["params"]["proc_0"]
    assert "emb_edges" not in params["params"]["proc_1"]
    check_grads(proc, params, hidden_x)


def test_graphtransformer_processor(graph, hidden_x):
    proc = GraphTransformerProcessor(
        num_layers=2, num_channels=CH, num_chunks=1, num_heads=4, trainable_size=4,
        sub_graph=graph[("hidden", "to", "hidden")],
    )
    params = proc.init(jax.random.key(0), hidden_x)
    out = proc.apply(params, hidden_x)
    assert out.shape == hidden_x.shape
    check_grads(proc, params, hidden_x)


IN_SRC = 10
IN_DST = 6


@pytest.fixture(scope="module")
def mapper_inputs(graph):
    n_src, n_dst = graph["data"].num_nodes, graph["hidden"].num_nodes
    rng = np.random.RandomState(1)
    return (
        jnp.asarray(rng.randn(BATCH, n_src, IN_SRC), jnp.float32),
        jnp.asarray(rng.randn(BATCH, n_dst, IN_DST), jnp.float32),
    )


def test_gt_forward_mapper(graph, mapper_inputs):
    x_src, x_dst = mapper_inputs
    mapper = GraphTransformerForwardMapper(
        in_channels_src=IN_SRC, in_channels_dst=IN_DST, hidden_dim=CH, num_heads=4,
        trainable_size=4, sub_graph=graph[("data", "to", "hidden")],
    )
    params = mapper.init(jax.random.key(0), (x_src, x_dst))
    src_out, dst_out = mapper.apply(params, (x_src, x_dst))
    # GT forward returns the ORIGINAL src (reference mapper.py:344-345)
    np.testing.assert_array_equal(np.asarray(src_out), np.asarray(x_src))
    assert dst_out.shape == (BATCH, graph["hidden"].num_nodes, CH)
    check_grads(mapper, params, (x_src, x_dst))


def test_gt_backward_mapper(graph, mapper_inputs):
    x_src_raw, _ = mapper_inputs
    n_hidden = graph["hidden"].num_nodes
    x_hidden = jnp.asarray(np.random.randn(BATCH, n_hidden, CH), jnp.float32)
    mapper = GraphTransformerBackwardMapper(
        in_channels_src=CH, in_channels_dst=IN_SRC, hidden_dim=CH, out_channels_dst=7,
        num_heads=4, trainable_size=4, sub_graph=graph[("hidden", "to", "data")],
    )
    params = mapper.init(jax.random.key(0), (x_hidden, x_src_raw))
    out = mapper.apply(params, (x_hidden, x_src_raw))
    assert out.shape == (BATCH, graph["data"].num_nodes, 7)
    check_grads(mapper, params, (x_hidden, x_src_raw))


def test_gnn_forward_mapper(graph, mapper_inputs):
    x_src, x_dst = mapper_inputs
    mapper = GNNForwardMapper(
        in_channels_src=IN_SRC, in_channels_dst=IN_DST, hidden_dim=CH,
        trainable_size=4, sub_graph=graph[("data", "to", "hidden")],
    )
    params = mapper.init(jax.random.key(0), (x_src, x_dst))
    src_out, dst_out = mapper.apply(params, (x_src, x_dst))
    # GNN forward embeds + updates src to hidden width (reference mapper.py:525-608)
    assert src_out.shape == (BATCH, graph["data"].num_nodes, CH)
    assert dst_out.shape == (BATCH, graph["hidden"].num_nodes, CH)
    check_grads(mapper, params, (x_src, x_dst))


def test_gnn_backward_mapper(graph):
    n_hidden, n_data = graph["hidden"].num_nodes, graph["data"].num_nodes
    rng = np.random.RandomState(2)
    x_hidden = jnp.asarray(rng.randn(BATCH, n_hidden, CH), jnp.float32)
    x_data = jnp.asarray(rng.randn(BATCH, n_data, CH), jnp.float32)
    mapper = GNNBackwardMapper(
        in_channels_src=CH, in_channels_dst=CH, hidden_dim=CH, out_channels_dst=7,
        trainable_size=4, sub_graph=graph[("hidden", "to", "data")],
    )
    params = mapper.init(jax.random.key(0), (x_hidden, x_data))
    out = mapper.apply(params, (x_hidden, x_data))
    assert out.shape == (BATCH, n_data, 7)
    check_grads(mapper, params, (x_hidden, x_data))


def test_graphconv_block_chunked_matches_unchunked(graph, hidden_x):
    es = graph[("hidden", "to", "hidden")]
    e = jnp.asarray(np.random.randn(BATCH, es.num_edges, CH), jnp.float32)
    ei = jnp.asarray(es.edge_index)
    b1 = GraphConvProcessorBlock(in_channels=CH, out_channels=CH, num_chunks=1)
    b3 = GraphConvProcessorBlock(in_channels=CH, out_channels=CH, num_chunks=3)
    params = b1.init(jax.random.key(0), hidden_x, e, ei)
    out1, edges1 = b1.apply(params, hidden_x, e, ei)
    out3, edges3 = b3.apply(params, hidden_x, e, ei)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out3), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(edges1), np.asarray(edges3), atol=1e-5)


def test_cpu_offload_remat_policy(graph, hidden_x):
    """cpu_offload=True offloads saved dots to pinned host memory between
    fwd and bwd (reference offload_wrapper, processor.py:57-59): forward
    values match the non-offloaded run and grads stay finite."""
    kwargs = dict(
        num_layers=2, num_channels=CH, num_chunks=1, trainable_size=2,
        sub_graph=graph[("hidden", "to", "hidden")],
    )
    plain = GNNProcessor(**kwargs)
    offload = GNNProcessor(cpu_offload=True, **kwargs)
    params = plain.init(jax.random.key(0), hidden_x)
    ref = plain.apply(params, hidden_x)
    out = offload.apply(params, hidden_x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    g = jax.grad(lambda p: jnp.mean(offload.apply(p, hidden_x) ** 2))(params)
    for kp, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert jnp.isfinite(leaf).all(), kp
