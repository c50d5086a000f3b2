"""Full halo GraphConv (edge MLP inside shard_map) vs the global reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.graphs.partition import partition_1hop
from anemoi_models_tpu.ops.segment import segment_sum
from anemoi_models_tpu.parallel import make_mesh
from anemoi_models_tpu.parallel.halo_conv import (
    apply_edge_mlp,
    graph_conv_params,
    halo_graph_conv,
    shard_edge_values,
)

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def test_halo_graph_conv_matches_global():
    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=2)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    C = 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, n, C), jnp.float32)
    e_global = jnp.asarray(rng.randn(es.num_edges, C), jnp.float32)
    params = graph_conv_params(jax.random.key(0), C, C)

    # global reference: same math, unsharded
    src, dst = jnp.asarray(es.edge_index)
    x_i = jnp.take(x, dst, axis=1)
    x_j = jnp.take(x, src, axis=1)
    msg = apply_edge_mlp(params, jnp.concatenate([x_i, x_j, e_global[None].repeat(2, 0)], -1)) + e_global
    ref = segment_sum(msg, dst, n)

    part = partition_1hop(es.edge_index, n, 8)
    e_sharded = shard_edge_values(e_global, part)
    mesh = make_mesh(data=1, model=8)
    out, edges_new = jax.jit(
        lambda x, e, p: halo_graph_conv(mesh, part, p, x, e)
    )(x, e_sharded, params)
    assert edges_new.shape[0] == 8 and edges_new.ndim == 4
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_halo_graph_conv_grads_flow():
    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=1)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    C = 4
    x = jnp.asarray(np.random.RandomState(1).randn(1, n, C), jnp.float32)
    e_global = jnp.asarray(np.random.RandomState(2).randn(es.num_edges, C), jnp.float32)
    params = graph_conv_params(jax.random.key(0), C, C)
    part = partition_1hop(es.edge_index, n, 8)
    e_sharded = shard_edge_values(e_global, part)
    mesh = make_mesh(data=1, model=8)

    def loss(p, x):
        return jnp.sum(halo_graph_conv(mesh, part, p, x, e_sharded)[0] ** 2)

    gp, gx = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
    for kp, gleaf in jax.tree_util.tree_leaves_with_path(gp):
        assert jnp.isfinite(gleaf).all(), kp
        assert float(jnp.abs(gleaf).max()) > 0, kp
    assert jnp.isfinite(gx).all()


def test_halo_gnn_processor_matches_single_device():
    from anemoi_models_tpu.layers.processor import HaloGNNProcessor
    from anemoi_models_tpu.parallel import use_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=2)
    n = g["hidden"].num_nodes
    proc = HaloGNNProcessor(
        num_layers=2, num_channels=8, trainable_size=2,
        sub_graph=g[("hidden", "to", "hidden")],
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, n, 8), jnp.float32)
    params = proc.init(jax.random.key(0), x)  # no mesh -> dense fallback path
    ref = proc.apply(params, x)

    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        # node count (162) is not divisible by 8; the processor pads and
        # shards internally, so inputs arrive replicated
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        out = jax.jit(proc.apply)(ps, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)
