"""Halo-exchange aggregation must equal the global segment computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.graphs.partition import partition_1hop
from anemoi_models_tpu.ops.segment import segment_sum
from anemoi_models_tpu.parallel import make_mesh
from anemoi_models_tpu.parallel.halo import halo_apply, pad_nodes, unpad_nodes

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


@pytest.fixture(scope="module")
def setup():
    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=2)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    return es, n


def test_partition_covers_all_edges(setup):
    es, n = setup
    part = partition_1hop(es.edge_index, n, 8)
    assert int(part.edge_mask.sum()) == es.num_edges
    # halo much smaller than full node set (the point of the exercise)
    assert part.halo_width < n


def test_halo_aggregation_matches_global(setup):
    es, n = setup
    part = partition_1hop(es.edge_index, n, 8)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, n, 8), jnp.float32)

    # global reference: y[dst] = sum_src x[src]
    ref = segment_sum(
        jnp.take(x, jnp.asarray(es.edge_index[0]), axis=1), jnp.asarray(es.edge_index[1]), n
    )

    def local_fn(x_ext, local_edges, edge_mask):
        gathered = jnp.take(x_ext, local_edges[:, 0], axis=1)
        gathered = gathered * edge_mask[None, :, None].astype(x_ext.dtype)
        return segment_sum(
            gathered, local_edges[:, 1], part.nodes_per_shard, indices_are_sorted=False
        )

    mesh = make_mesh(data=1, model=8)
    out = jax.jit(
        lambda x: unpad_nodes(halo_apply(mesh, part, local_fn, pad_nodes(x, part)), part)
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_halo_grad_flows(setup):
    es, n = setup
    part = partition_1hop(es.edge_index, n, 8)
    x = jnp.asarray(np.random.RandomState(1).randn(1, n, 4), jnp.float32)

    def local_fn(x_ext, local_edges, edge_mask):
        gathered = jnp.take(x_ext, local_edges[:, 0], axis=1)
        gathered = gathered * edge_mask[None, :, None].astype(x_ext.dtype)
        return segment_sum(gathered, local_edges[:, 1], part.nodes_per_shard, indices_are_sorted=False)

    mesh = make_mesh(data=1, model=8)

    def loss(x):
        y = unpad_nodes(halo_apply(mesh, part, local_fn, pad_nodes(x, part)), part)
        return jnp.sum(y**2)

    g = jax.jit(jax.grad(loss))(x)
    assert jnp.isfinite(g).all()
    # reference grad
    def loss_ref(x):
        y = segment_sum(jnp.take(x, jnp.asarray(es.edge_index[0]), axis=1), jnp.asarray(es.edge_index[1]), n)
        return jnp.sum(y**2)

    g_ref = jax.jit(jax.grad(loss_ref))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3, rtol=1e-3)
