"""layer_scan=True (nn.scan-stacked blocks) matches the unrolled loop.

The scan layout exists to keep the traced program size independent of depth
(the O1280 SPMD-partitioner lever); numerics must be identical once the
unrolled per-layer params are stacked into the scan layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.layers import (
    GNNProcessor,
    GraphTransformerProcessor,
    TransformerProcessor,
)

CH = 16
BATCH = 2


@pytest.fixture(scope="module")
def graph():
    return build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=1)


@pytest.fixture(scope="module")
def hidden_x(graph):
    n = graph["hidden"].num_nodes
    return jnp.asarray(np.random.RandomState(0).randn(BATCH, n, CH), jnp.float32)


def _stack_chunk(chunk_params: dict, n_layers: int) -> dict:
    """Restack an unrolled chunk's per-layer block params into the scan
    layout: blocks_i -> blocks/block with a leading layer axis."""
    out = {k: v for k, v in chunk_params.items() if not k.startswith("blocks_")}
    layers = [chunk_params[f"blocks_{i}"] for i in range(n_layers)]
    out["blocks"] = {
        "block": jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *layers)
    }
    return out


def _restack(params: dict, chunk_size: int) -> dict:
    return {
        "params": {
            name: _stack_chunk(chunk, chunk_size) if name.startswith("proc_") else chunk
            for name, chunk in params["params"].items()
        }
    }


@pytest.mark.parametrize("flavor", ["transformer", "gnn", "graphtransformer"])
def test_layer_scan_matches_unrolled(flavor, graph, hidden_x):
    kwargs = dict(num_layers=4, num_channels=CH, num_chunks=2)
    if flavor == "transformer":
        mk = lambda scan: TransformerProcessor(
            window_size=None, num_heads=4, dropout_p=0.0,
            attention_impl="reference", layer_scan=scan, **kwargs,
        )
    elif flavor == "gnn":
        mk = lambda scan: GNNProcessor(
            trainable_size=4, sub_graph=graph[("hidden", "to", "hidden")],
            layer_scan=scan, **kwargs,
        )
    else:
        mk = lambda scan: GraphTransformerProcessor(
            num_heads=4, trainable_size=4,
            sub_graph=graph[("hidden", "to", "hidden")], layer_scan=scan, **kwargs,
        )

    plain, scanned = mk(False), mk(True)
    params = plain.init(jax.random.key(0), hidden_x)
    ref = plain.apply(params, hidden_x)

    stacked = _restack(params, chunk_size=2)
    # shape sanity: scan init produces the same stacked structure
    scan_params = scanned.init(jax.random.key(1), hidden_x)
    ref_shapes = jax.tree_util.tree_map(jnp.shape, scan_params)
    got_shapes = jax.tree_util.tree_map(jnp.shape, stacked)
    assert ref_shapes == got_shapes

    out = scanned.apply(stacked, hidden_x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    # grads flow through the scan (stacked leaves, finite)
    def loss(mod, p):
        return jnp.mean(mod.apply(p, hidden_x).astype(jnp.float32) ** 2)

    g = jax.grad(lambda p: loss(scanned, p))(stacked)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(bool(jnp.isfinite(l).all()) for l in leaves)

    # grads equal the unrolled path's after restacking
    g_plain = jax.grad(lambda p: loss(plain, p))(params)
    g_plain_stacked = _restack(g_plain, chunk_size=2)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain_stacked), leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
