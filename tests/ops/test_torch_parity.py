"""Numerical parity against an independent torch implementation of the
reference equations (SURVEY.md §4: allclose-vs-reference numerics).

The reference formulas (from ``layers/conv.py:27-142``):
- GraphConv message: ``mlp(cat[x_i, x_j, e]) + e``; scatter-sum over dst.
- GraphTransformerConv: ``alpha = softmax_dst(q_i · (k_j + e) / sqrt(d))``,
  message ``(v_j + e) * alpha``, scatter-add.
These are re-implemented here with plain torch (no torch_geometric) and
compared against the jnp segment and bucketed paths.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.graphs.partition import bucketed_neighbor_tables
from anemoi_models_tpu.layers.conv import graph_transformer_conv
from anemoi_models_tpu.ops.segment import segment_softmax, segment_sum


@pytest.fixture(scope="module")
def setup():
    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=1)
    es = g[("hidden", "to", "hidden")]
    return es, g["hidden"].num_nodes


def torch_graph_transformer_conv(q, k, v, e, edge_index, num_dst):
    """Reference equations in plain torch (float64 for a strong oracle)."""
    src = torch.as_tensor(np.asarray(edge_index[0]), dtype=torch.long)
    dst = torch.as_tensor(np.asarray(edge_index[1]), dtype=torch.long)
    q_i = q[dst]  # (E, H, D)
    k_j = k[src] + e
    v_j = v[src] + e
    d = q.shape[-1]
    alpha = (q_i * k_j).sum(-1) / d**0.5  # (E, H)
    # per-destination softmax
    alpha_exp = torch.zeros_like(alpha)
    out = torch.zeros((num_dst, q.shape[1], d), dtype=q.dtype)
    for h in range(alpha.shape[1]):
        m = torch.full((num_dst,), -torch.inf, dtype=q.dtype)
        m.scatter_reduce_(0, dst, alpha[:, h], reduce="amax")
        ex = torch.exp(alpha[:, h] - m[dst])
        z = torch.zeros(num_dst, dtype=q.dtype).scatter_add_(0, dst, ex)
        alpha_exp[:, h] = ex / z[dst]
        out[:, h, :].scatter_add_(
            0, dst[:, None].expand(-1, d), v_j[:, h, :] * alpha_exp[:, h, None]
        )
    return out


def test_graph_transformer_conv_matches_torch_oracle(setup):
    es, n = setup
    h, d = 4, 8
    rng = np.random.RandomState(0)
    q64 = torch.as_tensor(rng.randn(n, h, d))
    k64 = torch.as_tensor(rng.randn(n, h, d))
    v64 = torch.as_tensor(rng.randn(n, h, d))
    e64 = torch.as_tensor(rng.randn(es.num_edges, h, d))
    oracle = torch_graph_transformer_conv(q64, k64, v64, e64, es.edge_index, n).numpy()

    to_j = lambda t: jnp.asarray(t.numpy()[None], jnp.float32)  # noqa: E731
    ei = jnp.asarray(es.edge_index)
    ours_segment = graph_transformer_conv(to_j(q64), to_j(k64), to_j(v64), to_j(e64), ei, n)
    np.testing.assert_allclose(np.asarray(ours_segment[0]), oracle, atol=5e-5, rtol=1e-4)

    buckets, reassemble = bucketed_neighbor_tables(es.edge_index, n)
    tables = ([tuple(jnp.asarray(a) for a in b) for b in buckets], jnp.asarray(reassemble))
    ours_dense = graph_transformer_conv(to_j(q64), to_j(k64), to_j(v64), to_j(e64), ei, n, tables=tables)
    np.testing.assert_allclose(np.asarray(ours_dense[0]), oracle, atol=5e-5, rtol=1e-4)


def test_segment_sum_matches_torch(setup):
    es, n = setup
    rng = np.random.RandomState(1)
    vals = rng.randn(es.num_edges, 5)
    dst = torch.as_tensor(np.asarray(es.edge_index[1]), dtype=torch.long)
    oracle = (
        torch.zeros((n, 5), dtype=torch.float64)
        .scatter_add_(0, dst[:, None].expand(-1, 5), torch.as_tensor(vals))
        .numpy()
    )
    ours = segment_sum(jnp.asarray(vals[None], jnp.float32), jnp.asarray(es.edge_index[1]), n)
    np.testing.assert_allclose(np.asarray(ours[0]), oracle, atol=1e-4, rtol=1e-4)


def test_segment_softmax_matches_torch(setup):
    es, n = setup
    rng = np.random.RandomState(2)
    scores = rng.randn(es.num_edges, 3)
    dst = torch.as_tensor(np.asarray(es.edge_index[1]), dtype=torch.long)
    s64 = torch.as_tensor(scores)
    m = torch.full((n, 3), -torch.inf, dtype=torch.float64)
    m.scatter_reduce_(0, dst[:, None].expand(-1, 3), s64, reduce="amax")
    ex = torch.exp(s64 - m[dst])
    z = torch.zeros((n, 3), dtype=torch.float64).scatter_add_(0, dst[:, None].expand(-1, 3), ex)
    oracle = (ex / z[dst]).numpy()
    ours = segment_softmax(jnp.asarray(scores[None], jnp.float32), jnp.asarray(es.edge_index[1]), n)
    np.testing.assert_allclose(np.asarray(ours[0]), oracle, atol=1e-5, rtol=1e-4)
