"""Multi-window (multi-pass) kernel plans: exact partition + exact merge.

The single-window slot plan's coverage is bounded by the RCM bandwidth of
the mesh (PERF.md "Scale audit: O1280": 42% at refinement 8).
``build_multi_pass_plan`` chains plans — each pass planned over the previous
pass's outliers — and the attention softmax splits exactly across passes via
the merge-form partials. These tests pin the edge-partition invariant, the
numerics against the COO reference (fwd + grads, kv and feats dataflows,
jnp twin and interpret-mode Pallas kernels), and the coverage gain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.graphs.kernel_plan import (
    MultiPassPlan,
    build_edge_kernel_plan,
    build_multi_pass_plan,
    edge_set_kernel_plan,
    plan_cost,
)
from anemoi_models_tpu.layers.conv import graph_transformer_conv
from anemoi_models_tpu.ops.slot_attention import (
    planned_edge_attention,
    planned_edge_attention_feats,
)

H, D, A, F = 4, 8, 3, 10


def _setup(seed=0, refinements=3, slab=32, cap=8, nb=32, passes=3):
    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=refinements)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    mp = build_multi_pass_plan(
        es.edge_index, n, n, block_nodes=nb, cap=cap, slab_width=slab, passes=passes
    )
    single = build_edge_kernel_plan(
        es.edge_index, n, n, block_nodes=nb, cap=cap, slab_width=slab
    )
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(1, n, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(1, n, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(1, n, H, D), jnp.float32)
    a_raw = jnp.asarray(rng.randn(es.num_edges, A), jnp.float32)
    a_raw = jnp.broadcast_to(a_raw[None], (1, es.num_edges, A))
    w = jnp.asarray(rng.randn(A, H * D) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(H * D) * 0.1, jnp.float32)

    def edge_transform(a):
        e = a @ w + b
        return e.reshape(*e.shape[:-1], H, D)

    return g, es, mp, single, q, k, v, a_raw, edge_transform


def test_multipass_partitions_edges_exactly_once():
    _, es, mp, single, *_ = _setup()
    assert isinstance(mp, MultiPassPlan)
    assert len(mp.plans) >= 2
    seen = np.zeros(es.num_edges, dtype=np.int64)
    for p in mp.plans:
        live = np.nonzero(p.slot_mask[:, 0] > 0)[0]
        np.add.at(seen, p.edge_ids[live], 1)
    np.add.at(seen, mp.plans[-1].outlier_edge_ids, 1)
    assert (seen == 1).all(), "every edge exactly once across passes + outliers"
    # slot_of_edge tables are disjoint and complete
    covered = np.zeros(es.num_edges, dtype=bool)
    for p in mp.plans:
        hit = p.slot_of_edge >= 0
        assert not (covered & hit).any()
        covered |= hit
    assert (covered | (mp.plans[-1].out_pos_of_edge >= 0)).all()


def test_multipass_improves_coverage_and_cost():
    _, _, mp, single, *_ = _setup()
    assert mp.coverage > single.coverage + 0.05
    # each extra pass must earn its place under the fitted cost model when
    # the outlier mass it removes is large (narrow-slab regime here)
    assert plan_cost(mp) < plan_cost(single)


@pytest.mark.parametrize("impl", ["reference", "pallas"])
def test_multipass_matches_reference(impl):
    _, es, mp, _, q, k, v, a_raw, edge_transform = _setup()
    e_proj = edge_transform(a_raw)
    ref = graph_transformer_conv(q, k, v, e_proj, jnp.asarray(es.edge_index))
    out = planned_edge_attention(q, k, v, a_raw, edge_transform, mp, impl=impl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-4)


def test_multipass_matches_single_pass():
    _, es, mp, single, q, k, v, a_raw, edge_transform = _setup(seed=3)
    a = planned_edge_attention(q, k, v, a_raw, edge_transform, mp, impl="reference")
    b = planned_edge_attention(q, k, v, a_raw, edge_transform, single, impl="reference")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("impl", ["reference", "pallas"])
def test_multipass_gradients_match_reference(impl):
    _, es, mp, _, q, k, v, a_raw, edge_transform = _setup(seed=2)
    e_idx = jnp.asarray(es.edge_index)

    def loss(q, k, v, a):
        return jnp.sum(
            planned_edge_attention(q, k, v, a, edge_transform, mp, impl=impl) ** 2
        )

    def loss_ref(q, k, v, a):
        return jnp.sum(graph_transformer_conv(q, k, v, edge_transform(a), e_idx) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, a_raw)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, a_raw)
    for name, ga, gb in zip("qkva", g, gr):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), atol=5e-4, rtol=5e-3, err_msg=name
        )


@pytest.mark.parametrize("impl", ["reference", "pallas"])
def test_multipass_feats_matches_reference(impl):
    _, es, mp, _, q, _, _, a_raw, edge_transform = _setup(seed=4)
    n = q.shape[1]
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(1, n, F), jnp.float32)
    w_kv = jnp.asarray(rng.randn(F, 2 * H * D) * 0.3, jnp.float32)
    b_kv = jnp.asarray(rng.randn(2 * H * D) * 0.1, jnp.float32)

    kv = feats @ w_kv + b_kv
    k = kv[..., : H * D].reshape(1, n, H, D)
    v = kv[..., H * D :].reshape(1, n, H, D)
    e_proj = edge_transform(a_raw)
    ref = graph_transformer_conv(q, k, v, e_proj, jnp.asarray(es.edge_index))

    out = planned_edge_attention_feats(
        q, feats, w_kv, b_kv, a_raw, edge_transform, mp, impl=impl
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-3)

    def loss(q, f):
        return jnp.sum(
            planned_edge_attention_feats(
                q, f, w_kv, b_kv, a_raw, edge_transform, mp, impl=impl
            )
            ** 2
        )

    gq, gf = jax.grad(loss, argnums=(0, 1))(q, feats)
    assert jnp.isfinite(gq).all() and jnp.isfinite(gf).all()
    assert float(jnp.abs(gf).max()) > 0


def test_edge_set_kernel_plan_passes_param_and_cache():
    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=3)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    p1 = edge_set_kernel_plan(es, n, n, slab_width=32, passes=1)
    p2 = edge_set_kernel_plan(es, n, n, slab_width=32, passes=3)
    assert not isinstance(p1, MultiPassPlan)
    assert isinstance(p2, MultiPassPlan)
    assert edge_set_kernel_plan(es, n, n, slab_width=32, passes=3) is p2  # memoized


def test_multipass_stops_early_when_residual_empty():
    # a pure ring graph: one pass covers everything -> plain plan back
    n = 256
    dst = np.repeat(np.arange(n), 2)
    src = np.stack([np.maximum(np.arange(n) - 1, 0), np.minimum(np.arange(n) + 1, n - 1)], 1).ravel()
    ei = np.stack([src, dst]).astype(np.int64)
    plan = build_multi_pass_plan(ei, n, n, block_nodes=32, cap=8, slab_width=64, passes=4)
    assert not isinstance(plan, MultiPassPlan)
    assert len(plan.outlier_src) == 0


@pytest.mark.parametrize("impl", ["reference", "pallas"])
def test_multipass_bipartite_encoder_matches_reference(impl):
    """Multi-pass plans on a bipartite (mapper) edge set — reachable via
    ANEMOI_PLAN_PASSES on the GT mapper's pallas path (num_src != num_dst,
    data->hidden encoder geometry)."""
    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=2)
    es = g[("data", "to", "hidden")]
    n_dst = g["hidden"].num_nodes
    n_src = g["data"].num_nodes
    mp = build_multi_pass_plan(
        es.edge_index, n_dst, n_src, block_nodes=32, cap=16, slab_width=32, passes=3
    )
    assert isinstance(mp, MultiPassPlan)
    seen = np.zeros(es.num_edges, dtype=np.int64)
    for p in mp.plans:
        live = np.nonzero(p.slot_mask[:, 0] > 0)[0]
        np.add.at(seen, p.edge_ids[live], 1)
    np.add.at(seen, mp.plans[-1].outlier_edge_ids, 1)
    assert (seen == 1).all()

    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(1, n_dst, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(1, n_src, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(1, n_src, H, D), jnp.float32)
    a_raw = jnp.broadcast_to(
        jnp.asarray(rng.randn(es.num_edges, A), jnp.float32)[None],
        (1, es.num_edges, A),
    )
    w = jnp.asarray(rng.randn(A, H * D) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(H * D) * 0.1, jnp.float32)

    def edge_transform(a):
        e = a @ w + b
        return e.reshape(*e.shape[:-1], H, D)

    ref = graph_transformer_conv(
        q, k, v, edge_transform(a_raw), jnp.asarray(es.edge_index), num_dst=n_dst
    )
    out = planned_edge_attention(q, k, v, a_raw, edge_transform, mp, impl=impl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-4)


def test_auto_passes_prefers_single_pass_at_r5():
    """passes=-1 must stop at one pass on the r5 processor mesh — pinned to
    the on-chip A/B (13.42 ms single vs 22.65 ms two-pass, PERF.md round 4).
    The κ validation bounds (examples/kappa_fit.py) make this a model
    decision, not a default. Uses the real O96 builder: the fine-level RCM
    ordering is part of the measured geometry."""
    g = build_enc_proc_dec_graph(grid_lat=96, grid="octahedral", mesh_refinements=5)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    plan = build_multi_pass_plan(es.edge_index, n, n, passes=-1)
    assert not isinstance(plan, MultiPassPlan)


def test_auto_passes_routed_through_env_knob():
    """ANEMOI_PLAN_PASSES=-1 reaches the multipass builder (advisor round-4
    finding: the -1 documented in docs/kernels.md was silently clamped)."""
    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=3)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    auto = edge_set_kernel_plan(es, n, n, slab_width=32, passes=-1)
    # tiny mesh: auto may keep 1 pass or add more — the invariant is that it
    # routed through the multipass builder and returned a usable plan
    assert auto is edge_set_kernel_plan(es, n, n, slab_width=32, passes=-1)
    explicit = edge_set_kernel_plan(es, n, n, slab_width=32, passes=1)
    assert plan_cost(auto) <= plan_cost(explicit)


def test_auto_passes_halo_plans():
    """build_halo_kernel_plans(passes=-1): greedy auto under the summed
    cost rule returns a well-formed sharded plan."""
    from anemoi_models_tpu.graphs.kernel_plan import build_halo_kernel_plans
    from anemoi_models_tpu.graphs.partition import partition_1hop

    g = build_enc_proc_dec_graph(grid_lat=8, mesh_refinements=3)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    part = partition_1hop(es.edge_index, n, 4)
    sp = build_halo_kernel_plans(part, block_nodes=32, passes=-1)
    assert sp.num_shards == 4
    assert sp.slab_start.ndim in (2, 3)  # 1 pass (legacy) or stacked passes
