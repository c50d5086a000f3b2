"""Fused-kernel edge attention inside the halo shard_map vs global reference.

The multi-chip execution of ``graph_impl="pallas"``: per-shard kernel plans
(``graphs/kernel_plan.py:build_halo_kernel_plans``) run the hand-written
Pallas forward/backward (interpret mode on CPU) on each shard's contiguized
local subgraph, outliers merge via masked COO partials. Reference semantics:
``/root/reference/src/anemoi/models/layers/conv.py:79-142``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.graphs.kernel_plan import build_halo_kernel_plans
from anemoi_models_tpu.graphs.partition import partition_1hop
from anemoi_models_tpu.ops.slot_attention import (
    coo_attention_partials,
    finalize_partials,
)
from anemoi_models_tpu.parallel import make_mesh, use_mesh
from anemoi_models_tpu.parallel.halo_conv import halo_planned_edge_attention

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def _setup(refinements=3, h=4, d=8, a_dim=4, batch=1, seed=0):
    g = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=refinements)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(batch, n, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(batch, n, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(batch, n, h, d), jnp.float32)
    a0 = jnp.asarray(rng.randn(es.num_edges, a_dim), jnp.float32)
    w = jnp.asarray(rng.randn(a_dim, h, d), jnp.float32) * 0.3
    b = jnp.asarray(rng.randn(h, d), jnp.float32) * 0.1
    edge_transform = lambda a: jnp.einsum("...a,ahd->...hd", a, w) + b  # noqa: E731
    return g, es, n, q, k, v, a0, edge_transform


def _global_ref(es, n, q, k, v, a0, edge_transform):
    src, dst = (jnp.asarray(x) for x in np.asarray(es.edge_index))
    e_proj = edge_transform(a0)

    def one(q1, k1, v1):
        p = coo_attention_partials(q1, k1, v1, e_proj, src, dst, n)
        return finalize_partials(p, v1.dtype)

    return jax.vmap(one)(q, k, v)


def _halo_inputs(sp, a0, edge_transform):
    from anemoi_models_tpu.ops.slot_attention import halo_planned_edge_inputs

    return halo_planned_edge_inputs(a0, sp, edge_transform)


def test_halo_planned_attention_matches_global():
    g, es, n, q, k, v, a0, et = _setup(batch=2)
    ref = _global_ref(es, n, q, k, v, a0, et)

    part = partition_1hop(es.edge_index, n, 8)
    sp = build_halo_kernel_plans(part, slab_width=256)
    assert sp.coverage > 0.5  # the fine level must land in-kernel
    a_slots, e_out, w_aug = _halo_inputs(sp, a0, et)

    mesh = make_mesh(data=1, model=8)
    out = jax.jit(
        lambda q, k, v: halo_planned_edge_attention(
            mesh, part, sp, q, k, v, a_slots, e_out, w_aug
        )
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_halo_planned_attention_grads_flow():
    g, es, n, q, k, v, a0, et = _setup(refinements=2)
    part = partition_1hop(es.edge_index, n, 8)
    sp = build_halo_kernel_plans(part, slab_width=256)
    a_slots, e_out, w_aug = _halo_inputs(sp, a0, et)
    mesh = make_mesh(data=1, model=8)

    def loss(q, k, v, w_aug):
        out = halo_planned_edge_attention(
            mesh, part, sp, q, k, v, a_slots, e_out, w_aug
        )
        return jnp.sum(out**2)

    ref = _global_ref(es, n, q, k, v, a0, et)

    def loss_ref(q, k, v):
        return jnp.sum(_global_ref(es, n, q, k, v, a0, et) ** 2)

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(q, k, v, w_aug)
    ref_grads = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for name, got, want in zip("qkv", grads[:3], ref_grads):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-4, rtol=2e-3, err_msg=name
        )
    assert jnp.isfinite(grads[3]).all() and float(jnp.abs(grads[3]).max()) > 0


def test_halo_planned_backward_is_scatter_free():
    """The full halo-kernel backward — slot kernels, outlier COO partials,
    the a0 gathers, and the contiguizing permutation — compiles without a
    single scatter op (padded-transpose / masked-position-take adjoints)."""
    g, es, n, q, k, v, a0, et = _setup(refinements=2)
    part = partition_1hop(es.edge_index, n, 8)
    sp = build_halo_kernel_plans(part, slab_width=256)
    mesh = make_mesh(data=1, model=8)

    def loss(q, k, v, a0):
        a_slots, e_out, w_aug = _halo_inputs(sp, a0, et)
        out = halo_planned_edge_attention(
            mesh, part, sp, q, k, v, a_slots, e_out, w_aug
        )
        return jnp.sum(out**2)

    compiled = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3))).lower(q, k, v, a0).compile()
    grads = compiled(q, k, v, a0)
    assert all(jnp.isfinite(gr).all() for gr in grads)
    # reduce-scatter is the all_gather adjoint collective (wanted); what must
    # not appear is the serialized HLO scatter op: "%scatter...", scatter-add,
    # scatter-max etc.
    bad = [
        ln for ln in compiled.as_text().splitlines()
        if "scatter(" in ln and "reduce-scatter" not in ln and "reduce_scatter" not in ln
    ]
    assert not bad, f"halo kernel-path backward must be scatter-free: {bad[:3]}"


def test_interface_predict_under_mesh_matches_single_device():
    """The serve surface (pre -> forward -> post via make_predict_fn) under
    a model-axis mesh with the halo kernel path equals the single-device
    prediction — serving at scale, not just raw model.apply."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from helpers_models import VARS, make_config, make_statistics
    from anemoi_models_tpu.data_indices import IndexCollection
    from anemoi_models_tpu.interface import AnemoiModelInterface
    from anemoi_models_tpu.parallel import use_mesh

    graph = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=2)
    cfg = make_config("graphtransformer")
    cfg.model.processor.graph_impl = "pallas"
    di = IndexCollection(cfg, dict(VARS))
    iface = AnemoiModelInterface(
        config=cfg, graph_data=graph, statistics=make_statistics(),
        data_indices=di, metadata={},
    )
    n_grid = graph["data"].num_nodes
    iface.init_params(jax.random.key(0))
    batch = jnp.asarray(np.random.RandomState(1).rand(1, 2, n_grid, 4), jnp.float32)
    ref = iface.predict_step(batch)

    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        rep = NamedSharding(mesh, P())
        fn = jax.jit(iface.make_predict_fn())
        out = fn(jax.device_put(iface.params, rep), jax.device_put(batch, rep))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)


def test_hierarchical_pallas_under_mesh_matches_single_device():
    """Hierarchical model with graph_impl='pallas': every per-level processor
    gets its own per-shard halo kernel plans under the mesh and the forward
    matches single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from helpers_models import VARS, make_config
    from anemoi_models_tpu.data_indices import IndexCollection
    from anemoi_models_tpu.graphs import build_hierarchical_graph
    from anemoi_models_tpu.models import AnemoiModelEncProcDecHierarchical
    from anemoi_models_tpu.parallel import use_mesh

    graph, hidden_names = build_hierarchical_graph(
        grid_lat=8, mesh_refinements=3, num_levels=2
    )
    cfg = make_config("graphtransformer", num_channels=16)
    cfg.graph.hidden = list(hidden_names)
    cfg.model.model._target_ = (
        "anemoi.models.models.hierarchical.AnemoiModelEncProcDecHierarchical"
    )
    cfg.model.enable_hierarchical_level_processing = True
    cfg.model.level_process_num_layers = 2
    cfg.model.processor.graph_impl = "pallas"
    di = IndexCollection(cfg, dict(VARS))
    model = AnemoiModelEncProcDecHierarchical(
        model_config=cfg, data_indices=di, graph_data=graph
    )
    n_grid = graph["data"].num_nodes
    n_in = len(di.internal_model.input)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 1, n_grid, n_in), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x)
    ref = jax.jit(model.apply)(params, x)

    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P()))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        out = jax.jit(model.apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)


def test_train_step_through_halo_kernel_matches_single_device():
    """Full model train step (fwd+bwd+adam) with graph_impl='pallas' under a
    model-axis mesh: one step's loss and updated params match the same step
    taken without a mesh (single-chip planned path) — the multi-chip
    training story end-to-end through the hand-written kernels."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from helpers_models import VARS, make_config
    from anemoi_models_tpu.data_indices import IndexCollection
    from anemoi_models_tpu.models import AnemoiModelEncProcDec
    from anemoi_models_tpu.training import make_train_step
    from anemoi_models_tpu.parallel import use_mesh

    graph = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=2)
    n_grid = graph["data"].num_nodes
    cfg = make_config("graphtransformer", num_channels=16)
    cfg.model.processor.graph_impl = "pallas"
    di = IndexCollection(cfg, dict(VARS))
    model = AnemoiModelEncProcDec(model_config=cfg, data_indices=di, graph_data=graph)
    n_in = len(di.internal_model.input)
    n_out = len(di.internal_model.output)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 2, 1, n_grid, n_in), jnp.float32)
    y = jnp.asarray(rng.randn(1, 1, n_grid, n_out), jnp.float32)

    opt = optax.adam(1e-3)
    init_state, train_step = make_train_step(model, opt)
    state0 = init_state(jax.random.key(0), x)
    ref_state, ref_loss = jax.jit(train_step)(state0, x, y)

    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        rep = NamedSharding(mesh, P())
        state0s = jax.device_put(state0, rep)
        xs, ys = jax.device_put((x, y), rep)
        new_state, loss = jax.jit(train_step)(state0s, xs, ys)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_state.params)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(new_state.params))
    for path, leaf in flat_ref:
        got = flat_new[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), atol=5e-4, rtol=2e-2,
            err_msg=jax.tree_util.keystr(path),
        )


def test_gt_processor_pallas_under_mesh_matches_single_device():
    """graph_impl='pallas' + a >1 model axis routes through the per-shard
    kernel plans (HaloTables.plans) and matches the single-device result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from anemoi_models_tpu.layers import GraphTransformerProcessor

    g = build_enc_proc_dec_graph(grid_lat=8, mesh_refinements=3)
    n = g["hidden"].num_nodes
    ch = 32
    kw = dict(num_layers=2, num_channels=ch, num_chunks=1, num_heads=4,
              trainable_size=2, sub_graph=g[("hidden", "to", "hidden")])
    x = jnp.asarray(np.random.RandomState(0).randn(1, n, ch), jnp.float32)

    ref_proc = GraphTransformerProcessor(graph_impl="dense", **kw)
    params = jax.jit(ref_proc.init)(jax.random.key(0), x)
    ref = jax.jit(ref_proc.apply)(params, x)

    proc = GraphTransformerProcessor(graph_impl="pallas", **kw)
    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P()))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        out = jax.jit(proc.apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)


def test_halo_planned_attention_multipass_matches_global():
    """Multi-window per-shard chains (passes>1): coverage rises, forward
    and grads still equal the global COO reference — the r8 coverage fix
    exercised end-to-end under the mesh."""
    g, es, n, q, k, v, a0, et = _setup(batch=1)
    part = partition_1hop(es.edge_index, n, 8)
    sp1 = build_halo_kernel_plans(part, slab_width=64)
    sp = build_halo_kernel_plans(part, slab_width=64, passes=3)
    assert sp.num_passes >= 2
    assert sp.coverage > sp1.coverage + 0.05
    # exact partition across passes + outliers
    seen = np.zeros(sp.num_edges, dtype=np.int64)
    ids = np.asarray(sp.edge_ids)[np.asarray(sp.slot_mask)[..., 0] > 0]
    np.add.at(seen, ids, 1)
    np.add.at(seen, np.asarray(sp.out_eid)[np.asarray(sp.out_mask) > 0], 1)
    assert (seen == 1).all()

    ref = _global_ref(es, n, q, k, v, a0, et)
    a_slots, e_out, w_aug = _halo_inputs(sp, a0, et)
    mesh = make_mesh(data=1, model=8)
    out = jax.jit(
        lambda q, k, v: halo_planned_edge_attention(
            mesh, part, sp, q, k, v, a_slots, e_out, w_aug
        )
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)

    def loss(q, k, v):
        return jnp.sum(halo_planned_edge_attention(
            mesh, part, sp, q, k, v, a_slots, e_out, w_aug
        ) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_global_ref(es, n, q, k, v, a0, et) ** 2)

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    ref_grads = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for name, got, want in zip("qkv", grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-4, rtol=2e-3, err_msg=name
        )
