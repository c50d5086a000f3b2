"""Training-time dropout is reachable from the training stack.

The reference trains with attention-weight dropout
(``/root/reference/src/anemoi/models/layers/attention.py:60,99-105`` via
``layers/processor.py:100``); round 2 supported it at the layer level but the
train-step builders never threaded an rng. These tests pin the round-3 fix:
a ``deterministic=False`` model trains under jit, the noise stream varies per
optimizer step, and parameter trees stay interchangeable with the serving
(deterministic) twin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from anemoi_models_tpu.data_indices import IndexCollection
from anemoi_models_tpu.models import AnemoiModelEncProcDec
from anemoi_models_tpu.training import make_rollout_train_step, make_train_step
from anemoi_models_tpu.training.run import _wants_dropout
from helpers_models import VARS, make_config


def _build(small_graph, dropout_p: float):
    cfg = make_config("transformer", num_channels=8)
    cfg.model.processor.dropout_p = dropout_p
    di = IndexCollection(cfg, dict(VARS))
    serve = AnemoiModelEncProcDec(model_config=cfg, data_indices=di, graph_data=small_graph)
    train = serve.clone(deterministic=False)
    n_grid = small_graph["data"].num_nodes
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 1, n_grid, 4), jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randn(1, 1, n_grid, 4) * 0.1, jnp.float32)
    return cfg, di, serve, train, x, y


def test_dropout_train_step_runs_and_differs(small_graph):
    _, _, serve, train, x, y = _build(small_graph, dropout_p=0.3)
    # lr=0 keeps params frozen, so loss differences are pure dropout noise
    opt = optax.sgd(0.0)
    init_drop, step_drop = make_train_step(train, opt, dropout_seed=5)
    state = init_drop(jax.random.key(0), x)
    jstep = jax.jit(step_drop)
    state1, loss1 = jstep(state, x, y)
    state2, loss2 = jstep(state1, x, y)

    _, step_det = make_train_step(serve, opt)
    _, loss_det_a = jax.jit(step_det)(state, x, y)
    _, loss_det_b = jax.jit(step_det)(state1, x, y)

    # deterministic twin is step-invariant; the dropout twin is not
    assert float(loss_det_a) == float(loss_det_b)
    assert float(loss1) != float(loss_det_a)
    assert float(loss1) != float(loss2), "dropout stream must advance with the step counter"


def test_dropout_param_tree_matches_serving(small_graph):
    _, _, serve, train, x, _ = _build(small_graph, dropout_p=0.3)
    init_drop, _ = make_train_step(train, optax.sgd(0.0))
    _, _ = make_train_step(serve, optax.sgd(0.0))
    p_train = init_drop(jax.random.key(0), x).params
    p_serve = serve.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(p_train) == jax.tree_util.tree_structure(p_serve)
    # the serving model runs the trained params unchanged
    out = serve.apply(p_train, x)
    assert bool(jnp.isfinite(out).all())


def test_dropout_rollout_train_step(small_graph):
    _, di, _, train, x, _ = _build(small_graph, dropout_p=0.3)
    n_grid = x.shape[3]
    init_state, step = make_rollout_train_step(train, di, optax.adam(1e-3), n_steps=2)
    state = init_state(jax.random.key(0), x)
    truth = jnp.asarray(np.random.RandomState(2).randn(2, 1, 1, n_grid, 4), jnp.float32)
    targets = jnp.asarray(np.random.RandomState(3).randn(2, 1, 1, n_grid, 4) * 0.1, jnp.float32)
    state, loss = jax.jit(step)(state, x, truth, targets)
    assert bool(jnp.isfinite(loss))
    assert int(state.step) == 1


def test_rollout_requires_rng_when_nondeterministic(small_graph):
    from anemoi_models_tpu.training import make_rollout_fn

    _, di, _, train, x, _ = _build(small_graph, dropout_p=0.3)
    rollout = make_rollout_fn(train, di, n_steps=2)
    forcings = jnp.zeros((2, 1, 1, x.shape[3], 1), jnp.float32)
    params = train.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)
    with pytest.raises(ValueError, match="dropout key"):
        rollout(params, x, forcings)
    _, preds = rollout(params, x, forcings, rng=jax.random.key(2))
    assert preds.shape[0] == 2 and bool(jnp.isfinite(preds).all())


def test_wants_dropout_detection():
    cfg = make_config("transformer", num_channels=8)
    assert not _wants_dropout(cfg.model)
    cfg.model.processor.dropout_p = 0.1
    assert _wants_dropout(cfg.model)
    assert not _wants_dropout(make_config("graphtransformer", num_channels=8).model)
