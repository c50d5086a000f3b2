"""Constant hoisting: graph tables as runtime arguments (utils/hoist.py).

The O1280 compile lever — every edge-table literal becomes a program
parameter. These tests pin (a) numerical equality of the hoisted replay
against the plain jitted path, forward and train step, under the (data,
model) mesh, and (b) that hoisting actually strips the large literals from
the lowered program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from anemoi_models_tpu.data_indices import IndexCollection
from anemoi_models_tpu.models import AnemoiModelEncProcDec
from anemoi_models_tpu.parallel import make_mesh, use_mesh
from anemoi_models_tpu.training import make_train_step
from anemoi_models_tpu.utils import hoist_constants
from helpers_models import VARS, make_config

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def _setup(small_graph):
    cfg = make_config("graphtransformer")
    di = IndexCollection(cfg, dict(VARS))
    model = AnemoiModelEncProcDec(model_config=cfg, data_indices=di, graph_data=small_graph)
    n_grid = small_graph["data"].num_nodes
    n_in = len(di.internal_model.input)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 2, 1, n_grid, n_in), jnp.float32)
    return model, x, n_grid


def test_hoisted_forward_matches(small_graph):
    model, x, _ = _setup(small_graph)
    params = model.init(jax.random.key(0), x)
    mesh = make_mesh(data=2, model=4)
    with use_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, "model", None)))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        ref = jax.jit(model.apply)(ps, xs)
        wrapped, consts = hoist_constants(model.apply, params, x)
        out = jax.jit(wrapped)(consts, ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
    assert len(consts) > 0


def test_hoisted_lowering_has_no_table_literals(small_graph):
    model, x, _ = _setup(small_graph)
    params = model.init(jax.random.key(0), x)
    mesh = make_mesh(data=2, model=4)
    with use_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, "model", None)))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        plain_text = jax.jit(model.apply).lower(ps, xs).as_text()
        wrapped, consts = hoist_constants(model.apply, params, x)
        hoisted_text = jax.jit(wrapped).lower(consts, ps, xs).as_text()
    # the raw-coordinate/edge tables lower as big dense<...> literals in the
    # plain program; hoisted, only small literals (iotas, scalars) remain
    import re

    def biggest_literal(text):
        best = 0
        for m in re.finditer(r"dense<", text):
            end = text.find(">", m.end())
            best = max(best, end - m.end())
        return best

    assert biggest_literal(hoisted_text) < biggest_literal(plain_text) / 10


def test_hoisted_train_step_matches(small_graph):
    model, x, n_grid = _setup(small_graph)
    y = jnp.zeros((2, 1, n_grid, 4), jnp.float32)
    init_state, train_step = make_train_step(model, optax.adam(1e-3))
    mesh = make_mesh(data=2, model=4)
    with use_mesh(mesh):
        repl = NamedSharding(mesh, P())
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, "model", None)))
        ys = jax.device_put(y, NamedSharding(mesh, P("data", None, "model", None)))
        state = jax.jit(init_state, out_shardings=repl)(jax.random.key(0), x)
        s_ref, loss_ref = jax.jit(
            train_step, in_shardings=(repl, xs.sharding, ys.sharding),
            out_shardings=(repl, repl),
        )(state, xs, ys)

        wrapped, consts = hoist_constants(train_step, state, xs, ys)
        s_h, loss_h = jax.jit(
            wrapped, in_shardings=(repl, repl, xs.sharding, ys.sharding),
            out_shardings=(repl, repl),
        )(consts, state, xs, ys)

    assert np.isclose(float(loss_ref), float(loss_h), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params), jax.tree_util.tree_leaves(s_h.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
