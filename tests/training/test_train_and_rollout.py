import jax
import jax.numpy as jnp
import numpy as np
import optax

from anemoi_models_tpu.data_indices import IndexCollection
from anemoi_models_tpu.models import AnemoiModelEncProcDec
from anemoi_models_tpu.training import make_rollout_fn, make_train_step, weighted_mse
from helpers_models import VARS, make_config


def build(small_graph):
    cfg = make_config("graphtransformer", num_channels=8)
    di = IndexCollection(cfg, dict(VARS))
    model = AnemoiModelEncProcDec(model_config=cfg, data_indices=di, graph_data=small_graph)
    n_grid = small_graph["data"].num_nodes
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 1, n_grid, 4), jnp.float32)
    return cfg, di, model, x


def test_train_loss_decreases(small_graph):
    _, di, model, x = build(small_graph)
    y = jnp.asarray(np.random.RandomState(1).randn(1, 1, x.shape[3], 4) * 0.1, jnp.float32)
    init_state, train_step = make_train_step(model, optax.adam(1e-2))
    state = init_state(jax.random.key(0), x)
    step = jax.jit(train_step)
    losses = []
    for _ in range(5):
        state, loss = step(state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_weighted_mse_masking():
    pred = jnp.ones((2, 4, 3))
    target = jnp.zeros((2, 4, 3))
    mask = jnp.zeros((4, 3))
    assert float(weighted_mse(pred, target, loss_mask=mask)) == 0.0
    w = jnp.asarray(np.array([1.0, 0.0, 0.0, 0.0]))
    assert float(weighted_mse(pred, target, node_weights=w)) == 1.0


def test_rollout(small_graph):
    _, di, model, x = build(small_graph)
    params = model.init(jax.random.key(0), x)
    n_steps = 3
    rollout = make_rollout_fn(model, di, n_steps)
    n_grid = x.shape[3]
    forcings = jnp.zeros((n_steps, 1, 1, n_grid, 1), jnp.float32)
    x_final, preds = jax.jit(rollout)(params, x, forcings)
    assert preds.shape == (n_steps, 1, 1, n_grid, 4)
    assert x_final.shape == x.shape
    assert jnp.isfinite(preds).all()
    # window advanced: last input slice contains the fed-back prognostic predictions
    prog_in = np.asarray(di.internal_model.input.prognostic)
    prog_out = np.asarray(di.internal_model.output.prognostic)
    np.testing.assert_allclose(
        np.asarray(x_final[0, -1, 0, :, prog_in]),
        np.asarray(preds[-1][0, 0, :, prog_out]),
        atol=1e-6,
    )


def test_make_optimizer_and_ema(small_graph):
    from anemoi_models_tpu.training import ema_update, make_optimizer

    _, di, model, x = build(small_graph)
    y = jnp.zeros((1, 1, x.shape[3], 4), jnp.float32)
    opt = make_optimizer(1e-2, warmup_steps=2, total_steps=10, clip_norm=1.0)
    init_state, train_step = make_train_step(model, opt)
    state = init_state(jax.random.key(0), x)
    ema = state.params
    step = jax.jit(train_step)
    for _ in range(3):
        state, loss = step(state, x, y)
        ema = jax.jit(ema_update)(ema, state.params)
    assert np.isfinite(float(loss))
    # EMA lags behind live params
    p_live = jax.tree_util.tree_leaves(state.params)[0]
    p_ema = jax.tree_util.tree_leaves(ema)[0]
    assert not np.allclose(np.asarray(p_live), np.asarray(p_ema))


def test_synthetic_weather_batches_and_statistics():
    """The synthetic data source: shapes, advection structure, statistics."""
    from anemoi_models_tpu.training.data import SyntheticWeather

    rng = np.random.RandomState(7)
    coords = np.stack([
        (rng.rand(64) - 0.5) * np.pi, rng.rand(64) * 2 * np.pi
    ], axis=1)
    src = SyntheticWeather(coords, num_vars=5, seed=7)

    b = src.batch(batch_size=2, window=3)
    assert b.shape == (2, 3, 64, 5)
    assert np.isfinite(b).all()

    # the noiseless field advects: consecutive states differ smoothly
    f0, f1 = src.field(0.0), src.field(1.0)
    assert not np.array_equal(f0, f1)
    assert np.abs(f1 - f0).max() < np.abs(f0).max() + 1.0

    it = src.batches(batch_size=1, window=2)
    first, second = next(it), next(it)
    assert first.shape == second.shape == (1, 2, 64, 5)

    stats = src.statistics(samples=8)
    for key in ("mean", "stdev", "minimum", "maximum"):
        assert key in stats and np.isfinite(stats[key]).all()
    assert (stats["stdev"] > 0).all()


def test_crps_ensemble_matches_bruteforce():
    import numpy as np

    from anemoi_models_tpu.training.loss import crps_ensemble

    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    y = rng.randn(2, 1, 7, 3).astype(np.float32)
    m = x.shape[1]
    skill = np.abs(x - y).mean(1)
    pair = sum(
        np.abs(x[:, i] - x[:, j]) for i in range(m) for j in range(m)
    )
    ref = float((skill - pair / (2 * m * (m - 1))).mean())
    got = float(crps_ensemble(jnp.asarray(x), jnp.asarray(y)))
    assert abs(got - ref) < 1e-6
    # all members == truth -> zero; M=1 -> MAE
    z = np.repeat(y, m, axis=1)
    assert abs(float(crps_ensemble(jnp.asarray(z), jnp.asarray(y)))) < 1e-7
    mae = float(np.abs(x[:, :1] - y).mean())
    assert abs(float(crps_ensemble(jnp.asarray(x[:, :1]), jnp.asarray(y))) - mae) < 1e-6


def test_crps_weighted_and_grad():
    import numpy as np

    from anemoi_models_tpu.training.loss import WeightedCRPSLoss

    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.randn(1, 4, 6, 2).astype(np.float32))
    target = jnp.asarray(rng.randn(1, 1, 6, 2).astype(np.float32))
    w = jnp.asarray(np.abs(rng.rand(6)) + 0.1)
    loss_fn = WeightedCRPSLoss(node_weights=w)
    val, grad = jax.value_and_grad(lambda p: loss_fn(p, target))(pred)
    assert np.isfinite(float(val)) and np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).max()) > 0
