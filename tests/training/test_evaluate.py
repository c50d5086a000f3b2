import jax
import jax.numpy as jnp
import numpy as np

from anemoi_models_tpu.data_indices import IndexCollection
from anemoi_models_tpu.models import AnemoiModelEncProcDec
from anemoi_models_tpu.training.evaluate import evaluate_rollout, rollout_scores
from helpers_models import VARS, make_config


def test_rollout_scores_basic():
    steps, b, e, g, v = 3, 1, 1, 10, 2
    truth = jnp.zeros((steps, b, e, g, v))
    preds = jnp.ones((steps, b, e, g, v)) * jnp.asarray([1.0, 2.0])
    s = rollout_scores(preds, truth)
    np.testing.assert_allclose(s["rmse"], np.tile([1.0, 2.0], (steps, 1)), atol=1e-6)
    np.testing.assert_allclose(s["mae"], np.tile([1.0, 2.0], (steps, 1)), atol=1e-6)
    # perfect forecast with climatology -> acc == 1
    clim = jnp.zeros((g, v))
    truth2 = jnp.asarray(np.random.RandomState(0).randn(steps, b, e, g, v))
    s2 = rollout_scores(truth2, truth2, climatology=clim)
    np.testing.assert_allclose(s2["acc"], 1.0, atol=1e-5)


def test_evaluate_rollout_shapes_and_skill(small_graph):
    cfg = make_config("graphtransformer", num_channels=8)
    di = IndexCollection(cfg, dict(VARS))
    model = AnemoiModelEncProcDec(model_config=cfg, data_indices=di, graph_data=small_graph)
    n_grid = small_graph["data"].num_nodes
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 2, 1, n_grid, 4), jnp.float32)
    params = model.init(jax.random.key(0), x0)
    steps = 3
    truth = jnp.asarray(rng.randn(steps, 1, 1, n_grid, 4), jnp.float32)
    weights = jnp.asarray(small_graph["data"].attrs["area_weight"][:, 0])
    scores = evaluate_rollout(model, di, params, x0, truth, node_weights=weights)
    n_prog = len(di.internal_model.input.prognostic)
    assert scores["rmse"].shape == (steps, n_prog)
    assert scores["persistence_rmse"].shape == (steps, n_prog)
    assert np.isfinite(scores["rmse"]).all()
    assert np.isfinite(scores["skill_vs_persistence"]).all()


def test_evaluate_interface_acc(tmp_path):
    """ACC against the dataset climatology: perfect forecast -> acc == 1."""
    import numpy as np

    from anemoi_models_tpu.graphs import latlon_grid_nodes
    from anemoi_models_tpu.training import evaluate_interface, train_run
    from anemoi_models_tpu.training.dataset import SyntheticSource

    coords = latlon_grid_nodes(8).coords
    source = SyntheticSource(coords, num_vars=4, num_steps=48, seed=2)
    result = train_run(
        source, forcing=("var_0",), steps=2, peak_lr=1e-3,
        mesh_refinements=1,
        model_kwargs=dict(num_channels=16, num_layers=2, num_heads=2, num_chunks=1,
                          trainable_hidden=2, trainable_edges=2),
        batch_size=2, seed=0, log=lambda s: None,
    )
    scores = evaluate_interface(result["interface"], source, n_steps=2,
                                params=result["state"].params, acc=True)
    assert scores["acc"].shape == scores["rmse"].shape
    assert np.all(scores["acc"] <= 1.0 + 1e-6)
    # persistence of a smooth field correlates strongly with truth anomalies
    assert np.isfinite(scores["persistence_acc"]).all()


def test_evaluate_interface_ensemble(tmp_path):
    import numpy as np

    from anemoi_models_tpu.graphs import latlon_grid_nodes
    from anemoi_models_tpu.training import evaluate_interface, train_run
    from anemoi_models_tpu.training.dataset import SyntheticSource

    coords = latlon_grid_nodes(8).coords
    source = SyntheticSource(coords, num_vars=4, num_steps=48, seed=2)
    result = train_run(
        source, forcing=("var_0",), steps=2, peak_lr=1e-3,
        mesh_refinements=1,
        model_kwargs=dict(num_channels=16, num_layers=2, num_heads=2, num_chunks=1,
                          trainable_hidden=2, trainable_edges=2),
        batch_size=2, seed=0, log=lambda s: None,
    )
    scores = evaluate_interface(result["interface"], source, n_steps=3,
                                params=result["state"].params,
                                ensemble=4, perturb_sigma=0.05)
    for key in ("crps", "spread", "spread_skill_ratio", "ens_mean_rmse"):
        assert scores[key].shape == (3,)
        assert np.isfinite(scores[key]).all()
    assert (scores["crps"] > 0).all() and (scores["spread"] > 0).all()
    # fair CRPS of an M-member forecast never exceeds the per-member MAE scale
    assert (scores["crps"] <= scores["mae"].mean(axis=1) * 1.5).all()
