import jax
import jax.numpy as jnp
import numpy as np

from anemoi_models_tpu.checkpoint import load_checkpoint, save_checkpoint
from anemoi_models_tpu.layers import MLP


def test_checkpoint_roundtrip(tmp_path):
    mlp = MLP(hidden_dim=8, out_features=4)
    x = jnp.ones((2, 6))
    params = mlp.init(jax.random.key(0), x)
    proc_state = {"imputer": {"nan_locations": jnp.zeros((5, 3), bool)}}

    path = save_checkpoint(
        str(tmp_path / "ckpt"),
        params=params,
        processor_state=proc_state,
        step=7,
        metadata={"experiment": "unit"},
        config={"model": {"num_channels": 8}},
        supporting_arrays={"latitudes": np.arange(5.0)},
        run_id="abc-123",
    )
    restored = load_checkpoint(path)
    assert restored["step"] == 7
    assert restored["run_id"] == "abc-123"
    assert restored["metadata"]["experiment"] == "unit"
    np.testing.assert_array_equal(restored["supporting_arrays"]["latitudes"], np.arange(5.0))
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(restored["params"]),
        jax.tree_util.tree_leaves_with_path(params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(restored["processor_state"]["imputer"]["nan_locations"]),
        np.zeros((5, 3), bool),
    )


def test_cli_hello(capsys):
    from anemoi_models_tpu.commands import main

    assert main(["hello", "--name", "anemoi"]) == 0
    assert "Hello, anemoi!" in capsys.readouterr().out


def test_cli_info(capsys):
    from anemoi_models_tpu.commands import main

    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "anemoi-models-tpu" in out and "backend" in out
