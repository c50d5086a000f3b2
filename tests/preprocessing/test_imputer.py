import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.data_indices import IndexCollection
from anemoi_models_tpu.preprocessing.imputer import (
    ConstantImputer,
    DynamicConstantImputer,
    InputImputer,
)
from anemoi_models_tpu.utils import DotDict


def make_indices(extra=None):
    config = DotDict(
        {
            "data": {
                "forcing": ["z"],
                "diagnostic": ["other"],
                **(extra or {}),
            }
        }
    )
    name_to_index = {"x": 0, "y": 1, "z": 2, "q": 3, "other": 4}
    return config, IndexCollection(config=config, name_to_index=name_to_index)


@pytest.fixture
def input_imputer():
    _, data_indices = make_indices()
    cfg = DotDict({"default": "none", "mean": ["y"], "maximum": ["x"], "minimum": ["q"]})
    statistics = {
        "mean": np.array([1.0, 2.0, 3.0, 4.5, 3.0]),
        "maximum": np.array([11.0, 10.0, 10.0, 10.0, 10.0]),
        "minimum": np.array([1.0, 1.0, 1.0, 1.0, 1.0]),
    }
    return InputImputer(config=cfg, data_indices=data_indices, statistics=statistics)


@pytest.fixture
def batch_with_nans():
    # (batch, time, grid, vars)
    x = np.arange(2 * 2 * 3 * 5, dtype=np.float32).reshape(2, 2, 3, 5)
    x[:, :, 0, 0] = np.nan  # x at grid 0
    x[:, :, 1, 1] = np.nan  # y at grid 1
    x[:, :, 2, 3] = np.nan  # q at grid 2
    return jnp.asarray(x)


def test_transform_replaces_nans(input_imputer, batch_with_nans):
    out = input_imputer.transform(batch_with_nans)
    assert not jnp.isnan(out).any()
    # x at grid 0 replaced with maximum[0] = 11
    assert out[0, 0, 0, 0] == 11.0
    # y at grid 1 replaced with mean[1] = 2
    assert out[0, 0, 1, 1] == 2.0
    # q at grid 2 replaced with minimum[3] = 1
    assert out[0, 0, 2, 3] == 1.0
    # untouched value unchanged
    assert out[0, 0, 0, 2] == batch_with_nans[0, 0, 0, 2]


def test_inverse_restores_nans(input_imputer, batch_with_nans):
    out = input_imputer.transform(batch_with_nans)
    # training-output width (drops forcing z -> 4 vars: x,y,q,other)
    y = out[..., np.asarray([0, 1, 3, 4])]
    restored = input_imputer.inverse_transform(y)
    assert jnp.isnan(restored[0, 0, 0, 0])  # x at grid 0
    assert jnp.isnan(restored[0, 0, 1, 1])  # y at grid 1
    assert jnp.isnan(restored[0, 0, 2, 2])  # q at grid 2
    assert not jnp.isnan(restored[0, 0, 0, 1])


def test_loss_mask(input_imputer, batch_with_nans):
    input_imputer.transform(batch_with_nans)
    mask = input_imputer.loss_mask_training
    # model output name_to_index: x,y,q,other
    n2i = input_imputer.data_indices.model.output.name_to_index
    assert mask.shape == (3, len(n2i))
    assert mask[0, n2i["x"]] == 0.0
    assert mask[1, n2i["y"]] == 0.0
    assert mask[2, n2i["q"]] == 0.0
    assert mask[0, n2i["y"]] == 1.0


def test_constant_imputer(batch_with_nans):
    _, data_indices = make_indices()
    cfg = DotDict({"default": "none", 0: ["x", "y"], 22.7: ["q"]})
    imputer = ConstantImputer(config=cfg, data_indices=data_indices, statistics=None)
    out = imputer.transform(batch_with_nans)
    assert out[0, 0, 0, 0] == 0.0
    assert out[0, 0, 1, 1] == 0.0
    assert np.isclose(out[0, 0, 2, 3], 22.7)


def test_static_mask_reused(input_imputer, batch_with_nans):
    """Static imputer: first batch's mask applies to later batches (reference
    imputer.py:121-125)."""
    input_imputer.transform(batch_with_nans)
    clean = jnp.ones_like(batch_with_nans)
    out = input_imputer.transform(clean)
    # grid 0 var x still overwritten with maximum even though not NaN
    assert out[0, 0, 0, 0] == 11.0


def test_dynamic_imputer(batch_with_nans):
    _, data_indices = make_indices()
    cfg = DotDict({"default": "none", 0: ["x", "y", "q"]})
    with pytest.warns(UserWarning):
        imputer = DynamicConstantImputer(config=cfg, data_indices=data_indices, statistics=None)
    out = imputer.transform(batch_with_nans)
    assert not jnp.isnan(out).any()
    # dynamic: clean batch stays clean
    clean = jnp.ones_like(batch_with_nans)
    out2 = imputer.transform(clean)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(clean))
    # dynamic inverse is identity
    np.testing.assert_array_equal(np.asarray(imputer.inverse_transform(out)), np.asarray(out))


def test_jit_requires_fit(input_imputer, batch_with_nans):
    import jax

    fn = jax.jit(lambda x: input_imputer.transform(x))
    with pytest.raises(RuntimeError, match="fit"):
        fn(batch_with_nans)
    input_imputer.fit(batch_with_nans)
    out = fn(batch_with_nans)
    assert not jnp.isnan(out).any()


def test_inference_width(input_imputer, batch_with_nans):
    input_imputer.fit(batch_with_nans)
    # model input width: drops diagnostic other -> 4 vars (x,y,z,q)
    x_inf = batch_with_nans[..., :4]
    out = input_imputer.transform(x_inf)
    assert not jnp.isnan(out).any()


def test_wrong_width_raises(input_imputer, batch_with_nans):
    input_imputer.fit(batch_with_nans)
    with pytest.raises(ValueError):
        input_imputer.transform(batch_with_nans[..., :3])
