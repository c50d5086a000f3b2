import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.data_indices import IndexCollection
from anemoi_models_tpu.preprocessing.normalizer import InputNormalizer
from anemoi_models_tpu.utils import DotDict


@pytest.fixture
def input_normalizer():
    config = DotDict(
        {
            "data": {
                "normalizer": {
                    "default": "mean-std",
                    "min-max": ["x"],
                    "max": ["y"],
                    "none": ["z"],
                    "mean-std": ["q"],
                    "std": ["r"],
                },
                "forcing": ["z", "q"],
                "diagnostic": ["other"],
            },
        }
    )
    statistics = {
        "mean": np.array([1.0, 2.0, 3.0, 4.5, 3.0, 1.0]),
        "stdev": np.array([0.5, 0.5, 0.5, 1.0, 2.0, 1.0]),
        "minimum": np.array([1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
        "maximum": np.array([11.0, 10.0, 10.0, 10.0, 10.0, 10.0]),
    }
    name_to_index = {"x": 0, "y": 1, "z": 2, "q": 3, "r": 4, "other": 5}
    data_indices = IndexCollection(config=config, name_to_index=name_to_index)
    return InputNormalizer(config=config.data.normalizer, data_indices=data_indices, statistics=statistics)


def test_transform_full_array(input_normalizer):
    x = jnp.array([[1.0, 2.0, 3.0, 4.0, 5.0, 6.0], [6.0, 7.0, 8.0, 9.0, 10.0, 11.0]])
    expected = jnp.array([[0.0, 0.2, 3.0, -0.5, 2.5, 5.0], [0.5, 0.7, 8.0, 4.5, 5.0, 10.0]])
    out = input_normalizer.transform(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5)


def test_transform_inference_width(input_normalizer):
    # inference input drops the diagnostic "other" (5 -> width 5)
    x = jnp.array([[1.0, 2.0, 3.0, 4.0, 5.0], [6.0, 7.0, 8.0, 9.0, 10.0]])
    out = input_normalizer.transform(x)
    expected = jnp.array([[0.0, 0.2, 3.0, -0.5, 2.5], [0.5, 0.7, 8.0, 4.5, 5.0]])
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5)


def test_inverse_roundtrip(input_normalizer):
    x = jnp.array([[1.0, 2.0, 3.0, 4.0, 5.0, 6.0], [6.0, 7.0, 8.0, 9.0, 10.0, 11.0]])
    out = input_normalizer.inverse_transform(input_normalizer.transform(x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5)


def test_inverse_output_width(input_normalizer):
    # output width drops forcing z,q -> x,y,r,other (width 4)
    y = jnp.array([[0.0, 0.2, 2.5, 5.0]])
    out = input_normalizer.inverse_transform(y)
    np.testing.assert_allclose(np.asarray(out), np.array([[1.0, 2.0, 5.0, 6.0]]), rtol=1e-5)


def test_statistics_remap():
    config = DotDict(
        {
            "data": {
                "normalizer": {"default": "mean-std", "remap": {"x": "y"}},
                "forcing": [],
                "diagnostic": [],
            }
        }
    )
    statistics = {
        "mean": np.array([10.0, 0.0]),
        "stdev": np.array([5.0, 2.0]),
        "minimum": np.array([0.0, -1.0]),
        "maximum": np.array([20.0, 1.0]),
    }
    data_indices = IndexCollection(config=config, name_to_index={"x": 0, "y": 1})
    norm = InputNormalizer(config=config.data.normalizer, data_indices=data_indices, statistics=statistics)
    # x now normalized with y's stats
    out = norm.transform(jnp.array([[2.0, 2.0]]))
    np.testing.assert_allclose(np.asarray(out), np.array([[1.0, 1.0]]), rtol=1e-5)


def test_bad_method_rejected():
    config = DotDict({"data": {"normalizer": {"default": "nope"}, "forcing": [], "diagnostic": []}})
    statistics = {k: np.ones(1) for k in ("mean", "stdev", "minimum", "maximum")}
    data_indices = IndexCollection(config=config, name_to_index={"x": 0})
    with pytest.raises(ValueError):
        InputNormalizer(config=config.data.normalizer, data_indices=data_indices, statistics=statistics)
