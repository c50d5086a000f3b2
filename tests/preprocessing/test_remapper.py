import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.data_indices import IndexCollection
from anemoi_models_tpu.preprocessing import Processors
from anemoi_models_tpu.preprocessing.monomapper import Monomapper
from anemoi_models_tpu.preprocessing.multimapper import Multimapper
from anemoi_models_tpu.preprocessing.remapper import Remapper
from anemoi_models_tpu.utils import DotDict


@pytest.fixture
def multimapper_setup():
    config = DotDict(
        {
            "data": {
                "remapper": {"cos_sin": {"d": ["cos_d", "sin_d"]}},
                "forcing": [],
                "diagnostic": [],
                "remapped": {"d": ["cos_d", "sin_d"]},
            }
        }
    )
    name_to_index = {"x": 0, "y": 1, "d": 2}
    data_indices = IndexCollection(config=config, name_to_index=name_to_index)
    return config, data_indices


def test_remapper_dispatch(multimapper_setup):
    config, data_indices = multimapper_setup
    remapper = Remapper(config=config.data.remapper, data_indices=data_indices)
    assert isinstance(remapper, Multimapper)

    mono_cfg = DotDict({"log1p": ["x"]})
    cfg2 = DotDict({"data": {"forcing": [], "diagnostic": []}})
    di2 = IndexCollection(config=cfg2, name_to_index={"x": 0, "y": 1})
    mono = Remapper(config=mono_cfg, data_indices=di2)
    assert isinstance(mono, Monomapper)


def test_multimapper_roundtrip(multimapper_setup):
    config, data_indices = multimapper_setup
    remapper = Multimapper(config=config.data.remapper, data_indices=data_indices)
    x = jnp.array([[1.0, 2.0, 30.0], [4.0, 5.0, 270.0]])
    transformed = remapper.transform(x)
    # width grows by 1: d dropped, cos_d+sin_d appended
    assert transformed.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(transformed[:, 2]), np.cos(np.deg2rad([30.0, 270.0])), atol=1e-6)
    np.testing.assert_allclose(np.asarray(transformed[:, 3]), np.sin(np.deg2rad([30.0, 270.0])), atol=1e-6)
    restored = remapper.inverse_transform(transformed)
    np.testing.assert_allclose(np.asarray(restored), np.asarray(x), atol=1e-4)


def test_monomapper_roundtrip():
    cfg = DotDict({"data": {"forcing": [], "diagnostic": []}})
    di = IndexCollection(config=cfg, name_to_index={"x": 0, "y": 1})
    mono = Monomapper(config=DotDict({"log1p": ["x"], "sqrt": ["y"]}), data_indices=di)
    x = jnp.array([[3.0, 4.0], [0.0, 9.0]])
    t = mono.transform(x)
    np.testing.assert_allclose(np.asarray(t[:, 0]), np.log1p([3.0, 0.0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t[:, 1]), [2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(mono.inverse_transform(t)), np.asarray(x), atol=1e-5)


def test_mixed_methods_rejected(multimapper_setup):
    _, data_indices = multimapper_setup
    with pytest.raises(NotImplementedError):
        Remapper(config=DotDict({"cos_sin": {"d": ["cos_d", "sin_d"]}, "log1p": ["x"]}), data_indices=data_indices)


def test_loss_mask_remap(multimapper_setup):
    config, data_indices = multimapper_setup
    remapper = Multimapper(config=config.data.remapper, data_indices=data_indices)
    mask = jnp.ones((5, 3)).at[:, 2].set(0.0)  # d masked out
    remapped = remapper.transform_loss_mask(mask)
    assert remapped.shape == (5, 4)
    np.testing.assert_array_equal(np.asarray(remapped[:, 2]), 0.0)
    np.testing.assert_array_equal(np.asarray(remapped[:, 3]), 0.0)


def test_pipeline_order_and_inverse(multimapper_setup):
    """Processors applies config order forward, reversed for inverse."""
    config, data_indices = multimapper_setup
    from anemoi_models_tpu.preprocessing.normalizer import InputNormalizer

    statistics = {
        "mean": np.array([5.0, 0.0, 0.0]),
        "stdev": np.array([2.0, 1.0, 1.0]),
        "minimum": np.zeros(3),
        "maximum": np.ones(3),
    }
    norm = InputNormalizer(
        config=DotDict({"default": "none", "mean-std": ["x"]}),
        data_indices=data_indices,
        statistics=statistics,
    )
    remap = Multimapper(config=config.data.remapper, data_indices=data_indices)
    pre = Processors([["normalizer", norm], ["remapper", remap]])
    post = Processors([["normalizer", norm], ["remapper", remap]], inverse=True)

    x = jnp.array([[7.0, 2.0, 90.0]])
    y = pre(x)
    assert y.shape == (1, 4)
    assert y[0, 0] == 1.0  # (7-5)/2
    back = post(y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)
