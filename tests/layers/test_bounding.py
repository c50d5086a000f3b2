import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.layers.bounding import (
    FractionBounding,
    HardtanhBounding,
    LeakyReluBounding,
    ReluBounding,
)

NAME_TO_INDEX = {"var1": 0, "var2": 1, "total": 2}


@pytest.fixture
def x():
    return jnp.array([[-1.0, 2.0, 3.0], [4.0, -5.0, 6.0], [0.5, 0.5, -1.0]])


def test_relu_bounding(x):
    out = ReluBounding(variables=["var1"], name_to_index=NAME_TO_INDEX)(x)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), [0.0, 4.0, 0.5])
    np.testing.assert_array_equal(np.asarray(out[:, 1]), np.asarray(x[:, 1]))


def test_leaky_relu_bounding(x):
    out = LeakyReluBounding(variables=["var1"], name_to_index=NAME_TO_INDEX)(x)
    np.testing.assert_allclose(np.asarray(out[:, 0]), [-0.01, 4.0, 0.5], atol=1e-6)


def test_hardtanh_bounding(x):
    out = HardtanhBounding(variables=["var1", "var2"], name_to_index=NAME_TO_INDEX, min_val=0.0, max_val=1.0)(x)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), [0.0, 1.0, 0.5])
    np.testing.assert_array_equal(np.asarray(out[:, 1]), [1.0, 0.0, 0.5])


def test_fraction_bounding(x):
    out = FractionBounding(
        variables=["var1"], name_to_index=NAME_TO_INDEX, min_val=0.0, max_val=1.0, total_var="total"
    )(x)
    # var1 clamped to [0,1] then multiplied by total
    np.testing.assert_allclose(np.asarray(out[:, 0]), [0.0, 6.0, -0.5], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out[:, 2]), np.asarray(x[:, 2]))


def test_bounding_order_matters(x):
    """Boundings applied in config order (reference enc_proc_dec.py:229-231)."""
    relu = ReluBounding(variables=["total"], name_to_index=NAME_TO_INDEX)
    frac = FractionBounding(
        variables=["var1"], name_to_index=NAME_TO_INDEX, min_val=0.0, max_val=1.0, total_var="total"
    )
    a = frac(relu(x))
    b = relu(frac(x))
    assert not np.allclose(np.asarray(a), np.asarray(b))
