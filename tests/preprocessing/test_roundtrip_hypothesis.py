"""Property-based pre/post-processing round trips (hypothesis) — extends the
reference's parametrized round-trip suite with random widths/values."""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from anemoi_models_tpu.data_indices import IndexCollection
from anemoi_models_tpu.preprocessing.normalizer import InputNormalizer
from anemoi_models_tpu.utils import DotDict


@st.composite
def norm_cases(draw):
    n_vars = draw(st.integers(min_value=2, max_value=8))
    n_forcing = draw(st.integers(min_value=0, max_value=max(0, n_vars - 2)))
    n_diag = draw(st.integers(min_value=0, max_value=max(0, n_vars - n_forcing - 1)))
    method = draw(st.sampled_from(["mean-std", "std", "min-max", "max", "none"]))
    seed = draw(st.integers(min_value=0, max_value=1000))
    return n_vars, n_forcing, n_diag, method, seed


@given(case=norm_cases())
@settings(max_examples=20, deadline=None)
def test_normalizer_roundtrip_property(case):
    n_vars, n_forcing, n_diag, method, seed = case
    names = [f"v{i}" for i in range(n_vars)]
    rng = np.random.RandomState(seed)
    cfg = DotDict(
        {
            "data": {
                "forcing": names[:n_forcing],
                "diagnostic": names[n_forcing : n_forcing + n_diag],
            }
        }
    )
    di = IndexCollection(cfg, {n: i for i, n in enumerate(names)})
    stats = {
        "mean": rng.rand(n_vars) * 10 - 5,
        "stdev": rng.rand(n_vars) + 0.5,
        "minimum": -(rng.rand(n_vars) + 1.0),
        "maximum": rng.rand(n_vars) + 1.0,
    }
    norm = InputNormalizer(DotDict({"default": method}), di, stats)
    x = jnp.asarray(rng.randn(3, 7, n_vars), jnp.float32)
    back = norm.inverse_transform(norm.transform(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-3, rtol=1e-3)
