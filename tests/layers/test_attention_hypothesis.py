"""Property-based MHSA tests — the reference's hypothesis pattern
(``tests/layers/test_attention.py:21-78``)."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def attention_configs(draw):
    num_heads = draw(st.sampled_from([1, 2, 4]))
    head_dim = draw(st.sampled_from([4, 8]))
    seq = draw(st.integers(min_value=4, max_value=24))
    batch = draw(st.integers(min_value=1, max_value=2))
    return num_heads, num_heads * head_dim, seq, batch


@given(cfg=attention_configs())
@settings(max_examples=10, deadline=None)
def test_attention_forward_backward_properties(cfg):
    from anemoi_models_tpu.layers import MultiHeadSelfAttention

    num_heads, embed_dim, seq, batch = cfg
    mhsa = MultiHeadSelfAttention(num_heads=num_heads, embed_dim=embed_dim, attention_impl="reference")
    x = jnp.asarray(np.random.RandomState(0).randn(batch, seq, embed_dim), jnp.float32)
    params = mhsa.init(jax.random.key(0), x)
    out = mhsa.apply(params, x)
    assert out.shape == (batch, seq, embed_dim)
    assert jnp.isfinite(out).all()

    grads = jax.grad(lambda p: jnp.mean(mhsa.apply(p, x) ** 2))(params)
    for kp, g in jax.tree_util.tree_leaves_with_path(grads):
        assert jnp.isfinite(g).all(), kp


@given(bad_heads=st.sampled_from([3, 5, 7]))
@settings(max_examples=3, deadline=None)
def test_attention_rejects_indivisible_heads(bad_heads):
    from anemoi_models_tpu.layers import MultiHeadSelfAttention

    import pytest

    mhsa = MultiHeadSelfAttention(num_heads=bad_heads, embed_dim=16, attention_impl="reference")
    x = jnp.ones((1, 4, 16))
    with pytest.raises(AssertionError):
        mhsa.init(jax.random.key(0), x)
