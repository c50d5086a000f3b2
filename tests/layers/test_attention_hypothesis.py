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


def test_attention_weight_dropout():
    """dropout_p acts on the attention weights at train time (reference
    ``attention.py:60,99-105``): stochastic under rng, identity when
    deterministic, and zero-rate equals the no-dropout path exactly."""
    from anemoi_models_tpu.layers import MultiHeadSelfAttention

    mhsa = MultiHeadSelfAttention(num_heads=2, embed_dim=16, dropout_p=0.3, attention_impl="reference")
    x = jnp.asarray(np.random.RandomState(3).randn(2, 12, 16), jnp.float32)
    params = mhsa.init(jax.random.key(0), x)

    det = mhsa.apply(params, x, deterministic=True)
    base = MultiHeadSelfAttention(
        num_heads=2, embed_dim=16, dropout_p=0.0, attention_impl="reference"
    ).apply(params, x, deterministic=False)
    np.testing.assert_allclose(np.asarray(det), np.asarray(base), rtol=1e-6)

    d1 = mhsa.apply(params, x, deterministic=False, rngs={"dropout": jax.random.key(1)})
    d2 = mhsa.apply(params, x, deterministic=False, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(d1), np.asarray(d2))
    assert not np.allclose(np.asarray(d1), np.asarray(det))
    assert jnp.isfinite(d1).all() and jnp.isfinite(d2).all()


def test_attention_weight_dropout_chunked_matches_semantics():
    """The chunked (blockwise) path supports weight dropout too and keeps
    row-stochastic scaling: with rate→0 it converges to the exact output."""
    from anemoi_models_tpu.ops.attention import dot_product_attention

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 2, 16, 8), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 16, 8), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 16, 8), jnp.float32)
    exact = dot_product_attention(q, k, v, impl="chunked")
    tiny = dot_product_attention(
        q, k, v, impl="chunked", dropout_rate=1e-7, dropout_rng=jax.random.key(0)
    )
    np.testing.assert_allclose(np.asarray(tiny), np.asarray(exact), atol=1e-5)
    dropped = dot_product_attention(
        q, k, v, impl="chunked", dropout_rate=0.5, dropout_rng=jax.random.key(0)
    )
    assert not np.allclose(np.asarray(dropped), np.asarray(exact))
