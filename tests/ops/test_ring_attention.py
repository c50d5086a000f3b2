"""Halo-window sequence-parallel attention vs global windowed attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.ops.attention import dot_product_attention
from anemoi_models_tpu.ops.ring_attention import halo_window_attention
from anemoi_models_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def qkv(n=128, d=8, h=2, b=1, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(jnp.asarray(rng.randn(b, h, n, d), jnp.float32) for _ in range(3))


@pytest.mark.parametrize("window", [4, 16])
def test_halo_window_matches_global(window):
    q, k, v = qkv(n=128)
    ref = dot_product_attention(q, k, v, window_size=window, impl="reference")
    mesh = make_mesh(data=1, model=8)
    out = jax.jit(
        lambda q, k, v: halo_window_attention(q, k, v, window_size=window, mesh=mesh)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_halo_window_grad_matches_global():
    q, k, v = qkv(n=64, d=4)
    window = 8
    mesh = make_mesh(data=1, model=8)

    g_halo = jax.jit(
        jax.grad(
            lambda q: jnp.sum(
                halo_window_attention(q, k, v, window_size=window, mesh=mesh) ** 2
            )
        )
    )(q)
    g_ref = jax.grad(
        lambda q: jnp.sum(dot_product_attention(q, k, v, window_size=window, impl="reference") ** 2)
    )(q)
    np.testing.assert_allclose(np.asarray(g_halo), np.asarray(g_ref), atol=1e-4, rtol=1e-3)


def test_window_too_large_rejected():
    q, k, v = qkv(n=64)
    mesh = make_mesh(data=1, model=8)
    with pytest.raises(AssertionError):
        halo_window_attention(q, k, v, window_size=32, mesh=mesh)
