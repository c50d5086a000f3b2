import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.parallel import make_mesh, use_mesh
from anemoi_models_tpu.parallel.primitives import (
    change_channels_in_shape,
    gather_tensor,
    get_shape_shards,
    reduce_shard_tensor,
    shard_tensor,
    sync_tensor,
)


def test_identity_without_mesh():
    x = jnp.ones((6, 4))
    for fn in (shard_tensor, gather_tensor, sync_tensor, reduce_shard_tensor):
        assert fn(x, 0) is x


def test_get_shape_shards_tensor_split_semantics():
    x = jnp.ones((10, 3))
    shapes = get_shape_shards(x, 0, 4)
    # torch.tensor_split semantics: 3,3,2,2
    assert [s[0] for s in shapes] == [3, 3, 2, 2]
    assert all(s[1] == 3 for s in shapes)


def test_change_channels_in_shape():
    shapes = [(3, 3), (2, 3)]
    assert change_channels_in_shape(shapes, 7) == [(3, 7), (2, 7)]


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_shard_gather_roundtrip_under_jit():
    mesh = make_mesh(data=1, model=8)
    x = jnp.arange(64, dtype=jnp.float32).reshape(16, 4)

    with use_mesh(mesh):

        @jax.jit
        def f(x):
            y = shard_tensor(x, 0)
            y = y * 2.0
            return gather_tensor(y, 0)

        out = f(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x) * 2)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_grad_through_constraints():
    mesh = make_mesh(data=1, model=8)
    x = jnp.ones((16, 4))
    with use_mesh(mesh):
        g = jax.jit(jax.grad(lambda x: jnp.sum(sync_tensor(shard_tensor(x, 0), 0) ** 2)))(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.ones((16, 4)))
