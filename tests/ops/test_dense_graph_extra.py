

def test_chunked_transpose_adjoint_matches(monkeypatch):
    """ANEMOI_ADJOINT_CHUNK_BYTES forces the M-axis-chunked adjoint path
    (the O1280 46-GiB-temp fix); gradients must equal the unchunked ones."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from anemoi_models_tpu.ops.dense_graph import (
        PaddedTranspose,
        padded_take,
        padded_take_rows,
        padded_transpose_sum,
    )

    rng = np.random.RandomState(0)
    rows, m, p, c = 13, 7, 29, 5
    tab = rng.randint(0, p, size=(rows, m)).astype(np.int32)
    mask = rng.rand(rows, m) > 0.4
    ids = rng.randint(0, rows, size=(p,)).astype(np.int32)
    x = jnp.asarray(rng.randn(rows, c), jnp.float32)
    xb = jnp.asarray(rng.randn(2, rows, c), jnp.float32)
    ct = jnp.asarray(rng.randn(p, c), jnp.float32)

    def grad_of(fn, x):
        return jax.grad(lambda x: (fn(x) * 1.7).sum())(x)

    ref_rows = grad_of(lambda x: padded_take_rows(x, jnp.asarray(ids), jnp.asarray(tab), jnp.asarray(mask)), xb)
    ref_take = grad_of(lambda x: padded_take(x, jnp.asarray(ids), jnp.asarray(tab), jnp.asarray(mask)), x)
    ref_sum = padded_transpose_sum(ct, PaddedTranspose(jnp.asarray(tab), jnp.asarray(mask)))

    monkeypatch.setenv("ANEMOI_ADJOINT_CHUNK_BYTES", "64")  # force many chunks
    got_rows = grad_of(lambda x: padded_take_rows(x, jnp.asarray(ids), jnp.asarray(tab), jnp.asarray(mask)), xb)
    got_take = grad_of(lambda x: padded_take(x, jnp.asarray(ids), jnp.asarray(tab), jnp.asarray(mask)), x)
    got_sum = padded_transpose_sum(ct, PaddedTranspose(jnp.asarray(tab), jnp.asarray(mask)))

    np.testing.assert_allclose(np.asarray(got_rows), np.asarray(ref_rows), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_take), np.asarray(ref_take), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_sum), np.asarray(ref_sum), atol=1e-6)
