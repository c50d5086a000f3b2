"""Pallas TPU flash attention with sliding-window (band) masking.

Replaces the reference's flash-attn CUDA kernel (``layers/attention.py:19-26``,
window support at ``attention.py:55,96``). Blockwise online-softmax forward in
a Pallas kernel (bf16-friendly inputs, fp32 accumulation in VMEM scratch);
the backward pass recomputes through :func:`blockwise_attention` — a
blockwise jnp twin with O(N·w) live memory — via ``jax.custom_vjp``, so
training never materializes the N×N score matrix either.

Shapes: q, k, v are (batch, heads, seq, head_dim); ``window_size`` is the
half-width w — query i attends keys j with |i - j| <= w.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "blockwise_attention"]

_NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, blk: int, n: int, window: Optional[int],
    causal: bool, nj: int, wblk: int, nb: int, scale: float
):
    i = pl.program_id(1)  # q-block index
    j = pl.program_id(2)  # k-step within this q-block's window

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # virtual k-block index; the BlockSpec index_map clamps it into range, so
    # out-of-range steps fetch a wrong block but are fully masked below.
    if window is None:
        kb = j
    else:
        kb = i - wblk + j

    # steps whose whole k-block is out of range (window steps hanging off the
    # sequence ends) contribute nothing: skip their MXU work entirely (the
    # clamped prefetch still happens — DMA is hidden behind live steps)
    @pl.when((kb >= 0) & (kb < nb))
    def _():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (blk, blk)

        qpos = i * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
        kpos = kb * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
        mask = (kpos < n) & (qpos < n)
        if window is not None:
            mask &= jnp.abs(qpos - kpos) <= window
        if causal:
            mask &= qpos >= kpos
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[:, :1]  # (blk, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        corr = jnp.exp(m_prev - m_new)  # (blk, 1)
        p = jnp.exp(s - m_new)  # (blk, blk) fp32
        l_scr[:, :1] = l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_scr[:, :1] = m_new

    @pl.when(j == nj - 1)
    def _():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window_size: Optional[int],
    is_causal: bool,
    block_size: int,
) -> jnp.ndarray:
    b, h, n, d = q.shape
    blk = min(block_size, _cdiv(n, 8) * 8)
    npad = _cdiv(n, blk) * blk
    nb = npad // blk

    def prep(t):
        t = t.reshape(b * h, n, d)
        if npad != n:
            t = jnp.pad(t, ((0, 0), (0, npad - n), (0, 0)))
        return t

    qf, kf, vf = prep(q), prep(k), prep(v)

    if window_size is None:
        nj, wblk = nb, 0

        def k_index(bh, i, j):
            return (bh, j, 0)

    else:
        wblk = _cdiv(window_size, blk)
        nj = 2 * wblk + 1

        def k_index(bh, i, j):
            return (bh, jnp.clip(i - wblk + j, 0, nb - 1), 0)

    scale = float(1.0 / (d**0.5))
    kernel = functools.partial(
        _flash_kernel,
        blk=blk,
        n=n,
        window=window_size,
        causal=is_causal,
        nj=nj,
        wblk=wblk,
        nb=nb,
        scale=scale,
    )

    out = pl.pallas_call(
        kernel,
        grid=(b * h, nb, nj),
        in_specs=[
            pl.BlockSpec((1, blk, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, blk, d), k_index),
            pl.BlockSpec((1, blk, d), k_index),
        ],
        out_specs=pl.BlockSpec((1, blk, d), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, npad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk, 128), jnp.float32),
            pltpu.VMEM((blk, 128), jnp.float32),
            pltpu.VMEM((blk, d), jnp.float32),
        ],
    )(qf, kf, vf)
    return out[:, :n].reshape(b, h, n, d)


# ---------------------------------------------------------------------------
# Blockwise jnp twin (CPU path + memory-efficient backward)
# ---------------------------------------------------------------------------


def blockwise_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    window_size: Optional[int] = None,
    is_causal: bool = False,
    block_size: int = 512,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Windowed attention over q-blocks with O(N·(blk+2w)) live memory.

    Pure jnp (differentiable, runs on any backend); numerically matches the
    Pallas kernel (fp32 softmax accumulation). Optional attention-weight
    dropout is exact per q-block (each block sees its full key window, so
    dropping normalized probabilities needs no cross-block correction).
    """
    b, h, n, d = q.shape
    blk = min(block_size, n)
    npad = _cdiv(n, blk) * blk
    nb = npad // blk
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, npad - n), (0, 0)))
    scale = 1.0 / (d**0.5)

    if window_size is None:
        kwidth = n
    else:
        kwidth = min(blk + 2 * window_size, n)

    def one_block(i):
        qs = jax.lax.dynamic_slice(qp, (0, 0, i * blk, 0), (b, h, blk, d))
        if window_size is None:
            ks, vs, kstart = k, v, 0
        else:
            kstart = jnp.clip(i * blk - window_size, 0, n - kwidth)
            ks = jax.lax.dynamic_slice(k, (0, 0, kstart, 0), (b, h, kwidth, d))
            vs = jax.lax.dynamic_slice(v, (0, 0, kstart, 0), (b, h, kwidth, d))
        s = jnp.einsum("bhqd,bhkd->bhqk", qs, ks, preferred_element_type=jnp.float32) * scale
        qpos = i * blk + jnp.arange(blk)[:, None]
        kpos = kstart + jnp.arange(kwidth)[None, :]
        mask = (qpos < n) & (kpos < n)
        if window_size is not None:
            mask &= jnp.abs(qpos - kpos) <= window_size
        if is_causal:
            mask &= qpos >= kpos
        s = jnp.where(mask, s, _NEG_INF)
        w = jax.nn.softmax(s, axis=-1)
        if dropout_rate > 0.0:
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, i), 1.0 - dropout_rate, w.shape
            )
            w = jnp.where(keep, w / (1.0 - dropout_rate), 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), vs)

    if nb <= 64:
        # unrolled: avoids lax.scan, which some runtimes execute poorly
        blocks = jnp.stack([one_block(i) for i in range(nb)])
    else:
        blocks = jax.lax.map(one_block, jnp.arange(nb))
    out = jnp.moveaxis(blocks, 0, 2).reshape(b, h, npad, d)
    return out[:, :, :n]


# ---------------------------------------------------------------------------
# custom_vjp wiring
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window_size: Optional[int] = None,
    is_causal: bool = False,
    block_size: int = 128,
) -> jnp.ndarray:
    return _flash_forward(q, k, v, window_size, is_causal, block_size)


def _fwd(q, k, v, window_size, is_causal, block_size):
    return _flash_forward(q, k, v, window_size, is_causal, block_size), (q, k, v)


def _bwd(window_size, is_causal, block_size, residuals, g):
    q, k, v = residuals
    _, vjp_fn = jax.vjp(
        lambda q_, k_, v_: blockwise_attention(
            q_, k_, v_, window_size=window_size, is_causal=is_causal
        ),
        q,
        k,
        v,
    )
    return vjp_fn(g)


flash_attention.defvjp(_fwd, _bwd)
