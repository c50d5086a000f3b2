"""Scaled-dot-product attention with optional sliding window.

Replaces the reference's flash-attn CUDA kernel / ATen SDPA fallback
(``layers/attention.py:19-26,92-105``). Two implementations:

- ``reference``: plain jnp einsum attention with an explicit band mask and
  fp32 softmax accumulation — correct everywhere (CPU tests), O(N²) memory.
- ``pallas``: the blockwise flash-attention TPU kernel from
  ``ops/pallas/flash_attention.py`` — O(N·w), bf16-in/fp32-accum.

``impl="auto"`` picks pallas on TPU backends, reference elsewhere.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["dot_product_attention"]


def _flash_block() -> int:
    """``ANEMOI_FLASH_BLOCK`` validated once per distinct value: the Pallas
    kernel requires a positive block size aligned to the 8-row TPU sublane
    tile, and an unchecked value fails deep inside Mosaic with an opaque
    error. Non-multiples of 8 are rounded up with a warning."""
    import os

    raw = os.environ.get("ANEMOI_FLASH_BLOCK", "128")
    cached = _flash_block.cache.get(raw)
    if cached is not None:
        return cached
    try:
        block = int(raw)
    except ValueError:
        raise ValueError(
            f"ANEMOI_FLASH_BLOCK={raw!r} is not an integer; expected a positive "
            "multiple of 8 (e.g. 128)"
        ) from None
    if block <= 0:
        raise ValueError(
            f"ANEMOI_FLASH_BLOCK={block} must be positive (a multiple of 8; default 128)"
        )
    if block % 8:
        rounded = (block + 7) // 8 * 8
        import warnings

        warnings.warn(
            f"ANEMOI_FLASH_BLOCK={block} is not a multiple of the 8-row TPU "
            f"sublane tile; rounding up to {rounded}",
            stacklevel=2,
        )
        block = rounded
    _flash_block.cache[raw] = block
    return block


_flash_block.cache = {}


def _band_mask(n_q: int, n_k: int, window: int) -> jnp.ndarray:
    """Boolean (n_q, n_k) mask, True where |i - j| <= window."""
    qi = jnp.arange(n_q)[:, None]
    kj = jnp.arange(n_k)[None, :]
    return jnp.abs(qi - kj) <= window


def _reference_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    window_size: Optional[int],
    is_causal: bool,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    head_dim = query.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=jnp.float32))
    logits = jnp.einsum("...qd,...kd->...qk", query, key, preferred_element_type=jnp.float32)
    logits = logits * scale
    n_q, n_k = logits.shape[-2], logits.shape[-1]
    neg = jnp.asarray(-1e30, dtype=logits.dtype)
    if window_size is not None:
        logits = jnp.where(_band_mask(n_q, n_k, window_size), logits, neg)
    if is_causal:
        causal = jnp.tril(jnp.ones((n_q, n_k), dtype=bool))
        logits = jnp.where(causal, logits, neg)
    weights = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0:
        # dropout on the attention *probabilities*, like the reference's
        # SDPA/flash dropout_p (``layers/attention.py:60,99-105``)
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("...qk,...kd->...qd", weights.astype(value.dtype), value)


def dot_product_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    *,
    window_size: Optional[int] = None,
    is_causal: bool = False,
    impl: str = "auto",
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Attention over (..., heads, seq, head_dim) tensors.

    ``window_size``: half-width of the sliding attention window (the
    reference passes flash-attn ``window_size=(w, w)``, i.e. each query
    attends keys within ±w positions).

    ``dropout_rate``/``dropout_rng``: attention-*weight* dropout matching the
    reference's SDPA/flash ``dropout_p``. Supported on the reference and
    chunked paths; the Pallas kernel has no in-kernel RNG yet, so with active
    dropout ``pallas``/``auto`` fall back to the chunked path (identical math,
    O(N·w) memory).
    """
    if dropout_rate > 0.0 and dropout_rng is None:
        raise ValueError("attention dropout_rate > 0 requires a dropout_rng")
    if impl == "auto":
        backend = jax.default_backend()
        if backend in ("tpu", "axon"):
            # measured on v5e (O96 transformer flavor, w=512 over 10,242
            # tokens): XLA blockwise 1.70M pts/s vs Pallas flash 1.22M —
            # XLA's fusion with the surrounding layers wins, so the
            # blockwise path is the default; impl="pallas" stays available
            impl = "chunked"
        else:
            impl = "reference"
    if impl == "pallas" and dropout_rate > 0.0:
        impl = "chunked"
    if impl == "pallas":
        from anemoi_models_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(query, key, value, window_size, is_causal, _flash_block())
    if impl == "chunked":
        from anemoi_models_tpu.ops.pallas.flash_attention import blockwise_attention

        return blockwise_attention(
            query, key, value, window_size=window_size, is_causal=is_causal,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng,
        )
    return _reference_attention(query, key, value, window_size, is_causal, dropout_rate, dropout_rng)
