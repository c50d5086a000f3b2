"""Same-session A/B: Pallas flash kernel vs XLA blockwise attention.

Measures the attention op alone at the flagship transformer-flavor shape
(O96 mesh: 10,242 tokens, 4 heads, head_dim 64, window 512, bf16) across
Pallas block sizes, plus the XLA blockwise twin — the verdict on whether the
hand-written kernel earns its place on the production path.

Run: python examples/flash_ab.py   (device backend)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from anemoi_models_tpu.ops.pallas.flash_attention import (
    blockwise_attention,
    flash_attention,
)

N = int(os.environ.get("FLASH_N", "10242"))
H = int(os.environ.get("FLASH_H", "4"))
D = int(os.environ.get("FLASH_D", "64"))
W = int(os.environ.get("FLASH_W", "512"))
ITERS = int(os.environ.get("FLASH_ITERS", "32"))


def timeit(fn, *args):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best, out


def main():
    rs = np.random.RandomState(0)
    q, k, v = (
        jnp.asarray(rs.randn(1, H, N, D), jnp.bfloat16) for _ in range(3)
    )
    t_ref, o_ref = timeit(
        lambda q, k, v: blockwise_attention(q, k, v, window_size=W), q, k, v
    )
    print(f"XLA blockwise             {t_ref * 1e6:8.0f} us", flush=True)
    for blk in (128, 256, 512):
        t, o = timeit(
            lambda q, k, v, blk=blk: flash_attention(q, k, v, W, False, blk), q, k, v
        )
        err = float(jnp.abs(o.astype(jnp.float32) - o_ref.astype(jnp.float32)).max())
        print(
            f"pallas flash blk={blk:<4}    {t * 1e6:8.0f} us  "
            f"({t_ref / t:4.2f}x vs blockwise, maxdiff {err:.2e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
