"""Gather microbenchmark: what limits XLA row-gather bandwidth on this chip?

The commuted dense processor layer is bound by ONE C-wide slot gather
(~58 MB out at O96; PERF.md round-3 stage split = 1.07 ms/layer ≈ 45 GB/s
effective). Candidate explanations and the experiments that split them:

- global row gather, RCM-local indices (the shipped dense path)
- global row gather, shuffled indices (locality control)
- static-slab two-level gather: per block, a *static* contiguous slice
  (start baked from the kernel plan) then a slab-local take — if XLA's
  gather is slow because of its addressing generality rather than input
  locality, this runs near HBM bandwidth and the dense path can adopt it
  without any Pallas

Run: python examples/gather_micro.py   (device backend)
Env: N (10242), C (256), CAP (8), NB (128), W (512), ITERS (16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("N", 10242))
C = int(os.environ.get("C", 256))
CAP = int(os.environ.get("CAP", 8))
NB = int(os.environ.get("NB", 128))
W = int(os.environ.get("W", 512))
ITERS = int(os.environ.get("ITERS", 16))


def timeit(fn, *args):
    # chain-subtraction timing with a true dependency chain: each iteration's
    # *input* depends on the previous output, so XLA cannot CSE the loop
    # into one op (a plain sum-of-identical-calls gets folded — measured)
    def chain(k):
        @jax.jit
        def go(x, *rest):
            acc = jnp.float32(0)
            for i in range(k):
                y = fn(x, *rest)
                s = y.astype(jnp.float32).sum()
                acc = acc + s
                x = x + (s * 1e-30).astype(x.dtype)
            return acc
        float(go(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(go(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = chain(1), chain(1 + ITERS)
    return max(tk - t1, 1e-9) / ITERS


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    rs = np.random.RandomState(0)
    nblk = -(-N // NB)
    npad = nblk * NB
    rows = npad * CAP
    x = jnp.asarray(rs.randn(max(N, W + 8), C), jnp.bfloat16)

    # RCM-local indices: per destination block, sources within a W window
    starts = np.minimum(np.arange(nblk) * NB * N // npad, max(N - W, 0))
    starts = (starts // 8) * 8
    local = rs.randint(0, W, size=(nblk, NB * CAP))
    idx_local = jnp.asarray(local.astype(np.int32))
    idx_global = jnp.asarray((starts[:, None] + local).reshape(-1).astype(np.int32))
    idx_shuffled = jnp.asarray(rs.randint(0, N, size=rows).astype(np.int32))

    out_mb = rows * C * 2 / 1e6
    print(f"gather: {rows} rows x {C} ch bf16 -> {out_mb:.1f} MB out", flush=True)

    t = timeit(lambda x, i: jnp.take(x, i, axis=0), x, idx_global)
    print(f"global take, RCM-local idx   {t * 1e6:8.0f} us  ({out_mb / t / 1e3:6.1f} GB/s eff)", flush=True)

    t = timeit(lambda x, i: jnp.take(x, i, axis=0), x, idx_shuffled)
    print(f"global take, shuffled idx    {t * 1e6:8.0f} us  ({out_mb / t / 1e3:6.1f} GB/s eff)", flush=True)

    starts_t = tuple(int(s) for s in starts)

    def blocked(x, il):
        slabs = jnp.stack([
            jax.lax.dynamic_slice_in_dim(x, s, W) for s in starts_t
        ])  # (nblk, W, C) — static starts: contiguous copies, no gather
        return jnp.take_along_axis(slabs, il[..., None], axis=1)

    t = timeit(blocked, x, idx_local)
    print(f"static slab + local take     {t * 1e6:8.0f} us  ({out_mb / t / 1e3:6.1f} GB/s eff)", flush=True)

    # one-hot matmul gather in pure XLA (materializes the one-hot: bytes
    # usually lose, FLOPs ride the MXU — measured for completeness)
    def onehot(x, il):
        slabs = jnp.stack([
            jax.lax.dynamic_slice_in_dim(x, s, W) for s in starts_t
        ])
        oh = (il[..., None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)).astype(x.dtype)
        return jnp.einsum("brw,bwc->brc", oh, slabs)

    t = timeit(onehot, x, idx_local.reshape(nblk, NB * CAP))
    print(f"slab one-hot matmul (XLA)    {t * 1e6:8.0f} us  ({out_mb / t / 1e3:6.1f} GB/s eff)", flush=True)


if __name__ == "__main__":
    main()
