"""Same-session A/B: commuted-projection conv dataflow vs the round-2 default.

A = kv_src_gather="narrow": mappers gather narrow + project k/v per slot,
    processor runs the wide dataflow (the round-2 shipped default).
B = kv_src_gather="commute": one narrow gather everywhere, k/v/edge
    projections commuted onto the query/output sides (zero slot matmuls).

Both measured in one process on the flagship O96 GraphTransformer config so
session variance (PERF.md "Runtime variance") cancels. Forward + train step.

Run: python examples/commute_ab.py   (device backend)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _build

ITERS = int(os.environ.get("AB_ITERS", "4"))


def time_chain(fn, params, x, iters=ITERS, repeats=3):
    def make(k):
        @jax.jit
        def run(params, x):
            for _ in range(k):
                out = fn(params, x)
                x = x + (out.mean() * 1e-30).astype(x.dtype)
            return x

        return run

    def timed(k):
        run = make(k)
        float(run(params, x).mean())
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(params, x).mean())
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tk = timed(1 + iters)
    return max(tk - t1, 1e-9) / iters


def bench_variant(label: str, kv: str, train: bool = True, graph_impl=None):
    model, x, n_out = _build(
        grid_lat=96, mesh_refinements=5, num_channels=256, num_layers=8,
        dtype="bfloat16", grid="octahedral", kv_src_gather=kv,
        graph_impl=graph_impl,
    )
    n_grid = model.graph_data["data"].num_nodes
    params = jax.jit(model.init)(jax.random.key(0), x)
    t_fwd = time_chain(lambda p, xx: model.apply(p, xx), params, x)
    print(
        f"{label:<28} forward {t_fwd * 1e3:7.2f} ms  "
        f"({n_grid / t_fwd / 1e3:,.0f}k pts/s)",
        flush=True,
    )
    if train:
        import optax

        from anemoi_models_tpu.training import make_train_step

        init_state, train_step = make_train_step(model, optax.adam(1e-3))
        y = jnp.zeros((x.shape[0], x.shape[2], x.shape[3], n_out), jnp.bfloat16)
        state = jax.jit(init_state)(jax.random.key(0), x)
        step = jax.jit(train_step, donate_argnums=0)

        state, loss = step(state, x, y)
        float(loss)  # host fetch: block_until_ready does not imply
        # completed execution on the tunneled runtime (PERF.md)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                state, loss = step(state, x, y)
            float(loss)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(
            f"{label:<28} train   {best * 1e3:7.2f} ms  "
            f"({n_grid / best / 1e3:,.0f}k pts/s)",
            flush=True,
        )


VARIANT_SETS = {
    # round-3 A/B: narrow (round-2 default) vs commuted dense
    "r3": [
        ("A round-2 default (narrow)", "narrow", None),
        ("B commuted projections", "commute", None),
    ],
    # round-4 A/B: commuted dense vs the feats kernel (commute inside the
    # Pallas slot path: one narrow slab DMA, k/v projected in VMEM) vs the
    # round-2 k/v kernel
    "r4": [
        ("A commuted dense (default)", "commute", None),
        ("B feats kernel (commute+plan)", "commute", "pallas"),
        ("C round-2 k/v kernel (wide)", "wide", "pallas"),
    ],
}


def main():
    train = os.environ.get("AB_TRAIN", "1") == "1"
    for label, kv, gimpl in VARIANT_SETS[os.environ.get("AB_SET", "r3")]:
        bench_variant(label, kv, train=train, graph_impl=gimpl)


if __name__ == "__main__":
    main()
