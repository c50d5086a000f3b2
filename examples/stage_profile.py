"""Per-stage on-chip timing for the flagship O96 GraphTransformer model.

Times each stage standalone with the same K-chain subtraction methodology as
bench.py (PERF.md "Methodology"): encoder mapper, one processor layer stack,
decoder mapper, and the full model — so the full-model cost can be attributed
and the next optimization lever identified by measurement.

Run on the device backend:  python examples/stage_profile.py
Env: STAGE_ITERS (chain length, default 4), STAGE_CHANNELS, STAGE_LAYERS.
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

ITERS = int(os.environ.get("STAGE_ITERS", "4"))


def time_chain(fn, params, x, iters=ITERS, repeats=3):
    """Return per-call seconds via (1+k)-chain minus 1-chain subtraction."""

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
        float(run(params, x).mean())  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(params, x).mean())
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tk = timed(1 + iters)
    return max(tk - t1, 1e-9) / iters


def main():
    C = int(os.environ.get("STAGE_CHANNELS", "256"))
    L = int(os.environ.get("STAGE_LAYERS", "8"))
    impl = os.environ.get("STAGE_GRAPH_IMPL") or None

    model, x, n_out = _build(
        grid_lat=96, mesh_refinements=5, num_channels=C, num_layers=L,
        dtype="bfloat16", grid="octahedral", graph_impl=impl,
    )
    graph = model.graph_data
    n_grid = graph["data"].num_nodes
    n_mesh = graph["hidden"].num_nodes
    print(f"grid={n_grid} mesh={n_mesh} C={C} L={L} impl={impl or 'default'}",
          file=sys.stderr)

    params = jax.jit(model.init)(jax.random.key(0), x)
    t_full = time_chain(lambda p, xx: model.apply(p, xx), params, x)
    print(f"full forward: {t_full * 1e3:8.2f} ms  "
          f"({n_grid / t_full / 1e3:,.0f}k pts/s)")

    # --- standalone stages (bf16 inputs, explicit dtype) -----------------
    from anemoi_models_tpu.layers.mapper import (
        GraphTransformerBackwardMapper,
        GraphTransformerForwardMapper,
    )
    from anemoi_models_tpu.layers.processor import GraphTransformerProcessor

    dt = jnp.bfloat16
    B = 1
    x_grid = jnp.zeros((B, n_grid, C), dt)
    x_mesh = jnp.zeros((B, n_mesh, C), dt)

    # match the flagship config exactly (num_heads=4, trainable_size=4 —
    # __graft_entry__._build): standalone-vs-model attribution is only
    # meaningful when the stage configs are identical. That includes the
    # encoder's *source width*: in the model it consumes raw rows
    # (multi_step × n_vars + sin/cos coords), not C-wide embeddings, and
    # under the narrow gather the gather bytes scale with that width.
    n_in_vars = len(model.data_indices.internal_model.input)
    in_raw = int(model.model_config["training"]["multistep_input"]) * n_in_vars + 4  # + sincos(lat,lon)
    x_raw = jnp.zeros((B, n_grid, in_raw), dt)
    enc = GraphTransformerForwardMapper(
        in_channels_src=in_raw, in_channels_dst=C, hidden_dim=C, num_heads=4,
        trainable_size=4, sub_graph=graph[("data", "to", "hidden")], dtype=dt,
    )
    p_enc = jax.jit(enc.init)(jax.random.key(0), (x_raw, x_mesh))
    t_enc = time_chain(
        lambda p, xx: enc.apply(p, (xx, x_mesh))[1], p_enc, x_raw)
    print(f"encoder (data->hidden): {t_enc * 1e3:8.2f} ms")

    proc = GraphTransformerProcessor(
        num_layers=L, num_channels=C, num_chunks=2, num_heads=4,
        trainable_size=4, sub_graph=graph[("hidden", "to", "hidden")], dtype=dt,
        graph_impl=impl or "dense",
    )
    p_proc = jax.jit(proc.init)(jax.random.key(0), x_mesh)
    t_proc = time_chain(lambda p, xx: proc.apply(p, xx), p_proc, x_mesh)
    print(f"processor ({L} layers): {t_proc * 1e3:8.2f} ms "
          f"({t_proc / L * 1e3:.2f} ms/layer)")

    dec = GraphTransformerBackwardMapper(
        in_channels_src=C, in_channels_dst=C, hidden_dim=C, num_heads=4,
        trainable_size=4, out_channels_dst=n_out,
        sub_graph=graph[("hidden", "to", "data")], dtype=dt,
    )
    p_dec = jax.jit(dec.init)(jax.random.key(0), (x_mesh, x_grid))
    t_dec = time_chain(
        lambda p, xx: dec.apply(p, (xx, x_grid)), p_dec, x_mesh)
    print(f"decoder (hidden->data): {t_dec * 1e3:8.2f} ms")

    rest = t_full - t_enc - t_proc - t_dec
    print(f"unattributed (embed/residual/bounding/IO): {rest * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
