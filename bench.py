"""Benchmark: grid-points/s/chip for the flagship GraphTransformer enc-proc-dec.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no performance numbers (BASELINE.md), so
``vs_baseline`` is reported against the north-star placeholder target of
1e6 data-grid-points/s/chip for an O96-class model (BASELINE.json).

Config: O96-class — data grid 96x192 lat/lon (18,432 points), icosahedral
hidden mesh at refinement 5 (10,242 nodes), 256 channels, 8 processor layers.
Runs on whatever backend JAX selects (real TPU chip under the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

TARGET_GRID_POINTS_PER_S = 1.0e6


def main() -> None:
    import jax

    from __graft_entry__ import _build

    grid_lat = int(os.environ.get("BENCH_GRID_LAT", "96"))
    refinements = int(os.environ.get("BENCH_REFINEMENTS", "5"))
    channels = int(os.environ.get("BENCH_CHANNELS", "256"))
    layers = int(os.environ.get("BENCH_LAYERS", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    model, x, _ = _build(
        grid_lat=grid_lat,
        mesh_refinements=refinements,
        num_channels=channels,
        num_layers=layers,
        dtype=dtype,
    )
    n_grid = x.shape[3]

    params = jax.jit(model.init)(jax.random.key(0), x)

    @jax.jit
    def step(params, x):
        # one forward; output folded back into the input through a
        # numerically negligible (but not constant-foldable) term so
        # successive steps form a true dependency chain — async runtimes
        # cannot overlap or elide them
        out = model.apply(params, x)
        return x + (out.mean() * 1e-30).astype(x.dtype)

    x1 = step(params, x)
    float(x1.mean())  # compile + warmup, forced to completion

    t0 = time.perf_counter()
    for _ in range(iters):
        x1 = step(params, x1)
    float(x1.mean())  # forces the whole chain
    dt = time.perf_counter() - t0

    gps = n_grid * iters / dt
    print(
        json.dumps(
            {
                "metric": f"enc-proc-dec fwd grid-points/s/chip (O96-class: grid={n_grid}, "
                f"mesh_r{refinements}, C={channels}, L={layers}, {dtype})",
                "value": round(gps, 1),
                "unit": "grid-points/s",
                "vs_baseline": round(gps / TARGET_GRID_POINTS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
