"""Measure end-to-end training throughput through the full data pipeline.

Runs `train_run` (dataset -> background loader -> device prefetch -> jitted
preprocess+train step) on synthetic O96-scale data and reports steady-state
steps/s and grid-points/s. The per-segment rates train_run logs exclude the
first segment's compile time.

Run (TPU):
    python examples/train_pipeline_bench.py
Environment: STEPS (default 16), GRID_LAT (96), CHANNELS (256), LAYERS (8),
FLAVOR (graphtransformer), LOG_EVERY (4), STEPS_PER_CALL (1 — >1 batches
that many optimizer steps into one jitted scan call, amortizing the
per-dispatch host/tunnel latency that dominates single-step dispatch).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from anemoi_models_tpu.graphs import octahedral_grid_nodes
    from anemoi_models_tpu.training import train_run
    from anemoi_models_tpu.training.dataset import SyntheticSource

    print("devices:", jax.devices(), flush=True)
    grid_lat = int(os.environ.get("GRID_LAT", 96))
    coords = octahedral_grid_nodes(grid_lat).coords
    print(f"grid: {len(coords)} points", flush=True)
    source = SyntheticSource(coords, num_vars=8, num_steps=16, seed=0)

    steps = int(os.environ.get("STEPS", 16))
    t0 = time.perf_counter()
    train_run(
        source,
        forcing=("var_0",),
        flavor=os.environ.get("FLAVOR", "graphtransformer"),
        mesh_refinements=5,
        model_kwargs=dict(
            num_channels=int(os.environ.get("CHANNELS", 256)),
            num_layers=int(os.environ.get("LAYERS", 8)),
            num_heads=16,
            num_chunks=2,
            remat_policy=os.environ.get("REMAT", "full"),
        ),
        steps=steps,
        batch_size=1,
        peak_lr=3e-4,
        steps_per_call=int(os.environ.get("STEPS_PER_CALL", 1)),
        overlap_calls=bool(int(os.environ.get("OVERLAP", "1"))),
        # steps_per_call > 1 assembles that many batches per dispatch: keep
        # the loader ahead of the whole group or the device waits on ingest
        loader_depth=int(os.environ.get("LOADER_DEPTH", 4)),
        loader_workers=int(os.environ.get("LOADER_WORKERS", 1)),
        prefetch=int(os.environ.get("PREFETCH", 2)),
        seed=0,
        log_every=int(os.environ.get("LOG_EVERY", 4)),
        log=lambda s: print(s, flush=True),
    )
    wall = time.perf_counter() - t0
    print(f"total wall {wall:.1f}s for {steps} steps (incl. graph build + compile)")
    print(f"grid points per step: {len(coords)} -> multiply by the steady steps/s above")


if __name__ == "__main__":
    main()
