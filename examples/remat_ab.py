"""Same-session A/B: remat policy for the train step, post-commute.

Round 2 measured remat="full" beating "save_dots" (262k vs 222k pts/s) —
but that was the pre-commute dataflow, whose backward recompute was
gather-dominated (cheap bytes). The commuted projections moved work onto
the MXU; recomputing matmuls is now the expensive part, so the trade may
have flipped. Measures the O96 dense train step under each policy in one
process.

Run: python examples/remat_ab.py    (device backend)
Env: POLICIES ("full,save_dots,none"), AB_ITERS (4).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _build

ITERS = int(os.environ.get("AB_ITERS", "4"))


def main() -> None:
    import optax

    from anemoi_models_tpu.training import make_train_step

    print("devices:", jax.devices(), flush=True)
    for policy in os.environ.get("POLICIES", "full,save_dots,none").split(","):
        model, x, n_out = _build(
            grid_lat=96, mesh_refinements=5, num_channels=256, num_layers=8,
            dtype="bfloat16", grid="octahedral", remat_policy=policy,
        )
        n_grid = model.graph_data["data"].num_nodes
        init_state, train_step = make_train_step(model, optax.adam(1e-3))
        y = jnp.zeros((x.shape[0], x.shape[2], x.shape[3], n_out), jnp.bfloat16)
        state = jax.jit(init_state)(jax.random.key(0), x)
        step = jax.jit(train_step, donate_argnums=0)
        try:
            state, loss = step(state, x, y)
            float(loss)  # host fetch — block_until_ready does not imply
            # completed execution on the tunneled runtime (PERF.md)
        except Exception as exc:  # e.g. "none" can exceed HBM
            print(f"remat={policy:<10} FAILED ({type(exc).__name__})", flush=True)
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                state, loss = step(state, x, y)
            float(loss)  # forces the whole dependent chain to completion
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(
            f"remat={policy:<10} train {best * 1e3:7.2f} ms  "
            f"({n_grid / best / 1e3:,.0f}k pts/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
