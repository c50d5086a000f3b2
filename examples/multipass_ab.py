"""Same-session A/B: multi-window (multi-pass) kernel plans vs single-window.

The host-side sweep (examples/multipass_coverage.py) shows chained passes
restoring in-kernel coverage at high refinement (r6: 512×2 at 89.6% beats
any single window on modeled cost; r8: 512×4 → 90% vs 42% at 1024×1). This
measures whether the chip agrees — the κ=936 outlier weight in the cost
model was fitted at r5 and its extrapolation is the known weak point.

Runs the full GraphTransformer enc-proc-dec forward on the kernel path with
ANEMOI_PLAN_PASSES ∈ PASSES (default "1,2,3") at O96/r5 and (optionally,
SCALES="96:5,320:6") O320/r6, all in one process so session variance
cancels. Also prints the dense-path number as the session anchor.

Run: python examples/multipass_ab.py   (device backend)
Env: PASSES, SCALES, AB_ITERS (4), TRAIN=1 to add train-step timings.
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


def bench_variant(label: str, grid_lat: int, refinements: int, passes: int,
                  graph_impl, train: bool):
    os.environ["ANEMOI_PLAN_PASSES"] = str(passes)
    model, x, n_out = _build(
        grid_lat=grid_lat, mesh_refinements=refinements, num_channels=256,
        num_layers=8, dtype="bfloat16", grid="octahedral",
        graph_impl=graph_impl,
    )
    n_grid = model.graph_data["data"].num_nodes
    params = jax.jit(model.init)(jax.random.key(0), x)
    t_fwd = time_chain(lambda p, xx: model.apply(p, xx), params, x)
    print(
        f"{label:<34} forward {t_fwd * 1e3:7.2f} ms  "
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
            f"{label:<34} train   {best * 1e3:7.2f} ms  "
            f"({n_grid / best / 1e3:,.0f}k pts/s)",
            flush=True,
        )


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    passes_list = [int(p) for p in os.environ.get("PASSES", "1,2,3").split(",")]
    scales = [
        tuple(int(v) for v in s.split(":"))
        for s in os.environ.get("SCALES", "96:5").split(",")
    ]
    train = os.environ.get("TRAIN", "0") == "1"
    for grid_lat, refinements in scales:
        bench_variant(
            f"O{grid_lat}/r{refinements} dense (anchor)", grid_lat, refinements,
            1, None, train,
        )
        for p in passes_list:
            bench_variant(
                f"O{grid_lat}/r{refinements} pallas passes={p}", grid_lat,
                refinements, p, "pallas", train,
            )


if __name__ == "__main__":
    main()
