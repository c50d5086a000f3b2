"""Re-fit κ (the plan-cost outlier weight) from on-chip datapoints.

The modeled plan cost is ``Σ_p rows_p·W_p + κ·E_outliers`` (slot one-hot
FLOPs plus the COO residual path). κ was originally fitted from the
round-2 O96 slab sweep alone (κ=936); round 4 measured multipass A/Bs
on-chip at r5 and r6 and the fixed-width extrapolation FAILED (passes=2
predicted to win at r6; it lost). This script turns every measured
ordering into a linear constraint on κ and reports the admissible
interval:

- r5 slab sweep (PERF.md round 2, same-session): t(384) < t(256) < t(512)
- r5 multipass A/B (round 4, on-chip): t(p1) < t(p3) < t(p2)
- r6 multipass A/B (round 4, on-chip): t(p1) < t(p2)

Geometry (slot rows × width per pass, residual outlier counts) is rebuilt
with the same planner the measurements ran under.

Run: env PYTHONPATH= JAX_PLATFORMS=cpu python examples/kappa_fit.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from anemoi_models_tpu.graphs import build_enc_proc_dec_graph, HeteroGraph
from anemoi_models_tpu.graphs.kernel_plan import (
    build_edge_kernel_plan,
    build_multi_pass_plan,
)

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")


def mesh_edges(grid_lat: int, refinements: int):
    path = os.path.join(CACHE, f"o{grid_lat}_r{refinements}.npz")
    if os.path.exists(path):
        g = HeteroGraph.load(path)
    else:
        g = build_enc_proc_dec_graph(grid_lat=grid_lat, grid="octahedral",
                                     mesh_refinements=refinements)
    es = g[("hidden", "to", "hidden")]
    return es.edge_index, g["hidden"].num_nodes


def plan_terms(plan):
    """(slot_units, outliers) of a plan or multipass chain."""
    plans = plan.plans if hasattr(plan, "plans") else (plan,)
    slot = sum(float(p.padded_dst * p.cap) * p.slab_width for p in plans)
    return slot, len(plans[-1].outlier_src)


def main() -> None:
    lo_bounds, hi_bounds = [], []  # (value, label)

    # --- r5 (O96 hidden mesh, 10,242 nodes) ---
    ei5, n5 = mesh_edges(96, 5)
    single = {
        w: build_edge_kernel_plan(ei5.astype(np.int64), n5, n5, slab_width=w,
                                  outlier_adjoints=False)
        for w in (256, 384, 512)
    }
    S = {w: plan_terms(p) for w, p in single.items()}
    print("r5 single-pass: " + "; ".join(
        f"W={w}: slot={s/1e6:.1f}M out={o}" for w, (s, o) in S.items()))
    # t(384) < t(256): κ > ΔSlot / ΔOut
    lo_bounds.append(((S[384][0] - S[256][0]) / (S[256][1] - S[384][1]), "r5 384<256"))
    hi_bounds.append(((S[512][0] - S[384][0]) / (S[384][1] - S[512][1]), "r5 384<512"))

    mp5 = {k: build_multi_pass_plan(ei5, n5, n5, passes=k) for k in (1, 2, 3)}
    M5 = {k: plan_terms(p) for k, p in mp5.items()}
    print("r5 multipass: " + "; ".join(
        f"p{k}: slot={s/1e6:.1f}M out={o}" for k, (s, o) in M5.items()))
    # t(p1) < t(p2): κ < ΔSlot / ΔOut ; t(p3) < t(p2): κ > ...
    hi_bounds.append(((M5[2][0] - M5[1][0]) / max(M5[1][1] - M5[2][1], 1), "r5 p1<p2"))
    if M5[3][1] < M5[2][1]:
        lo_bounds.append(((M5[3][0] - M5[2][0]) / (M5[2][1] - M5[3][1]), "r5 p3<p2"))
    hi_bounds.append(((M5[3][0] - M5[1][0]) / max(M5[1][1] - M5[3][1], 1), "r5 p1<p3"))

    # --- r6 (O320 hidden mesh, 40,962 nodes) ---
    ei6, n6 = mesh_edges(320, 6)
    mp6 = {k: build_multi_pass_plan(ei6, n6, n6, passes=k) for k in (1, 2)}
    M6 = {k: plan_terms(p) for k, p in mp6.items()}
    print("r6 multipass: " + "; ".join(
        f"p{k}: slot={s/1e6:.1f}M out={o}" for k, (s, o) in M6.items()))
    hi_bounds.append(((M6[2][0] - M6[1][0]) / max(M6[1][1] - M6[2][1], 1), "r6 p1<p2"))

    lo = max(lo_bounds, key=lambda t: t[0]) if lo_bounds else (0.0, "none")
    hi = min(hi_bounds, key=lambda t: t[0])
    print("\nconstraints on κ:")
    for v, lab in sorted(lo_bounds, key=lambda t: -t[0]):
        print(f"  κ > {v:8.1f}   ({lab})")
    for v, lab in sorted(hi_bounds, key=lambda t: t[0]):
        print(f"  κ < {v:8.1f}   ({lab})")
    if lo[0] < hi[0]:
        kappa = float(np.sqrt(max(lo[0], 1.0) * hi[0]))
        print(f"\nadmissible interval: ({lo[0]:.0f}, {hi[0]:.0f}); "
              f"geometric midpoint κ = {kappa:.0f}")
    else:
        print(f"\nINFEASIBLE: max lower bound {lo[0]:.0f} ({lo[1]}) >= "
              f"min upper bound {hi[0]:.0f} ({hi[1]}) — the single-κ linear "
              f"model cannot reproduce every ordering; pick κ below the "
              f"binding upper bounds (auto-pass correctness: never add a "
              f"pass that loses on-chip) and accept the sweep miss")


if __name__ == "__main__":
    main()

# Post-fit check helper: run with AUTO=1 to print the auto-pass decision at
# r5/r6 (should be 1 pass each — the on-chip-winning choice) and, with R8=1,
# the implied r8 prediction (the untested extrapolation, stated as such).
if os.environ.get("AUTO") and __name__ == "__main__":
    from anemoi_models_tpu.graphs.kernel_plan import MultiPassPlan

    for lat, refin in ((96, 5), (320, 6)) + (((1280, 8),) if os.environ.get("R8") else ()):
        ei, n = mesh_edges(lat, refin)
        plan = build_multi_pass_plan(ei, n, n, passes=-1)
        k = len(plan.plans) if isinstance(plan, MultiPassPlan) else 1
        slot, out = plan_terms(plan)
        cov = 1.0 - out / max(ei.shape[1], 1)
        print(f"auto r{refin}: {k} pass(es), slot={slot/1e6:.1f}M, "
              f"outliers={out} (in-kernel {cov:.1%})")
