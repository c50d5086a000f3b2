"""Multi-window plan coverage at scale — the r8 single-window gap, closed?

The round-2 scale audit (PERF.md "Scale audit: O1280") found single-window
slab coverage collapsing at refinement 8 (42% at 1024, 65% at 2048): the
fine level's RCM bandwidth grows ~sqrt(mesh), so one contiguous window per
destination block cannot follow. ``build_multi_pass_plan`` chains windows —
pass k planned over pass k-1's outliers — keeping per-slot one-hot FLOPs at
the (small) per-pass width. This script measures coverage and modeled cost
per (refinement, width, passes) on the true multiscale processor mesh.

Run: python examples/multipass_coverage.py            (host-side, no TPU)
Env: REFS (default "5,6,8"), WIDTHS (default "512,1024,2048"),
PASSES (default "1,2,3,4").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def mesh_edges(refinements: int):
    """Replicates build_enc_proc_dec_graph's hidden-mesh layout (RCM on the
    fine level, multiscale edges, CSR by destination)."""
    from anemoi_models_tpu.graphs.build import (
        _faces_to_bidirectional_edges,
        icosahedral_nodes,
        multiscale_edges,
        rcm_order,
        reorder_nodes,
    )

    nodes, face_levels = icosahedral_nodes(refinements)
    perm = rcm_order(_faces_to_bidirectional_edges(face_levels[-1]), nodes.num_nodes)
    nodes, old_to_new = reorder_nodes(nodes, perm)
    face_levels = [old_to_new[f] for f in face_levels]
    ei = multiscale_edges(face_levels)
    order = np.argsort(ei[1], kind="stable")
    return ei[:, order], nodes.num_nodes


def main() -> None:
    from anemoi_models_tpu.graphs.kernel_plan import (
        MultiPassPlan,
        build_multi_pass_plan,
        plan_cost,
    )

    refs = [int(x) for x in os.environ.get("REFS", "5,6,8").split(",")]
    widths = [int(x) for x in os.environ.get("WIDTHS", "512,1024,2048").split(",")]
    passes_list = [int(x) for x in os.environ.get("PASSES", "1,2,3,4").split(",")]

    for r in refs:
        t0 = time.time()
        ei, n = mesh_edges(r)
        print(f"refinement {r}: {n} nodes, {ei.shape[1]} edges "
              f"(mesh build {time.time() - t0:.1f}s)", flush=True)
        for w in widths:
            for k in passes_list:
                t0 = time.time()
                plan = build_multi_pass_plan(
                    ei, n, n, block_nodes=128, cap=8, slab_width=w, passes=k
                )
                dt = time.time() - t0
                if isinstance(plan, MultiPassPlan):
                    cov = plan.coverage
                    per = [round(c, 3) for c in plan.pass_coverage]
                    outl = len(plan.plans[-1].outlier_src)
                    npasses = len(plan.plans)
                else:
                    cov = plan.coverage
                    per = [round(cov, 3)]
                    outl = len(plan.outlier_src)
                    npasses = 1
                print(json.dumps({
                    "refinement": r, "slab_width": w, "passes_requested": k,
                    "passes_built": npasses, "coverage": round(cov, 4),
                    "per_pass": per, "outliers": outl,
                    "cost": plan_cost(plan), "build_s": round(dt, 1),
                }), flush=True)


if __name__ == "__main__":
    main()
