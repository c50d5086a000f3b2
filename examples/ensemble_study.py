"""Ensemble study: does CRPS fine-tuning produce a calibrated ensemble?

Protocol (the AIFS-CRPS recipe at toy scale):
1. pretrain a deterministic model with MSE;
2. warm-start fine-tune with the fair-CRPS objective over M perturbed
   members;
3. score a held-out perturbed-IC ensemble rollout: CRPS, spread,
   spread/skill ratio (≈1 = reliable), vs the MSE model's ensemble.

Run (CPU):
    env PYTHONPATH=$PWD JAX_PLATFORMS=cpu python examples/ensemble_study.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(
    grid_lat: int = 16,
    num_vars: int = 6,
    steps_pretrain: int = 250,
    steps_finetune: int = 150,
    members: int = 4,
    eval_rollout: int = 6,
    seed: int = 0,
) -> dict:
    from anemoi_models_tpu.graphs import latlon_grid_nodes
    from anemoi_models_tpu.training import evaluate_interface, train_run
    from anemoi_models_tpu.training.dataset import SyntheticSource

    coords = latlon_grid_nodes(grid_lat).coords
    source = SyntheticSource(coords, num_vars=num_vars, num_steps=400, seed=seed)
    model_kwargs = dict(num_channels=64, num_layers=4, num_heads=4, num_chunks=1)
    workdir = tempfile.mkdtemp(prefix="ens_study_")

    common = dict(
        forcing=("var_0",), mesh_refinements=2, model_kwargs=model_kwargs,
        batch_size=4, seed=seed, log=lambda s: None,
    )
    pre = train_run(
        source, steps=steps_pretrain, peak_lr=2e-3,
        checkpoint_dir=os.path.join(workdir, "mse"), **common,
    )
    ft = train_run(
        source, steps=steps_finetune, peak_lr=5e-4,
        loss="crps", ensemble=members, perturb_sigma=0.05,
        init_from=pre["checkpoint"],
        checkpoint_dir=os.path.join(workdir, "crps"), **common,
    )

    results = {}
    for name, run in (("mse", pre), ("crps_finetuned", ft)):
        scores = evaluate_interface(
            run["interface"], source, n_steps=eval_rollout,
            params=run["state"].params, ensemble=members, perturb_sigma=0.05,
        )
        results[name] = {
            "crps_mean": float(np.mean(scores["crps"])),
            "ens_mean_rmse": float(np.mean(scores["ens_mean_rmse"])),
            "spread_skill": [round(float(x), 3) for x in scores["spread_skill_ratio"]],
            "skill_vs_persistence": float(np.mean(scores["skill_vs_persistence"])),
        }
        print(json.dumps({"model": name, **results[name]}), flush=True)

    print(f"\n{'model':<16} {'crps':>8} {'ens rmse':>9} {'mean spread/skill':>18}")
    for name, r in results.items():
        print(f"{name:<16} {r['crps_mean']:>8.4f} {r['ens_mean_rmse']:>9.4f} "
              f"{np.mean(r['spread_skill']):>18.3f}")
    return results


if __name__ == "__main__":
    main()
