"""End-to-end example: train a tiny GraphTransformer enc-proc-dec on
synthetic weather, then run an autoregressive rollout and compare against
persistence.

Run (CPU):
    env PYTHONPATH=$PWD JAX_PLATFORMS=cpu python examples/train_tiny.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from anemoi_models_tpu.data_indices import IndexCollection
from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.interface import AnemoiModelInterface
from anemoi_models_tpu.training import make_rollout_fn, make_train_step, weighted_mse
from anemoi_models_tpu.training.data import SyntheticWeather
from anemoi_models_tpu.utils import DotDict


def main(steps: int = 60, grid_lat: int = 12, channels: int = 32) -> None:
    names = ["sst", "z_500", "t_850", "t2m"]
    name_to_index = {n: i for i, n in enumerate(names)}
    graph = build_enc_proc_dec_graph(grid_lat=grid_lat, mesh_refinements=2)
    coords = graph["data"].coords
    data = SyntheticWeather(coords, num_vars=len(names), seed=0)

    config = DotDict(
        {
            "data": {
                "forcing": ["sst"],
                "diagnostic": [],
                "processors": {
                    "normalizer": {
                        "_target_": "anemoi.models.preprocessing.normalizer.InputNormalizer",
                        "config": {"default": "mean-std"},
                    }
                },
            },
            "graph": {"data": "data", "hidden": "hidden"},
            "training": {"multistep_input": 2},
            "model": {
                "num_channels": channels,
                "trainable_parameters": {"hidden": 8},
                "model": {
                    "_target_": "anemoi.models.models.encoder_processor_decoder.AnemoiModelEncProcDec"
                },
                "encoder": {
                    "_target_": "anemoi.models.layers.mapper.GraphTransformerForwardMapper",
                    "num_heads": 4,
                    "trainable_size": 4,
                    "sub_graph_edge_attributes": ["edge_length", "edge_dirs"],
                },
                "processor": {
                    "_target_": "anemoi.models.layers.processor.GraphTransformerProcessor",
                    "num_layers": 4,
                    "num_chunks": 2,
                    "num_heads": 4,
                    "trainable_size": 4,
                    "sub_graph_edge_attributes": ["edge_length", "edge_dirs"],
                },
                "decoder": {
                    "_target_": "anemoi.models.layers.mapper.GraphTransformerBackwardMapper",
                    "num_heads": 4,
                    "trainable_size": 4,
                    "sub_graph_edge_attributes": ["edge_length", "edge_dirs"],
                },
            },
        }
    )
    indices = IndexCollection(config, name_to_index)
    iface = AnemoiModelInterface(
        config=config,
        graph_data=graph,
        statistics=data.statistics(),
        data_indices=indices,
        metadata={"experiment": "train_tiny"},
    )

    multi_step = config.training.multistep_input
    area = jnp.asarray(graph["data"].attrs["area_weight"][:, 0])
    init_state, train_step = make_train_step(
        iface.model, optax.adam(3e-3), lambda p, t: weighted_mse(p, t, node_weights=area)
    )

    # data at *model* widths: inputs keep all vars, target drops forcing sst
    in_idx = np.asarray(indices.internal_model.input.full)
    out_names = list(indices.internal_model.output.name_to_index)
    out_data_idx = np.asarray([name_to_index[n] for n in out_names])

    def prep(batch_np):
        batch = iface.pre_processors(jnp.asarray(batch_np))  # (b, w, grid, vars)
        x = batch[:, :multi_step, None]  # (b, t, e=1, grid, v)
        y = batch[:, multi_step, None][..., out_data_idx]  # (b, e, grid, v_out)
        return x, y

    first = data.batch(2, multi_step + 1, t0=0.0)
    x0, y0 = prep(first)
    state = init_state(jax.random.key(0), x0)
    step_fn = jax.jit(train_step)

    losses = []
    for i, batch_np in enumerate(data.batches(2, multi_step + 1)):
        state, loss = step_fn(state, *prep(batch_np))
        losses.append(float(loss))
        if i % 10 == 0:
            print(f"step {i:4d}  loss {losses[-1]:.4f}")
        if i + 1 >= steps:
            break
    print(f"loss: first {losses[0]:.4f} -> last {np.mean(losses[-5:]):.4f}")
    assert np.mean(losses[-5:]) < losses[0] * 0.8, "training failed to reduce loss"

    # rollout vs persistence (normalized space)
    n_roll = 4
    rollout = jax.jit(make_rollout_fn(iface.model, indices, n_roll))
    eval_np = data.batch(1, multi_step + n_roll, t0=12345.0)
    eval_b = iface.pre_processors(jnp.asarray(eval_np))
    x0 = eval_b[:, :multi_step, None]
    forcing_idx = np.asarray(indices.internal_model.input.forcing)
    truth_steps = eval_b[:, multi_step:, None]  # (1, n_roll, 1, grid, v)
    forcings = jnp.moveaxis(truth_steps[..., forcing_idx], 1, 0)
    _, preds = rollout(state.params, x0, forcings)

    prog_out = np.asarray(indices.internal_model.output.prognostic)
    truth = jnp.moveaxis(truth_steps[..., out_data_idx], 1, 0)
    model_rmse = float(jnp.sqrt(jnp.mean((preds[..., prog_out] - truth[..., prog_out]) ** 2)))
    persist = x0[:, -1][:, None][..., np.asarray(indices.internal_model.input.prognostic)]
    persist_rmse = float(jnp.sqrt(jnp.mean((persist - truth[..., prog_out]) ** 2)))
    print(f"{n_roll}-step rollout RMSE: model {model_rmse:.4f} vs persistence {persist_rmse:.4f}")


if __name__ == "__main__":
    main()
