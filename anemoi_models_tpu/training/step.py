"""Train-step builder: optax optimizer + value_and_grad over the model.

The reference delegates the training loop to anemoi-training/Lightning; this
module supplies the equivalent single-step primitive, designed to be
``jax.jit``-ed over a (data, model) mesh: gradients are computed by JAX AD
(including through the sharding constraints, so the adjoint collectives the
reference hand-writes in ``distributed/graph.py:140-298`` come for free).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from anemoi_models_tpu.training.loss import weighted_mse
from anemoi_models_tpu.training.rollout import make_rollout_fn

__all__ = ["TrainState", "make_train_step", "make_rollout_train_step"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_train_step(
    model: Any,
    optimizer: optax.GradientTransformation,
    loss_fn: Optional[Callable] = None,
) -> tuple[Callable, Callable]:
    """Return (init_state, train_step).

    ``train_step(state, x, y) -> (state, loss)`` where
    x: (batch, time, ensemble, grid, vars_in), y: (batch, ensemble, grid,
    vars_out) at the internal model widths.
    """
    loss_fn = loss_fn or (lambda pred, target: weighted_mse(pred, target))

    def init_state(rng: jax.Array, example_x: jnp.ndarray) -> TrainState:
        params = model.init(rng, example_x)
        return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))

    def train_step(state: TrainState, x: jnp.ndarray, y: jnp.ndarray) -> tuple[TrainState, jnp.ndarray]:
        def loss_of(params):
            pred = model.apply(params, x)
            return loss_fn(pred, y)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return init_state, train_step


def make_rollout_train_step(
    model: Any,
    data_indices: Any,
    optimizer: optax.GradientTransformation,
    n_steps: int,
    loss_fn: Optional[Callable] = None,
) -> tuple[Callable, Callable]:
    """Train through an ``n_steps`` autoregressive rollout (the reference
    stack's rollout fine-tuning stage, here one ``lax.scan`` program).

    Returns (init_state, train_step) with
    ``train_step(state, x0, truth_inputs, targets) -> (state, loss)``:

    - ``x0``: (batch, multi_step, ensemble, grid, n_in) initial window,
    - ``truth_inputs``: (n_steps, batch, ensemble, grid, n_in) future truth
      at input width — forcings for each lead time are read from it,
    - ``targets``: (n_steps, batch, ensemble, grid, n_out); the loss
      averages over lead times, so every rollout step trains equally.
    """
    import numpy as np

    loss_fn = loss_fn or (lambda pred, target: weighted_mse(pred, target))
    rollout = make_rollout_fn(model, data_indices, n_steps)
    forcing_in = np.asarray(data_indices.internal_model.input.forcing)

    def init_state(rng: jax.Array, example_x: jnp.ndarray) -> TrainState:
        params = model.init(rng, example_x)
        return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))

    def train_step(
        state: TrainState, x0: jnp.ndarray, truth_inputs: jnp.ndarray, targets: jnp.ndarray
    ) -> tuple[TrainState, jnp.ndarray]:
        forcings = truth_inputs[..., forcing_in] if forcing_in.size else None

        def loss_of(params):
            _, preds = rollout(params, x0, forcings)
            return loss_fn(preds, targets)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return init_state, train_step
