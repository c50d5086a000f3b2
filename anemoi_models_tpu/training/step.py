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

__all__ = ["TrainState", "make_train_step"]


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
