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


def _dropout_rng_for(model: Any, dropout_seed: int):
    """Per-step dropout key derivation, or None for deterministic models.

    A model built with ``deterministic=False`` (reference trains with
    attention-weight dropout, ``layers/attention.py:60``) draws its "dropout"
    stream here: the key is folded from the optimizer step counter, so the
    noise sequence is reproducible and checkpoint-resume continues it exactly.
    """
    if getattr(model, "deterministic", True):
        return None
    base = jax.random.key(dropout_seed)

    def rng_at(step: jnp.ndarray) -> jax.Array:
        return jax.random.fold_in(base, step)

    return rng_at


def make_train_step(
    model: Any,
    optimizer: optax.GradientTransformation,
    loss_fn: Optional[Callable] = None,
    dropout_seed: int = 0,
) -> tuple[Callable, Callable]:
    """Return (init_state, train_step).

    ``train_step(state, x, y) -> (state, loss)`` where
    x: (batch, time, ensemble, grid, vars_in), y: (batch, ensemble, grid,
    vars_out) at the internal model widths.
    """
    loss_fn = loss_fn or (lambda pred, target: weighted_mse(pred, target))
    rng_at = _dropout_rng_for(model, dropout_seed)

    def init_state(rng: jax.Array, example_x: jnp.ndarray) -> TrainState:
        # a non-deterministic model traces its dropout path at init, so the
        # stream must exist (the draw itself creates no parameters)
        rngs = rng if rng_at is None else {"params": rng, "dropout": jax.random.fold_in(rng, 7)}
        params = model.init(rngs, example_x)
        return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))

    def train_step(state: TrainState, x: jnp.ndarray, y: jnp.ndarray) -> tuple[TrainState, jnp.ndarray]:
        kwargs = {"rngs": {"dropout": rng_at(state.step)}} if rng_at else {}

        def loss_of(params):
            pred = model.apply(params, x, **kwargs)
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
    dropout_seed: int = 0,
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
    rng_at = _dropout_rng_for(model, dropout_seed)

    def init_state(rng: jax.Array, example_x: jnp.ndarray) -> TrainState:
        # a non-deterministic model traces its dropout path at init, so the
        # stream must exist (the draw itself creates no parameters)
        rngs = rng if rng_at is None else {"params": rng, "dropout": jax.random.fold_in(rng, 7)}
        params = model.init(rngs, example_x)
        return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))

    def train_step(
        state: TrainState, x0: jnp.ndarray, truth_inputs: jnp.ndarray, targets: jnp.ndarray
    ) -> tuple[TrainState, jnp.ndarray]:
        forcings = truth_inputs[..., forcing_in] if forcing_in.size else None
        rng = rng_at(state.step) if rng_at else None

        def loss_of(params):
            _, preds = rollout(params, x0, forcings, rng=rng)
            return loss_fn(preds, targets)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return init_state, train_step
