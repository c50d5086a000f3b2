"""Autoregressive rollout driver.

The reference's models are consumed autoregressively by anemoi-training /
anemoi-inference (multi-step input window, predicted prognostic variables fed
back, forcings supplied externally). This module owns that loop as a
``lax.scan`` — one compiled program for an N-step rollout, no host round
trips between steps.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_rollout_fn"]


def make_rollout_fn(model: Any, data_indices: Any, n_steps: int) -> Callable:
    """Build ``rollout(params, x0, forcings, rng) -> (x_final, predictions)``.

    - ``x0``: (batch, multi_step, ensemble, grid, n_in) initial window at the
      internal-model input width.
    - ``forcings``: (n_steps, batch, ensemble, grid, n_forcing) per-step
      forcing values, or None if the model has no forcing variables.
    - ``rng``: dropout key, required iff the model was built with
      ``deterministic=False`` (training-time attention dropout, reference
      ``layers/attention.py:60``); each rollout step gets its own fold.
    - returns predictions (n_steps, batch, ensemble, grid, n_out).
    """
    prog_in = np.asarray(data_indices.internal_model.input.prognostic)
    prog_out = np.asarray(data_indices.internal_model.output.prognostic)
    forcing_in = np.asarray(data_indices.internal_model.input.forcing)
    n_in = len(data_indices.internal_model.input)
    needs_rng = not getattr(model, "deterministic", True)

    def rollout(
        params,
        x0: jnp.ndarray,
        forcings: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ):
        if forcings is None and forcing_in.size:
            raise ValueError(
                f"This model takes {forcing_in.size} forcing variables per step but rollout() "
                "was called with forcings=None — every future step would see zero forcings "
                "(normalized space) and the forecast would silently drift. Pass a "
                "(n_steps, batch, ensemble, grid, n_forcing) array."
            )
        def advance(x, y, forcing_t):
            """Shift the multi-step window, feeding back prognostic outputs."""
            nxt = jnp.zeros(x.shape[:1] + x.shape[2:4] + (n_in,), dtype=x.dtype)
            nxt = nxt.at[..., prog_in].set(y[..., prog_out])
            if forcing_t is not None and forcing_in.size:
                nxt = nxt.at[..., forcing_in].set(forcing_t)
            return jnp.concatenate([x[:, 1:], nxt[:, None]], axis=1)

        if needs_rng and rng is None:
            raise ValueError(
                "This model was built with deterministic=False (training-time "
                "dropout); rollout() needs a dropout key — pass rng=."
            )
        step_keys = jax.random.split(rng, n_steps) if needs_rng else None

        def body(x, xs):
            kwargs = {"rngs": {"dropout": xs["key"]}} if needs_rng else {}
            y = model.apply(params, x, **kwargs)
            return advance(x, y, xs["forcing"]), y

        # None entries are empty pytrees, so one scan covers all four
        # (forcings?, rng?) combinations; length is always explicit.
        xs = {"forcing": forcings, "key": step_keys}
        return jax.lax.scan(body, x0, xs, length=n_steps)

    return rollout
