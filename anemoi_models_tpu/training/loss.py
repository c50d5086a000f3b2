"""Training losses.

The reference repo delegates training to anemoi-training; the canonical loss
there is an area-weighted MSE over grid points with optional per-variable
weights and the imputer's ``loss_mask_training`` zeroing imputed outputs
(reference exposes the mask at ``preprocessing/imputer.py:127-134``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

__all__ = ["weighted_mse", "WeightedMSELoss"]


def weighted_mse(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    node_weights: Optional[jnp.ndarray] = None,
    variable_weights: Optional[jnp.ndarray] = None,
    loss_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Area/variable-weighted masked MSE.

    pred/target: (..., grid, vars); node_weights: (grid,);
    variable_weights: (vars,); loss_mask: (grid, vars) from the imputer.
    """
    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if loss_mask is not None:
        err = err * loss_mask
    if variable_weights is not None:
        err = err * variable_weights
    if node_weights is not None:
        w = node_weights[..., None]
        return (err * w).sum() / (jnp.broadcast_to(w, err.shape).sum() + 1e-12)
    return err.mean()


class WeightedMSELoss:
    """Callable bundling static weights/mask with :func:`weighted_mse`."""

    def __init__(
        self,
        node_weights: Optional[jnp.ndarray] = None,
        variable_weights: Optional[jnp.ndarray] = None,
        loss_mask: Optional[jnp.ndarray] = None,
    ) -> None:
        self.node_weights = node_weights
        self.variable_weights = variable_weights
        self.loss_mask = loss_mask

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return weighted_mse(
            pred, target, self.node_weights, self.variable_weights, self.loss_mask
        )
