"""Training losses.

The reference repo delegates training to anemoi-training; the canonical loss
there is an area-weighted MSE over grid points with optional per-variable
weights and the imputer's ``loss_mask_training`` zeroing imputed outputs
(reference exposes the mask at ``preprocessing/imputer.py:127-134``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

__all__ = ["weighted_mse", "WeightedMSELoss", "crps_ensemble", "WeightedCRPSLoss"]


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


def crps_ensemble(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    node_weights: Optional[jnp.ndarray] = None,
    variable_weights: Optional[jnp.ndarray] = None,
    loss_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Area/variable-weighted masked fair ensemble CRPS (AIFS-CRPS objective).

    ``pred``: (..., M, grid, vars) with M ensemble members on axis −3;
    ``target``: same shape with size 1 there (or no ensemble axis at all).
    Fair estimator
    ``CRPS = (1/M)Σ|x_i−y| − (1/(2M(M−1)))Σ_{i≠j}|x_i−x_j|``, the second
    term computed from sorted members in O(M log M) instead of the O(M²)
    pairwise tensor: ``Σ_{i<j}(s_j−s_i) = Σ_k (2k−M+1)·s_k``. M = 1
    degenerates to the MAE (the spread term vanishes).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if target.ndim < pred.ndim:
        target = jnp.expand_dims(target, -3)
    m = pred.shape[-3]
    skill = jnp.abs(pred - target).mean(axis=-3)
    if m > 1:
        s = jnp.sort(pred, axis=-3)
        k = jnp.arange(m, dtype=jnp.float32)
        coef = (2.0 * k - (m - 1)).reshape(m, 1, 1)  # broadcasts over (grid, vars)
        spread = (s * coef).sum(axis=-3) / (m * (m - 1))
    else:
        spread = jnp.zeros_like(skill)
    crps = skill - spread
    if loss_mask is not None:  # imputed points carry no skill signal
        crps = crps * loss_mask
    if variable_weights is not None:
        crps = crps * variable_weights
    if node_weights is not None:
        w = node_weights[..., None]
        return (crps * w).sum() / (jnp.broadcast_to(w, crps.shape).sum() + 1e-12)
    return crps.mean()


class WeightedCRPSLoss:
    """Callable bundling static weights/mask with :func:`crps_ensemble`."""

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
        return crps_ensemble(
            pred, target, self.node_weights, self.variable_weights, self.loss_mask
        )


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
