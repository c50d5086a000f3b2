"""Multi-layer perceptron.

Same topology as reference ``layers/mlp.py:22-89``: Linear→act, then
``n_extra_layers + 1`` hidden Linear→act pairs, final Linear, optional final
activation, optional (autocast) LayerNorm. The MXU sees a chain of dense
matmuls; XLA fuses the activations.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from anemoi_models_tpu.layers.utils import AutocastLayerNorm, get_activation

__all__ = ["MLP"]


class MLP(nn.Module):
    """MLP with the reference's layer layout.

    Attributes
    ----------
    hidden_dim : width of the hidden layers.
    out_features : output width.
    n_extra_layers : extra hidden layers beyond the first (reference adds
        ``n_extra_layers + 1`` hidden Linears).
    activation : activation name ("SiLU", "GELU", ...).
    final_activation : apply activation after the output Linear.
    layer_norm : append an AutocastLayerNorm.
    """

    hidden_dim: int
    out_features: int
    n_extra_layers: int = 0
    activation: str = "SiLU"
    final_activation: bool = False
    layer_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation)
        x = act(nn.Dense(self.hidden_dim, dtype=self.dtype)(x))
        for _ in range(self.n_extra_layers + 1):
            x = act(nn.Dense(self.hidden_dim, dtype=self.dtype)(x))
        x = nn.Dense(self.out_features, dtype=self.dtype)(x)
        if self.final_activation:
            x = act(x)
        if self.layer_norm:
            x = AutocastLayerNorm()(x)
        return x
