"""Output bounding strategies applied to named variables in config order.

Counterpart of reference ``layers/bounding.py:21-125``. Functional: each
bounding is a callable ``x -> x`` over the internal-model-output tensor.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from anemoi_models_tpu.data_indices.tensor import lookup_indices

__all__ = ["BaseBounding", "ReluBounding", "LeakyReluBounding", "HardtanhBounding", "FractionBounding"]


class BaseBounding:
    """Bounding over the variables named in ``variables``."""

    def __init__(self, *, variables: list[str], name_to_index: dict[str, int]) -> None:
        self.name_to_index = name_to_index
        self.variables = variables
        self.data_index = self._create_index(variables=self.variables)

    def _create_index(self, variables: list[str]) -> np.ndarray:
        return lookup_indices(self.name_to_index, variables)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError


class ReluBounding(BaseBounding):
    """Clamp the named variables to >= 0."""

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x.at[..., self.data_index].set(jnp.maximum(x[..., self.data_index], 0.0))


class LeakyReluBounding(BaseBounding):
    """Leaky version of the zero clamp (negative slope 0.01)."""

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        sub = x[..., self.data_index]
        return x.at[..., self.data_index].set(jnp.where(sub >= 0, sub, 0.01 * sub))


class HardtanhBounding(BaseBounding):
    """Clamp the named variables to [min_val, max_val]."""

    def __init__(self, *, variables: list[str], name_to_index: dict[str, int], min_val: float, max_val: float) -> None:
        super().__init__(variables=variables, name_to_index=name_to_index)
        self.min_val = min_val
        self.max_val = max_val

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x.at[..., self.data_index].set(
            jnp.clip(x[..., self.data_index], self.min_val, self.max_val)
        )


class FractionBounding(HardtanhBounding):
    """Bound variables to a [min,max] fraction of ``total_var`` — e.g.
    convective precipitation as a fraction of total precipitation."""

    def __init__(
        self,
        *,
        variables: list[str],
        name_to_index: dict[str, int],
        min_val: float,
        max_val: float,
        total_var: str,
    ) -> None:
        super().__init__(variables=variables, name_to_index=name_to_index, min_val=min_val, max_val=max_val)
        self.total_variable = self._create_index(variables=[total_var])

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = super().__call__(x)
        return x.at[..., self.data_index].set(x[..., self.data_index] * x[..., self.total_variable])
