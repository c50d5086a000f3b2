"""Input normalization as a single fused affine transform.

Same method set as the reference ``preprocessing/normalizer.py:24-205``
(``mean-std`` / ``std`` / ``min-max`` / ``max`` / ``none`` per variable,
optional statistics remapping between variables), compiled down to one
``x * mul + add`` — ideal for XLA fusion into the surrounding graph.
"""

from __future__ import annotations

import logging
import warnings
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from anemoi_models_tpu.preprocessing import BasePreprocessor

LOGGER = logging.getLogger(__name__)

__all__ = ["InputNormalizer"]


class InputNormalizer(BasePreprocessor):
    """Normalizes input data with a configurable per-variable method."""

    def __init__(
        self,
        config: Any = None,
        data_indices: Optional[Any] = None,
        statistics: Optional[dict] = None,
    ) -> None:
        super().__init__(config, data_indices, statistics)

        name_to_index_training_input = self.data_indices.data.input.name_to_index

        minimum = np.asarray(statistics["minimum"], dtype=np.float64).copy()
        maximum = np.asarray(statistics["maximum"], dtype=np.float64).copy()
        mean = np.asarray(statistics["mean"], dtype=np.float64).copy()
        stdev = np.asarray(statistics["stdev"], dtype=np.float64).copy()

        # Optionally reuse the statistics of one variable for another
        statistics_remap = {}
        for remap, source in self.remap.items():
            idx_src = name_to_index_training_input[source]
            idx_remap = name_to_index_training_input[remap]
            statistics_remap[idx_remap] = (minimum[idx_src], maximum[idx_src], mean[idx_src], stdev[idx_src])
        for idx, new_stats in statistics_remap.items():
            minimum[idx], maximum[idx], mean[idx], stdev[idx] = new_stats

        self._validate_normalization_inputs(name_to_index_training_input, minimum, maximum, mean, stdev)

        _norm_add = np.zeros((minimum.size,), dtype=np.float32)
        _norm_mul = np.ones((minimum.size,), dtype=np.float32)

        for name, i in name_to_index_training_input.items():
            method = self.methods.get(name, self.default)
            if method == "mean-std":
                if stdev[i] < (mean[i] * 1e-6):
                    warnings.warn(f"Normalizing: the field seems to have only one value {mean[i]}")
                _norm_mul[i] = 1 / stdev[i]
                _norm_add[i] = -mean[i] / stdev[i]
            elif method == "std":
                if stdev[i] < (mean[i] * 1e-6):
                    warnings.warn(f"Normalizing: the field seems to have only one value {mean[i]}")
                _norm_mul[i] = 1 / stdev[i]
                _norm_add[i] = 0
            elif method == "min-max":
                x = maximum[i] - minimum[i]
                if x < 1e-9:
                    warnings.warn(f"Normalizing: the field {name} seems to have only one value {maximum[i]}.")
                _norm_mul[i] = 1 / x
                _norm_add[i] = -minimum[i] / x
            elif method == "max":
                _norm_mul[i] = 1 / maximum[i]
            elif method == "none":
                pass
            else:
                raise ValueError(f"Unknown normalisation method for {name}: {method}")

        self._norm_mul = jnp.asarray(_norm_mul)
        self._norm_add = jnp.asarray(_norm_add)
        self._input_idx = jnp.asarray(data_indices.data.input.full)
        self._output_idx = jnp.asarray(data_indices.data.output.full)

    def _validate_normalization_inputs(self, name_to_index_training_input: dict, minimum, maximum, mean, stdev):
        assert len(self.methods) == sum(len(v) for v in self.method_config.values()), (
            f"Error parsing methods in InputNormalizer methods ({len(self.methods)}) "
            f"and entries in config ({sum(len(v) for v in self.method_config)}) do not match."
        )
        n = minimum.size
        assert maximum.size == n, (maximum.size, n)
        assert mean.size == n, (mean.size, n)
        assert stdev.size == n, (stdev.size, n)
        assert isinstance(self.methods, dict)
        for name, method in self.methods.items():
            assert name in name_to_index_training_input, f"{name} is not a valid variable name"
            assert method in ("mean-std", "std", "min-max", "max", "none"), (
                f"{method} is not a valid normalisation method"
            )

    def transform(self, x, in_place: bool = False, data_index=None):
        """Normalize a tensor of shape [..., nvars]; width selects the view."""
        if data_index is not None:
            return x * self._norm_mul[data_index] + self._norm_add[data_index]
        if x.shape[-1] == len(self._input_idx):
            return x * self._norm_mul[self._input_idx] + self._norm_add[self._input_idx]
        return x * self._norm_mul + self._norm_add

    def inverse_transform(self, x, in_place: bool = False, data_index=None):
        """Denormalize a tensor of shape [..., nvars | nvars_pred]."""
        if data_index is not None:
            return (x - self._norm_add[data_index]) / self._norm_mul[data_index]
        if x.shape[-1] == len(self._output_idx):
            return (x - self._norm_add[self._output_idx]) / self._norm_mul[self._output_idx]
        return (x - self._norm_add) / self._norm_mul
