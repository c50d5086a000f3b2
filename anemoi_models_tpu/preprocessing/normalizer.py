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

        # Vectorized affine-table build: one (mul, add) pair per method, selected
        # by a per-variable method-id vector — no per-variable Python branching.
        n = minimum.size
        method_id = np.zeros((n,), dtype=np.int64)  # 0 = none
        method_codes = {"none": 0, "mean-std": 1, "std": 2, "min-max": 3, "max": 4}
        for name, i in name_to_index_training_input.items():
            method = self.methods.get(name, self.default)
            if method not in method_codes:
                raise ValueError(f"InputNormalizer: unsupported method '{method}' for variable '{name}'")
            method_id[i] = method_codes[method]

        with np.errstate(divide="ignore", invalid="ignore"):
            span = maximum - minimum
            candidates_mul = np.stack(
                [np.ones((n,)), 1.0 / stdev, 1.0 / stdev, 1.0 / span, 1.0 / maximum]
            )
            candidates_add = np.stack(
                [np.zeros((n,)), -mean / stdev, np.zeros((n,)), -minimum / span, np.zeros((n,))]
            )
        _norm_mul = np.take_along_axis(candidates_mul, method_id[None, :], axis=0)[0]
        _norm_add = np.take_along_axis(candidates_add, method_id[None, :], axis=0)[0]

        degenerate = ((method_id == 1) | (method_id == 2)) & (stdev < mean * 1e-6)
        degenerate |= (method_id == 3) & (span < 1e-9)
        if degenerate.any():
            index_to_name = {i: k for k, i in name_to_index_training_input.items()}
            bad = ", ".join(index_to_name.get(int(i), str(int(i))) for i in np.nonzero(degenerate)[0])
            warnings.warn(
                f"InputNormalizer: near-zero spread detected for [{bad}]; "
                "their normalization is numerically degenerate (constant field?)."
            )

        self._norm_mul = jnp.asarray(_norm_mul, dtype=jnp.float32)
        self._norm_add = jnp.asarray(_norm_add, dtype=jnp.float32)
        self._input_idx = jnp.asarray(data_indices.data.input.full)
        self._output_idx = jnp.asarray(data_indices.data.output.full)

    def _validate_normalization_inputs(self, name_to_index_training_input: dict, minimum, maximum, mean, stdev):
        n_config = sum(len(v) for v in self.method_config.values())
        if len(self.methods) != n_config:
            raise ValueError(
                f"InputNormalizer config is inconsistent: {len(self.methods)} resolved "
                f"per-variable methods vs {n_config} variables listed under method keys "
                "(a variable may appear under two methods)."
            )
        n = minimum.size
        for label, arr in (("maximum", maximum), ("mean", mean), ("stdev", stdev)):
            if arr.size != n:
                raise ValueError(f"statistics['{label}'] has {arr.size} entries, expected {n}")
        for name, method in self.methods.items():
            if name not in name_to_index_training_input:
                raise KeyError(f"InputNormalizer: '{name}' is not in the dataset's variable table")
            if method not in ("mean-std", "std", "min-max", "max", "none"):
                raise ValueError(f"InputNormalizer: unsupported method '{method}' for variable '{name}'")

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
