"""1→1 variable remapping (log1p / sqrt / boxcox), width-preserving.

Capability match for reference ``preprocessing/monomapper.py:30-150``.
"""

from __future__ import annotations

from typing import Any, Optional

from anemoi_models_tpu.preprocessing import BasePreprocessor
from anemoi_models_tpu.preprocessing.mappings import (
    boxcox_converter,
    expm1_converter,
    inverse_boxcox_converter,
    log1p_converter,
    noop,
    sqrt_converter,
    square_converter,
)

__all__ = ["Monomapper"]


class Monomapper(BasePreprocessor):
    """Remap and convert single variables in place (width unchanged)."""

    supported_methods = {
        method: [f, inv]
        for method, f, inv in zip(
            ["log1p", "sqrt", "boxcox", "none"],
            [log1p_converter, sqrt_converter, boxcox_converter, noop],
            [expm1_converter, square_converter, inverse_boxcox_converter, noop],
        )
    }

    def __init__(self, config: Any = None, data_indices: Optional[Any] = None, statistics=None) -> None:
        super().__init__(config, data_indices, statistics)
        self._create_remapping_indices(statistics)
        self._validate_indices()

    def _validate_indices(self):
        lengths = {
            "train-in": len(self.index_training_input),
            "infer-in": len(self.index_inference_input),
            "infer-out": len(self.index_inference_output),
            "train-out": len(self.index_training_out),
            "mappers": len(self.remappers),
        }
        if len(set(lengths.values())) != 1:
            raise RuntimeError(f"Monomapper column bookkeeping is inconsistent: {lengths}")

    def _create_remapping_indices(self, statistics=None):
        name_to_index_training_input = self.data_indices.data.input.name_to_index
        name_to_index_inference_input = self.data_indices.model.input.name_to_index
        name_to_index_training_output = self.data_indices.data.output.name_to_index
        name_to_index_inference_output = self.data_indices.model.output.name_to_index
        self.num_training_input_vars = len(name_to_index_training_input)
        self.num_inference_input_vars = len(name_to_index_inference_input)
        self.num_training_output_vars = len(name_to_index_training_output)
        self.num_inference_output_vars = len(name_to_index_inference_output)

        (
            self.remappers,
            self.backmappers,
            self.index_training_input,
            self.index_training_out,
            self.index_inference_input,
            self.index_inference_output,
        ) = ([], [], [], [], [], [])

        for name in name_to_index_training_input:
            method = self.methods.get(name, self.default)
            if method not in self.supported_methods:
                raise KeyError(f"Monomapper: no such transform '{method}' (variable '{name}')")
            if method == "none":
                continue
            self.remappers.append(self.supported_methods[method][0])
            self.backmappers.append(self.supported_methods[method][1])
            self.index_training_input.append(name_to_index_training_input[name])
            self.index_training_out.append(name_to_index_training_output.get(name))
            self.index_inference_input.append(name_to_index_inference_input.get(name))
            self.index_inference_output.append(name_to_index_inference_output.get(name))

    def transform(self, x, in_place: bool = False):
        if x.shape[-1] == self.num_training_input_vars:
            idx = self.index_training_input
        elif x.shape[-1] == self.num_inference_input_vars:
            idx = self.index_inference_input
        else:
            raise ValueError(
                f"Remapper got a {x.shape[-1]}-wide tensor; expected the training width "
                f"{self.num_training_input_vars} or the inference width {self.num_inference_input_vars}"
            )
        for i, remapper in zip(idx, self.remappers):
            if i is not None:
                x = x.at[..., i].set(remapper(x[..., i]))
        return x

    def inverse_transform(self, x, in_place: bool = False):
        if x.shape[-1] == self.num_training_output_vars:
            idx = self.index_training_out
        elif x.shape[-1] == self.num_inference_output_vars:
            idx = self.index_inference_output
        else:
            raise ValueError(
                f"Remapper got a {x.shape[-1]}-wide tensor; expected the training width "
                f"{self.num_training_output_vars} or the inference width {self.num_inference_output_vars}"
            )
        for i, backmapper in zip(idx, self.backmappers):
            if i is not None:
                x = x.at[..., i].set(backmapper(x[..., i]))
        return x
