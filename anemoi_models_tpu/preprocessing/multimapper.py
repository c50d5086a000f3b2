"""1→N variable remapping (cos_sin), width-changing.

Capability match for reference ``preprocessing/multimapper.py:25-306``: maps an
angle variable to (cos, sin) columns appended at the internal tensor levels and
back via atan2; also remaps the training loss mask. Width change is why the
``internal_*`` index levels exist.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from anemoi_models_tpu.preprocessing import BasePreprocessor
from anemoi_models_tpu.preprocessing.mappings import atan2_converter, cos_converter, sin_converter

__all__ = ["Multimapper"]


class Multimapper(BasePreprocessor):
    """Remap single variables to 2+ variables (``cos_sin``) and back."""

    supported_methods = {
        method: [f, inv]
        for method, f, inv in zip(["cos_sin"], [[cos_converter, sin_converter]], [atan2_converter])
    }

    def __init__(self, config: Any = None, data_indices: Optional[Any] = None, statistics=None) -> None:
        super().__init__(config, data_indices, statistics)
        self._create_remapping_indices(statistics)
        self._validate_indices()

    def _validate_indices(self):
        counts = {
            "train-in": len(self.index_training_input),
            "infer-in": len(self.index_inference_input),
            "train-out": len(self.index_training_output),
            "infer-out": len(self.index_inference_output),
            "mappers": len(self.remappers),
        }
        ok = (
            counts["train-in"] == counts["infer-in"] <= counts["mappers"]
            and counts["train-out"] == counts["infer-out"] <= counts["mappers"]
        )
        if not ok:
            raise RuntimeError(f"Multimapper column bookkeeping is inconsistent: {counts}")
        covered = len(set(self.index_training_input + self.indices_keep_training_input))
        if covered != self.num_training_input_vars:
            raise ValueError(
                "Multimapper: some variables listed under config.data.remapped have no "
                "mapping method configured — the internal tensor would carry dead columns."
            )

    def _create_remapping_indices(self, statistics=None):
        di = self.data_indices
        name_to_index_training_input = di.data.input.name_to_index
        name_to_index_inference_input = di.model.input.name_to_index
        name_to_index_training_remapped_input = di.internal_data.input.name_to_index
        name_to_index_inference_remapped_input = di.internal_model.input.name_to_index
        name_to_index_training_remapped_output = di.internal_data.output.name_to_index
        name_to_index_inference_remapped_output = di.internal_model.output.name_to_index
        name_to_index_training_output = di.data.output.name_to_index
        name_to_index_inference_output = di.model.output.name_to_index

        self.num_training_input_vars = len(name_to_index_training_input)
        self.num_inference_input_vars = len(name_to_index_inference_input)
        self.num_remapped_training_input_vars = len(name_to_index_training_remapped_input)
        self.num_remapped_inference_input_vars = len(name_to_index_inference_remapped_input)
        self.num_remapped_training_output_vars = len(name_to_index_training_remapped_output)
        self.num_remapped_inference_output_vars = len(name_to_index_inference_remapped_output)
        self.num_training_output_vars = len(name_to_index_training_output)
        self.num_inference_output_vars = len(name_to_index_inference_output)

        self.indices_keep_training_input = [
            item for key, item in di.data.input.name_to_index.items()
            if key in di.internal_data.input.name_to_index
        ]
        self.indices_keep_inference_input = [
            item for key, item in di.model.input.name_to_index.items()
            if key in di.internal_model.input.name_to_index
        ]
        self.indices_keep_training_output = [
            item for key, item in di.data.output.name_to_index.items()
            if key in di.internal_data.output.name_to_index
        ]
        self.indices_keep_inference_output = [
            item for key, item in di.model.output.name_to_index.items()
            if key in di.internal_model.output.name_to_index
        ]

        (
            self.index_training_input,
            self.index_training_remapped_input,
            self.index_inference_input,
            self.index_inference_remapped_input,
            self.index_training_output,
            self.index_training_backmapped_output,
            self.index_inference_output,
            self.index_inference_backmapped_output,
            self.remappers,
            self.backmappers,
        ) = ([], [], [], [], [], [], [], [], [], [])

        for name in name_to_index_training_input:
            method = self.methods.get(name, self.default)
            if method == "none":
                continue
            if method != "cos_sin":
                raise ValueError(f"Multimapper: no such transform '{method}' (variable '{name}')")

            self.index_training_input.append(name_to_index_training_input[name])
            self.index_training_output.append(name_to_index_training_output[name])
            self.index_inference_input.append(name_to_index_inference_input[name])
            self.index_inference_output.append(name_to_index_inference_output.get(name))

            multiple_training_output, multiple_inference_output = [], []
            multiple_training_input, multiple_inference_input = [], []
            for name_dst in self.method_config[method][name]:
                if name_dst not in di.internal_data.input.name_to_index:
                    raise KeyError(
                        f"Multimapper: target column '{name_dst}' for '{name}' was never "
                        f"declared — add '{name}': [...,'{name_dst}'] under config.data.remapped."
                    )
                multiple_training_input.append(name_to_index_training_remapped_input[name_dst])
                multiple_training_output.append(name_to_index_training_remapped_output[name_dst])
                multiple_inference_input.append(name_to_index_inference_remapped_input[name_dst])
                multiple_inference_output.append(name_to_index_inference_remapped_output.get(name_dst))

            self.index_training_remapped_input.append(multiple_training_input)
            self.index_inference_remapped_input.append(multiple_inference_input)
            self.index_training_backmapped_output.append(multiple_training_output)
            self.index_inference_backmapped_output.append(multiple_inference_output)

            self.remappers.append([cos_converter, sin_converter])
            self.backmappers.append(atan2_converter)

    def transform(self, x, in_place: bool = False):
        if x.shape[-1] == self.num_training_input_vars:
            index = self.index_training_input
            indices_remapped = self.index_training_remapped_input
            indices_keep = self.indices_keep_training_input
            target_number_columns = self.num_remapped_training_input_vars
        elif x.shape[-1] == self.num_inference_input_vars:
            index = self.index_inference_input
            indices_remapped = self.index_inference_remapped_input
            indices_keep = self.indices_keep_inference_input
            target_number_columns = self.num_remapped_inference_input_vars
        else:
            raise ValueError(
                f"Remapper got a {x.shape[-1]}-wide tensor; expected the training width "
                f"{self.num_training_input_vars} or the inference width {self.num_inference_input_vars}"
            )

        x_remapped = jnp.zeros(x.shape[:-1] + (target_number_columns,), dtype=x.dtype)
        x_remapped = x_remapped.at[..., : len(indices_keep)].set(x[..., np.asarray(indices_keep, dtype=np.int32)])

        for idx_dst, remapper, idx_src in zip(indices_remapped, self.remappers, index):
            if idx_src is not None:
                for jj, ii in enumerate(idx_dst):
                    x_remapped = x_remapped.at[..., ii].set(remapper[jj](x[..., idx_src]))
        return x_remapped

    def inverse_transform(self, x, in_place: bool = False):
        if x.shape[-1] == self.num_remapped_training_output_vars:
            index = self.index_training_output
            indices_remapped = self.index_training_backmapped_output
            indices_keep = self.indices_keep_training_output
            target_number_columns = self.num_training_output_vars
        elif x.shape[-1] == self.num_remapped_inference_output_vars:
            index = self.index_inference_output
            indices_remapped = self.index_inference_backmapped_output
            indices_keep = self.indices_keep_inference_output
            target_number_columns = self.num_inference_output_vars
        else:
            raise ValueError(
                f"Remapper got a {x.shape[-1]}-wide tensor; expected the training width "
                f"{self.num_remapped_training_output_vars} or the inference width "
                f"{self.num_remapped_inference_output_vars}"
            )

        x_remapped = jnp.zeros(x.shape[:-1] + (target_number_columns,), dtype=x.dtype)
        x_remapped = x_remapped.at[..., np.asarray(indices_keep, dtype=np.int32)].set(
            x[..., : len(indices_keep)]
        )

        for idx_dst, backmapper, idx_src in zip(index, self.backmappers, indices_remapped):
            if idx_dst is not None:
                x_remapped = x_remapped.at[..., idx_dst].set(
                    backmapper(x[..., np.asarray(idx_src, dtype=np.int32)])
                )
        return x_remapped

    def transform_loss_mask(self, mask):
        """Remap the training loss mask onto the internal output width."""
        index = self.index_inference_backmapped_output
        indices_remapped = self.index_inference_output
        indices_keep = self.indices_keep_inference_output

        mask_remapped = jnp.zeros(
            mask.shape[:-1] + (mask.shape[-1] + len(indices_remapped),), dtype=mask.dtype
        )
        mask_remapped = mask_remapped.at[..., : len(indices_keep)].set(
            mask[..., np.asarray(indices_keep, dtype=np.int32)]
        )
        for idx_src, idx_dst in zip(indices_remapped, index):
            if idx_dst is not None:
                for ii in idx_dst:
                    mask_remapped = mask_remapped.at[..., ii].set(mask[..., idx_src])
        return mask_remapped
