"""IndexCollection: the four-level variable routing table.

Reproduces the reference's ``data_indices/collection.py:24-98`` semantics:
four index levels — ``data`` / ``internal_data`` / ``model`` /
``internal_model`` — each with input and output views, built from three config
lists: ``config.data.forcing`` (inputs only), ``config.data.diagnostic``
(outputs only) and ``config.data.remapped`` (1→N variable remappings whose
products are appended at the end of the *internal* tensors).
"""

from __future__ import annotations

import operator
from typing import Any

from anemoi_models_tpu.data_indices.index import DataIndex, ModelIndex

__all__ = ["IndexCollection"]


def _as_list(value: Any) -> list:
    if value is None:
        return []
    return list(value)


class IndexCollection:
    """The four-level (data/internal_data/model/internal_model) routing table."""

    def __init__(self, config: Any, name_to_index: dict[str, int]) -> None:
        self.config = config
        self.name_to_index = dict(sorted(name_to_index.items(), key=operator.itemgetter(1)))
        data_cfg = config["data"] if isinstance(config, dict) else config.data
        self.forcing = _as_list(data_cfg.get("forcing"))
        self.diagnostic = _as_list(data_cfg.get("diagnostic"))
        remapped = data_cfg.get("remapped")
        self.remapped = dict(remapped) if remapped else {}
        self.forcing_remapped = self.forcing.copy()

        both = set(self.diagnostic).intersection(self.forcing)
        if both:
            raise ValueError(
                f"Variables {sorted(both)} are listed as both diagnostic and forcing; "
                "a variable can be model-input-only or model-output-only, not both."
            )
        remapped_diag = set(self.remapped).intersection(self.diagnostic)
        if remapped_diag:
            raise ValueError(
                f"Remapping of diagnostic variables ({sorted(remapped_diag)}) is unsupported."
            )
        unknown = set(self.remapped).difference(self.name_to_index)
        if unknown:
            raise KeyError(
                f"config.data.remapped names variables absent from the dataset: {sorted(unknown)}"
            )

        name_to_index_model_input = {
            name: i for i, name in enumerate(key for key in self.name_to_index if key not in self.diagnostic)
        }
        name_to_index_model_output = {
            name: i for i, name in enumerate(key for key in self.name_to_index if key not in self.forcing)
        }
        # Internal levels drop the remapped source variables...
        name_to_index_internal_data_input = {
            name: i for i, name in enumerate(key for key in self.name_to_index if key not in self.remapped)
        }
        name_to_index_internal_model_input = {
            name: i for i, name in enumerate(key for key in name_to_index_model_input if key not in self.remapped)
        }
        name_to_index_internal_model_output = {
            name: i for i, name in enumerate(key for key in name_to_index_model_output if key not in self.remapped)
        }
        # ...and append the remap products at the end of the internal tensors.
        for key in self.remapped:
            for mapped in self.remapped[key]:
                name_to_index_internal_model_input[mapped] = len(name_to_index_internal_model_input)
                name_to_index_internal_data_input[mapped] = len(name_to_index_internal_data_input)
                if key not in self.forcing:
                    name_to_index_internal_model_output[mapped] = len(name_to_index_internal_model_output)
                else:
                    self.forcing_remapped += [mapped]
            if key in self.forcing:
                self.forcing_remapped.remove(key)

        self.data = DataIndex(self.diagnostic, self.forcing, self.name_to_index)
        self.internal_data = DataIndex(self.diagnostic, self.forcing_remapped, name_to_index_internal_data_input)
        self.model = ModelIndex(self.diagnostic, self.forcing, name_to_index_model_input, name_to_index_model_output)
        self.internal_model = ModelIndex(
            self.diagnostic,
            self.forcing_remapped,
            name_to_index_internal_model_input,
            name_to_index_internal_model_output,
        )

    def __repr__(self) -> str:
        return f"IndexCollection(config={self.config}, name_to_index={self.name_to_index})"

    def __eq__(self, other: object):
        if not isinstance(other, IndexCollection):
            return NotImplemented
        return (
            self.model == other.model
            and self.data == other.data
            and self.internal_model == other.internal_model
            and self.internal_data == other.internal_data
        )

    def __getitem__(self, key: str):
        return getattr(self, key)

    def todict(self) -> dict:
        return {
            "data": self.data.todict(),
            "model": self.model.todict(),
            "internal_model": self.internal_model.todict(),
            "internal_data": self.internal_data.todict(),
        }
