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
    """Collection of data and model indices."""

    def __init__(self, config: Any, name_to_index: dict[str, int]) -> None:
        self.config = config
        self.name_to_index = dict(sorted(name_to_index.items(), key=operator.itemgetter(1)))
        data_cfg = config["data"] if isinstance(config, dict) else config.data
        self.forcing = _as_list(data_cfg.get("forcing"))
        self.diagnostic = _as_list(data_cfg.get("diagnostic"))
        remapped = data_cfg.get("remapped")
        self.remapped = dict(remapped) if remapped else {}
        self.forcing_remapped = self.forcing.copy()

        assert set(self.diagnostic).isdisjoint(self.forcing), (
            f"Diagnostic and forcing variables overlap: {set(self.diagnostic).intersection(self.forcing)}. "
            "Please drop them at a dataset-level to exclude them from the training data."
        )
        assert set(self.remapped).isdisjoint(self.diagnostic), (
            "Remapped variable overlap with diagnostic variables. Not implemented."
        )
        assert set(self.remapped).issubset(self.name_to_index), (
            "Remapping a variable that does not exist in the dataset. Check for typos: "
            f"{set(self.remapped).difference(self.name_to_index)}"
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
