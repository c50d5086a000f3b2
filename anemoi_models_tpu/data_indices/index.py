"""Data/Model index pairs (input + output views).

Mirrors the reference's ``data_indices/index.py:15-94``: a ``DataIndex`` views
the full dataset tensor (diagnostics excluded from input, forcings excluded
from output); a ``ModelIndex`` views the model tensors where those variables
have already been dropped (so ``excludes`` is empty on both sides).
"""

from __future__ import annotations

from anemoi_models_tpu.data_indices.tensor import InputTensorIndex, OutputTensorIndex

__all__ = ["BaseIndex", "DataIndex", "ModelIndex"]


class BaseIndex:
    """Base class pairing an input and an output tensor index."""

    input: InputTensorIndex
    output: OutputTensorIndex

    def __eq__(self, other: object):
        if not isinstance(other, BaseIndex):
            return NotImplemented
        return self.input == other.input and self.output == other.output

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(input={self.input}, output={self.output})"

    def __getitem__(self, key: str):
        return getattr(self, key)

    def todict(self) -> dict:
        return {"input": self.input.todict(), "output": self.output.todict()}


class DataIndex(BaseIndex):
    """Indexing into the raw dataset tensor."""

    def __init__(self, diagnostic: list[str], forcing: list[str], name_to_index: dict[str, int]) -> None:
        self._diagnostic = diagnostic
        self._forcing = forcing
        self._name_to_index = name_to_index
        self.input = InputTensorIndex(includes=forcing, excludes=diagnostic, name_to_index=name_to_index)
        self.output = OutputTensorIndex(includes=diagnostic, excludes=forcing, name_to_index=name_to_index)


class ModelIndex(BaseIndex):
    """Indexing into the model input/output tensors."""

    def __init__(
        self,
        diagnostic: list[str],
        forcing: list[str],
        name_to_index_model_input: dict[str, int],
        name_to_index_model_output: dict[str, int],
    ) -> None:
        self._diagnostic = diagnostic
        self._forcing = forcing
        self._name_to_index_model_input = name_to_index_model_input
        self._name_to_index_model_output = name_to_index_model_output
        self.input = InputTensorIndex(includes=forcing, excludes=[], name_to_index=name_to_index_model_input)
        self.output = OutputTensorIndex(includes=diagnostic, excludes=[], name_to_index=name_to_index_model_output)
