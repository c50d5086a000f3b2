"""Variable-index tensors for routing variables through the model.

Same semantics as the reference's ``data_indices/tensor.py:14-115``: an index
set is defined by ``includes`` (variables exclusive to this side, e.g. forcing
for inputs) and ``excludes`` (variables absent from this side, e.g. diagnostic
for inputs), resolved against a ``name_to_index`` mapping. Indices are plain
``numpy`` int32 arrays — static data baked into jitted programs as constants,
never traced.
"""

from __future__ import annotations

import numpy as np

__all__ = ["BaseTensorIndex", "InputTensorIndex", "OutputTensorIndex"]


class BaseTensorIndex:
    """Index arrays (full/prognostic/diagnostic/forcing) for one tensor view."""

    def __init__(self, *, includes: list[str], excludes: list[str], name_to_index: dict[str, int]) -> None:
        self.includes = includes
        self.excludes = excludes
        self.name_to_index = name_to_index

        missing_ex = [v for v in self.excludes if v not in self.name_to_index]
        assert not missing_ex, f"Index excludes name variables absent from the dataset table: {missing_ex}"
        missing_in = [v for v in self.includes if v not in self.name_to_index]
        assert not missing_in, f"Index includes name variables absent from the dataset table: {missing_in}"

        self.full = self._build_idx_from_excludes()
        self._only = self._build_idx_from_includes()
        self._removed = self._build_idx_from_includes(self.excludes)
        self.prognostic = self._build_idx_prognostic()
        self.diagnostic: np.ndarray = NotImplemented
        self.forcing: np.ndarray = NotImplemented

    def __len__(self) -> int:
        return len(self.full)

    def __repr__(self) -> str:
        return (
            f"{self.__class__.__name__}(includes={self.includes}, excludes={self.excludes}, "
            f"name_to_index={self.name_to_index})"
        )

    def __eq__(self, other: object):
        if not isinstance(other, BaseTensorIndex):
            return NotImplemented
        return (
            np.array_equal(self.full, other.full)
            and np.array_equal(self._only, other._only)
            and np.array_equal(self._removed, other._removed)
            and np.array_equal(self.prognostic, other.prognostic)
            and np.array_equal(self.diagnostic, other.diagnostic)
            and np.array_equal(self.forcing, other.forcing)
            and self.includes == other.includes
            and self.excludes == other.excludes
        )

    def __getitem__(self, key: str):
        return getattr(self, key)

    def todict(self) -> dict:
        return {
            "full": self.full,
            "prognostic": self.prognostic,
            "diagnostic": self.diagnostic,
            "forcing": self.forcing,
        }

    def _build_idx_from_excludes(self, excludes: list[str] | None = None) -> np.ndarray:
        if excludes is None:
            excludes = self.excludes
        return np.array(
            sorted(i for name, i in self.name_to_index.items() if name not in excludes), dtype=np.int32
        )

    def _build_idx_from_includes(self, includes: list[str] | None = None) -> np.ndarray:
        if includes is None:
            includes = self.includes
        return np.array(sorted(self.name_to_index[name] for name in includes), dtype=np.int32)

    def _build_idx_prognostic(self) -> np.ndarray:
        return self._build_idx_from_excludes(list(self.includes) + list(self.excludes))


class InputTensorIndex(BaseTensorIndex):
    """Input view: ``includes`` are forcing, ``excludes`` are diagnostic."""

    def __init__(self, *, includes: list[str], excludes: list[str], name_to_index: dict[str, int]) -> None:
        super().__init__(includes=includes, excludes=excludes, name_to_index=name_to_index)
        self.forcing = self._only
        self.diagnostic = self._removed


class OutputTensorIndex(BaseTensorIndex):
    """Output view: ``includes`` are diagnostic, ``excludes`` are forcing."""

    def __init__(self, *, includes: list[str], excludes: list[str], name_to_index: dict[str, int]) -> None:
        super().__init__(includes=includes, excludes=excludes, name_to_index=name_to_index)
        self.forcing = self._removed
        self.diagnostic = self._only
