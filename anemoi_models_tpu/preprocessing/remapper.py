"""Remapper dispatcher: routes configs to Monomapper or Multimapper.

Same dispatch rule as reference ``preprocessing/remapper.py:26-47``: all
methods 1→1 → Monomapper; all methods 1→N → Multimapper; a mix is
unsupported.
"""

from __future__ import annotations

from typing import Any, Optional

from anemoi_models_tpu.preprocessing import BasePreprocessor
from anemoi_models_tpu.preprocessing.monomapper import Monomapper
from anemoi_models_tpu.preprocessing.multimapper import Multimapper

__all__ = ["Remapper", "Monomapper", "Multimapper"]


class Remapper(BasePreprocessor):
    """Factory selecting the mono- or multi-variable remapper."""

    def __new__(cls, config: Any = None, data_indices: Optional[Any] = None, statistics=None):
        _, _, method_config = cls._process_config(config or {})

        def classify(method: str) -> str:
            if method in Monomapper.supported_methods:
                return "mono"
            if method in Multimapper.supported_methods:
                return "multi"
            return "unknown"

        kinds = {classify(method) for method in method_config}
        if kinds <= {"mono"}:  # empty configs default to the width-preserving mapper
            return Monomapper(config, data_indices, statistics)
        if kinds == {"multi"}:
            return Multimapper(config, data_indices, statistics)
        if kinds == {"unknown"}:
            raise ValueError("Remapper config selects no supported transform.")
        raise NotImplementedError(
            "Remapper cannot mix width-preserving and width-changing transforms in one block: "
            f"{list(method_config)}"
        )
