"""Pre/post-processing pipeline (normalize / impute / remap).

Functional JAX re-design of the reference's ``preprocessing/__init__.py``:
processors are plain Python objects holding device-array buffers; their
``transform`` / ``inverse_transform`` are pure jnp functions (the ``in_place``
argument is accepted for API parity but has no meaning — JAX arrays are
immutable). Width dispatch on ``x.shape[-1]`` is static under jit.

Stateful behavior in the reference (the imputer caching the first batch's NaN
mask, ``imputer.py:121-134``) becomes an explicit ``fit(x)`` step that runs
eagerly; under a jit trace an unfitted stateful processor raises instead of
silently capturing tracers.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp

LOGGER = logging.getLogger(__name__)

__all__ = ["BasePreprocessor", "Processors"]


class BasePreprocessor:
    """Base class for data pre- and post-processors.

    Config parsing matches the reference ``preprocessing/__init__.py:65-103``:
    ``default`` and ``remap`` are special keys; every other key is a method
    name mapping to a list of variables (inverted into ``self.methods``).
    """

    def __init__(
        self,
        config: Any = None,
        data_indices: Optional[Any] = None,
        statistics: Optional[dict] = None,
    ) -> None:
        self.default, self.remap, self.method_config = self._process_config(config or {})
        self.methods = self._invert_key_value_list(self.method_config)
        self.data_indices = data_indices

    @classmethod
    def _process_config(cls, config: Any):
        _special_keys = ("default", "remap", "_target_")
        default = config.get("default", "none")
        remap = config.get("remap", {})
        method_config = {
            k: v for k, v in config.items() if k not in _special_keys and v is not None and v != "none"
        }
        if not method_config:
            LOGGER.warning(
                "%s: using default method %s for all variables not specified in the config.",
                cls.__name__,
                default,
            )
        for m in method_config:
            if isinstance(method_config[m], str):
                method_config[m] = {method_config[m]: f"{m}_{method_config[m]}"}
            elif isinstance(method_config[m], list):
                method_config[m] = {method: f"{m}_{method}" for method in method_config[m]}
        return default, remap, method_config

    @staticmethod
    def _invert_key_value_list(method_config: dict) -> dict[str, str]:
        return {
            variable: method
            for method, variables in method_config.items()
            if not isinstance(variables, str)
            for variable in variables
        }

    def __call__(self, x, in_place: bool = False, inverse: bool = False):
        if inverse:
            return self.inverse_transform(x, in_place=in_place)
        return self.transform(x, in_place=in_place)

    def transform(self, x, in_place: bool = False):
        return x

    def inverse_transform(self, x, in_place: bool = False):
        return x

    # -- functional state hooks (overridden by stateful processors) -------
    def fit(self, x) -> None:
        """Compute any data-dependent state from a sample batch (eager)."""

    def state_dict(self) -> dict:
        """Buffers to persist in checkpoints."""
        return {}

    def load_state_dict(self, state: dict) -> None:
        for k, v in state.items():
            setattr(self, k, v)


class Processors:
    """An ordered pipeline of processors.

    Mirrors reference ``preprocessing/__init__.py:139-194``: the same list
    serves as pre-processor (config order) and post-processor (reversed order,
    inverse transforms); the first eager forward run is NaN-checked.
    """

    def __init__(self, processors: list, inverse: bool = False) -> None:
        self.inverse = inverse
        self.first_run = True
        if inverse:
            processors = processors[::-1]
        self.processors = dict(processors)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__} [{'inverse' if self.inverse else 'forward'}]({self.processors})"

    def __call__(self, x, in_place: bool = False):
        for processor in self.processors.values():
            x = processor(x, in_place=in_place, inverse=self.inverse)
        if self.first_run and not isinstance(x, jax.core.Tracer):
            self.first_run = False
            self._run_checks(x)
        return x

    def fit(self, x) -> None:
        """Fit every processor in pipeline order, threading transforms."""
        for processor in self.processors.values():
            processor.fit(x)
            x = processor(x, inverse=self.inverse)

    def _run_checks(self, x) -> None:
        if not self.inverse:
            num_nan = jnp.isnan(x).sum()
            assert num_nan == 0, f"{self.__class__.__name__} left {num_nan} NaNs in its output on the first batch."

    def state_dict(self) -> dict:
        return {name: p.state_dict() for name, p in self.processors.items() if p.state_dict()}

    def load_state_dict(self, state: dict) -> None:
        for name, sub in state.items():
            self.processors[name].load_state_dict(sub)
