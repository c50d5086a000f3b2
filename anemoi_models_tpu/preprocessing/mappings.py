"""Elementwise variable conversion functions (jnp).

Same function set as reference ``preprocessing/mappings.py:13-75``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "noop",
    "cos_converter",
    "sin_converter",
    "atan2_converter",
    "log1p_converter",
    "boxcox_converter",
    "sqrt_converter",
    "expm1_converter",
    "square_converter",
    "inverse_boxcox_converter",
]


def noop(x):
    """No operation."""
    return x


def cos_converter(x):
    """Convert angle in degrees to cos."""
    return jnp.cos(x / 180 * jnp.pi)


def sin_converter(x):
    """Convert angle in degrees to sin."""
    return jnp.sin(x / 180 * jnp.pi)


def atan2_converter(x):
    """Convert (cos, sin) pairs back to angle in degrees in [0, 360).

    x[..., 0]: cos, x[..., 1]: sin.
    """
    return jnp.remainder(jnp.arctan2(x[..., 1], x[..., 0]) * 180 / jnp.pi, 360)


def log1p_converter(x):
    """Convert positive var to log(1+var)."""
    return jnp.log1p(x)


def boxcox_converter(x, lambd=0.5):
    """Convert positive var to boxcox(var)."""
    if lambd == 0:
        return jnp.log(x)
    return (jnp.power(x, lambd) - 1) / lambd


def sqrt_converter(x):
    """Convert positive var to sqrt(var)."""
    return jnp.sqrt(x)


def expm1_converter(x):
    """Convert log(1+var) back to var."""
    return jnp.expm1(x)


def square_converter(x):
    """Convert sqrt(var) back to var."""
    return x**2


def inverse_boxcox_converter(x, lambd=0.5):
    """Convert boxcox(var) back to var."""
    if lambd == 0:
        return jnp.exp(x)
    return jnp.power(x * lambd + 1, 1 / lambd)
