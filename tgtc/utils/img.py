"""Float↔uint8 image conversions — the ONE rounding convention.

``to_uint8`` rounds to nearest (+0.5 before truncation); ``from_uint8``
is its exact inverse scale. Keep every float→uint8 image write and every
uint8-batch normalization on this pair — a second convention (e.g. plain
truncation) silently shifts pixel values by one LSB.
Both are pure jnp and safe inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float image → uint8 with round-to-nearest."""
    return (jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


def from_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 image → [0,1] float32 (identity on float inputs)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x
