"""Alpha compositing (classic NeRF quadrature).

Parity with ``alpha_composition`` (/root/reference/utils.py:354-386):
``alpha = 1 - exp(-relu(sigma + noise) * delta)``, exclusive-transmittance
cumprod, expected RGB / depth / accumulation, optional white background.

TPU notes: the cumprod over the (static, small) sample axis is a cheap VPU
scan that XLA keeps fused with the surrounding elementwise math; everything
stays in registers/VMEM for typical (rays_block, n_samples) tiles.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class CompositeOutput(NamedTuple):
    rgb: jnp.ndarray      # [R, 3]  expected color
    t_exp: jnp.ndarray    # [R]     expected depth
    weights: jnp.ndarray  # [R, N]  per-sample contribution
    acc: jnp.ndarray      # [R]     accumulated opacity


def alpha_composite(
    rgb: jnp.ndarray,
    sigma: jnp.ndarray,
    t_values: jnp.ndarray,
    noise_std: float = 0.0,
    key: Optional[jax.Array] = None,
    white_bkgd: bool = False,
) -> CompositeOutput:
    """Composite per-sample radiance into per-ray outputs.

    Args:
        rgb: ``[R, N, 3]`` per-sample color.
        sigma: ``[R, N]`` raw density (pre-activation).
        t_values: ``[R, N]`` sample depths.
        noise_std: std of Gaussian regularization noise added to sigma before
            the ReLU (only when ``key`` is provided) —
            reference /root/reference/utils.py:372-376.
    """
    delta = t_values[..., 1:] - t_values[..., :-1]
    delta = jnp.concatenate(
        [delta, jnp.full_like(delta[..., :1], 1e10)], axis=-1
    )

    if key is not None and noise_std > 0.0:
        sigma = sigma + jax.random.normal(key, sigma.shape, sigma.dtype) * noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * delta)

    # Exclusive cumulative transmittance: T_i = prod_{j<i} (1 - alpha_j).
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    weights = alpha * trans

    rgb_exp = jnp.sum(weights[..., None] * rgb, axis=-2)
    t_exp = jnp.sum(weights * t_values, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    if white_bkgd:
        rgb_exp = rgb_exp + (1.0 - acc[..., None])

    return CompositeOutput(rgb=rgb_exp, t_exp=t_exp, weights=weights, acc=acc)
