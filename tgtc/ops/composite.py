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


def sigma_weights(
    sigma: jnp.ndarray,
    t_values: jnp.ndarray,
    deltas: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-sample compositing weights from (post-noise) density alone.
    The single home of the quadrature math — :func:`alpha_composite`
    computes its weights HERE, so a sigma-only render pass (the stylized
    coarse pass: sample_pdf consumes weights, coarse rgb is discarded)
    is identical-by-construction to the full composite.

    ``deltas`` overrides the consecutive-difference interval lengths: the
    early-terminated render (tgtc.render.fast, ``fine_budget``) composites
    a *subset* of samples but keeps each sample's interval from the full
    set, which makes dropping a sample exactly equivalent to forcing its
    alpha to zero (no density is attributed to skipped space)."""
    if deltas is None:
        delta = t_values[..., 1:] - t_values[..., :-1]
        delta = jnp.concatenate(
            [delta, jnp.full_like(delta[..., :1], 1e10)], axis=-1
        )
    else:
        delta = deltas
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * delta)
    # Exclusive cumulative transmittance: T_i = prod_{j<i} (1 - alpha_j).
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1
    )
    return alpha * trans


def alpha_composite(
    rgb: jnp.ndarray,
    sigma: jnp.ndarray,
    t_values: jnp.ndarray,
    noise_std: float = 0.0,
    key: Optional[jax.Array] = None,
    white_bkgd: bool = False,
    deltas: Optional[jnp.ndarray] = None,
) -> CompositeOutput:
    """Composite per-sample radiance into per-ray outputs.

    Args:
        rgb: ``[R, N, 3]`` per-sample color.
        sigma: ``[R, N]`` raw density (pre-activation).
        t_values: ``[R, N]`` sample depths.
        noise_std: std of Gaussian regularization noise added to sigma before
            the ReLU (only when ``key`` is provided) —
            reference /root/reference/utils.py:372-376.
        deltas: optional explicit ``[R, N]`` interval lengths
            (see :func:`sigma_weights`).
    """
    if key is not None and noise_std > 0.0:
        sigma = sigma + jax.random.normal(key, sigma.shape, sigma.dtype) * noise_std

    weights = sigma_weights(sigma, t_values, deltas=deltas)

    rgb_exp = jnp.sum(weights[..., None] * rgb, axis=-2)
    t_exp = jnp.sum(weights * t_values, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    if white_bkgd:
        rgb_exp = rgb_exp + (1.0 - acc[..., None])

    return CompositeOutput(rgb=rgb_exp, t_exp=t_exp, weights=weights, acc=acc)


def alpha_composite_wild(
    rgb: jnp.ndarray,
    sigma: jnp.ndarray,
    t_values: jnp.ndarray,
    transient_rgb: jnp.ndarray,
    transient_sigma: jnp.ndarray,
    transient_beta: jnp.ndarray,
    beta_min: float = 0.03,
    noise_std: float = 0.0,
    key: Optional[jax.Array] = None,
    white_bkgd: bool = False,
):
    """NeRF-in-the-Wild static+transient compositing with beta uncertainty.

    Parity with ``alpha_composition_wild`` (/root/reference/utils.py:389-432,
    dead on the reference's main path but part of its capability surface).
    Returns (rgb_exp, t_exp, weights, beta_exp).
    """
    delta = t_values[..., 1:] - t_values[..., :-1]
    delta = jnp.concatenate([delta, jnp.full_like(delta[..., :1], 1e10)], -1)

    if key is not None and noise_std > 0.0:
        sigma = sigma + jax.random.normal(key, sigma.shape, sigma.dtype) * noise_std

    sigma_static = jax.nn.relu(sigma)
    alpha_static = 1.0 - jnp.exp(-sigma_static * delta)

    sigma_tr = jax.nn.relu(transient_sigma)
    alpha_tr = 1.0 - jnp.exp(-sigma_tr * delta)
    trans_tr = jnp.cumprod(1.0 - alpha_tr + 1e-10, axis=-1)
    trans_tr = jnp.concatenate(
        [jnp.ones_like(trans_tr[..., :1]), trans_tr[..., :-1]], -1
    )
    beta_exp = jnp.sum(
        trans_tr[..., None] * alpha_tr[..., None]
        * jax.nn.relu(transient_beta), axis=-2,
    ) + beta_min

    sigma_both = sigma_static + sigma_tr
    alpha_both = 1.0 - jnp.exp(-sigma_both * delta)
    trans_both = jnp.cumprod(1.0 - alpha_both + 1e-10, axis=-1)
    trans_both = jnp.concatenate(
        [jnp.ones_like(trans_both[..., :1]), trans_both[..., :-1]], -1
    )
    rgb_exp = jnp.sum(
        trans_both[..., None] * alpha_static[..., None] * rgb
        + trans_both[..., None] * alpha_tr[..., None] * transient_rgb,
        axis=-2,
    )
    weights = alpha_both * trans_both
    t_exp = jnp.sum(weights * t_values, axis=-1)
    if white_bkgd:
        rgb_exp = rgb_exp + (1.0 - jnp.sum(weights, -1)[..., None])
    return rgb_exp, t_exp, weights, beta_exp
