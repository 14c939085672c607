"""Stylized render chain: frozen NeRF trunk → latents → style MLPs →
composite.

The shared forward used by Phase-E training (/root/reference/train_tgtcs.py:
376-423) and Phase-F stylized renders (/root/reference/rendering.py:118-182):

1. frozen trunk gives ``base_remap``, ``sigma``, ``pts_embed``
2. latent table lookup per ray (shrunk toward the style mean)
3. ``concat`` MLP on (pts_embed, full latent)
4. style MLP on (pts_embed, [base_remap ‖ concat_features], scalar latent)
5. alpha-composite the stylized colors with the FROZEN density

Reference quirk kept: the style MLP's latent input is the per-ray MEAN of
the 32-d latent broadcast back to 32 dims
(``torch.mean(latents, dim=1, keepdims=True)`` then expand,
/root/reference/train_tgtcs.py:379,390).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tgtc.models.nerf import NerfMLP, nerf_apply
from tgtc.models.style_field import (
    StyleMLPBeforeConcat,
    StyleMLPWildMultilayers,
    lookup_latents,
)
from tgtc.ops.composite import CompositeOutput, alpha_composite


def style_forward(
    nerf_model: NerfMLP,
    nerf_params: Any,
    concat_model: StyleMLPBeforeConcat,
    concat_params: Any,
    style_model: StyleMLPWildMultilayers,
    style_params: Any,
    latent_state: Dict[str, jnp.ndarray],
    rays_o: jnp.ndarray,       # [R, 3]
    rays_d: jnp.ndarray,       # [R, 3]
    ts: jnp.ndarray,           # [R, S]
    style_ids: jnp.ndarray,    # [R]
    frame_ids: jnp.ndarray,    # [R]
    sigma_scale: float = 1.0,
    llff_tile: bool = True,
    noise_std: float = 0.0,
    noise_key: Optional[jax.Array] = None,
    freeze_nerf: bool = True,
    deltas: Optional[jnp.ndarray] = None,
    with_sigma: bool = False,
) -> Tuple[CompositeOutput, jnp.ndarray]:
    """One stylized stream (coarse OR fine, given its depths ``ts``).

    Returns (composite, weights) — weights feed the fine resample.

    ``deltas``: explicit interval lengths for a sample SUBSET (the
    training-time ERT path, ops.sampling.select_sample_budget); None =
    consecutive differences of ``ts``.
    ``with_sigma``: additionally return the raw (pre-noise) trunk density —
    the ERT selector's score input — as a third element.
    """
    r, s = ts.shape
    pts = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)

    out = nerf_apply(nerf_model, nerf_params, pts, dirs)
    base_remap, sigma, pts_embed = out["base_remap"], out["sigma"], out["pts_embed"]
    if freeze_nerf:
        base_remap = jax.lax.stop_gradient(base_remap)
        sigma = jax.lax.stop_gradient(sigma)
        pts_embed = jax.lax.stop_gradient(pts_embed)

    lat = lookup_latents(latent_state, style_ids, frame_ids,
                         sigma_scale, llff_tile)           # [R, D]
    d = lat.shape[-1]
    lat_full = jnp.broadcast_to(lat[:, None, :], (r, s, d))
    # scalar-mean quirk for the style MLP's latent input
    lat_scalar = jnp.broadcast_to(
        jnp.mean(lat, axis=-1, keepdims=True)[:, None, :], (r, s, d)
    )

    concat_features = concat_model.apply(concat_params, pts_embed, lat_full)
    concated = jnp.concatenate([base_remap, concat_features], axis=-1)
    rgb = style_model.apply(style_params, pts_embed, concated, lat_scalar)

    comp = alpha_composite(rgb, sigma, ts, noise_std=noise_std, key=noise_key,
                           deltas=deltas)
    if with_sigma:
        return comp, comp.weights, sigma
    return comp, comp.weights
