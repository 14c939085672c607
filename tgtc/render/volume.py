"""The fused coarse→fine volume-render step.

Replaces the reference's per-phase inline chains (sample → batchified model →
composite → fine resample → …, e.g. /root/reference/train_tgtcs.py:228-251)
with ONE pure function that XLA compiles into a single fused program. No
``batchify`` chunking: memory is managed by the caller choosing the ray-block
size and by sharding the ray axis across the device mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from tgtc.models.nerf import NerfMLP, nerf_apply, nerf_apply_t
from tgtc.ops.composite import CompositeOutput, alpha_composite
from tgtc.ops.sampling import (
    merge_and_resample_fine,
    sample_along_rays_uniform,
    select_sample_budget,
)


def _trunk_apply(model: NerfMLP, params, pts, dirs, feature_major: bool):
    """Dispatch point-major (flax) vs feature-major trunk evaluation;
    inputs/outputs are point-major ``[R, S, ...]`` either way."""
    if not feature_major:
        return nerf_apply(model, params, pts, dirs)
    r, s, _ = pts.shape
    out = nerf_apply_t(
        model.cfg, params,
        pts.reshape(-1, 3).T, dirs.reshape(-1, 3).T,
    )
    return {
        "rgb": out["rgb"].T.reshape(r, s, 3),
        "sigma": out["sigma"].reshape(r, s),
        "base_remap": out["base_remap"].T.reshape(r, s, -1),
        "pts_embed": out["pts_embed"].T.reshape(r, s, -1),
    }


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static render-time settings (subset of the reference flags,
    /root/reference/config.py:46,105-119)."""

    n_samples: int = 64
    n_samples_fine: int = 64
    near: float = 0.0
    far: float = 1.0
    sigma_noise_std: float = 1.0
    white_bkgd: bool = False
    perturb: bool = False  # jitter coarse depths (train: True)
    feature_major: bool = False  # evaluate the trunk in [features, points]
    #   layout (tgtc.models.nerf.nerf_apply_t) — faster on TPU, identical
    #   numerics for relu trunks; differentiable, so valid for training too
    fine_budget: Optional[int] = None  # early ray termination: evaluate the
    #   fine MLP on only the `fine_budget` highest-estimated-weight merged
    #   samples per ray (ops.sampling.select_sample_budget). None = exact
    #   parity with the reference's evaluate-all path
    #   (/root/reference/utils.py:354-386). Valid under grad: the selector
    #   is stop_gradient'd, so gradients flow only through kept samples.


def render_rays(
    coarse_model: NerfMLP,
    coarse_params,
    fine_model: NerfMLP,
    fine_params,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    settings: RenderSettings,
    key: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Coarse+fine render of a flat ray batch ``[R, 3]``.

    Returns dict with ``coarse``/``fine`` :class:`CompositeOutput`, the fine
    sample depths ``t_fine`` and midpoint positions, and the raw fine network
    outputs (``base_remap`` etc.) are *not* retained — the style path uses
    :func:`render_rays_style` (tgtc.render.style) which re-runs with hooks.
    """
    if key is not None:
        k_coarse, k_noise_c, k_fine_noise = jax.random.split(key, 3)
    else:
        k_coarse = k_noise_c = k_fine_noise = None

    pts, ts = sample_along_rays_uniform(
        rays_o,
        rays_d,
        settings.n_samples,
        near=settings.near,
        far=settings.far,
        key=k_coarse if settings.perturb else None,
    )
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    out_c = _trunk_apply(coarse_model, coarse_params, pts, dirs,
                         settings.feature_major)
    comp_c = alpha_composite(
        out_c["rgb"],
        out_c["sigma"],
        ts,
        noise_std=settings.sigma_noise_std,
        key=k_noise_c,
        white_bkgd=settings.white_bkgd,
    )

    pts_f, ts_f = merge_and_resample_fine(
        rays_o, rays_d, ts, comp_c.weights, settings.n_samples_fine
    )
    deltas_f = None
    if settings.fine_budget is not None:
        # ERT at training time: score each merged sample from the RAW
        # (pre-noise) coarse density, keep the top-`fine_budget` per ray in
        # depth order, composite the subset with full-set interval lengths
        # (== forcing dropped alphas to zero). grid= stays None: the coarse
        # grid is perturbed when settings.perturb (the training case).
        ts_f, deltas_f = select_sample_budget(
            ts_f, ts, jax.lax.stop_gradient(out_c["sigma"]),
            settings.fine_budget,
        )
        pts_f = rays_o[..., None, :] + rays_d[..., None, :] * ts_f[..., None]
    dirs_f = jnp.broadcast_to(rays_d[:, None, :], pts_f.shape)
    out_f = _trunk_apply(fine_model, fine_params, pts_f, dirs_f,
                         settings.feature_major)
    comp_f = alpha_composite(
        out_f["rgb"],
        out_f["sigma"],
        ts_f,
        noise_std=settings.sigma_noise_std,
        key=k_fine_noise,
        white_bkgd=settings.white_bkgd,
        deltas=deltas_f,
    )

    return {
        "coarse": comp_c,
        "fine": comp_f,
        "ts": ts,
        "ts_fine": ts_f,
    }
