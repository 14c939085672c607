"""Phase C2 — decoder finetune with the point-cloud temporal loss.

Rebuild of the finetune loop inside ``train_temporal_invoke``
(/root/reference/train_style_modules.py:309-533): per step, stylize a
random 256-px patch of a batch of NeRF renders, **rasterize view-0's
stylized point cloud into all views** (tgtc.ops.rasterize replaces
pytorch3d), mask by warp-hit and occlusion distance (5e-2, :479-480), and
minimize masked MSE x 3500 on top of the StyTrans losses — training the
CNN decoder only (:413-416).

NDC coor maps are converted to world space first (``ndc2world``, :538-542).
The random patch crop happens on host (numpy) like the reference (:432-436);
everything after is one jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tgtc.models.stytrans import StyTrans
from tgtc.ops.rasterize import ndc_to_world, rasterize_warp
from tgtc.train.transformer2d import (
    TransformerTrainConfig,
    TransformerTrainState,
    make_transformer_optimizer,
)


@dataclasses.dataclass(frozen=True)
class TemporalTrainConfig:
    temporal_weight: float = 3500.0
    content_weight: float = 7.0
    style_weight: float = 10.0
    id1_weight: float = 70.0
    id2_weight: float = 1.0
    lr: float = 5e-4
    max_iter: int = 100
    batch_size: int = 4
    patch: int = 256
    space_dist_threshold: float = 5e-2
    splat_radius: float = 1.5


def _stylize_and_warp(model, cfg, proj, h, w, is_ndc, focal,
                      params, content, coor, cps, style, patch_origin, key,
                      step):
    """Shared C2 core: stylize the patch batch, splat view-0's stylized
    point cloud into every view, crop back to the patch, and build the
    warp-hit and occlusion masks. Used by both the train step (grads flow
    through it) and the debug dump."""
    y0, x0 = patch_origin
    out = model.apply(
        params, content, style, False,
        method=model.compute_losses,
        rngs={"dropout": jax.random.fold_in(key, step)},
    )
    ics = out["ics"]  # [B, h', w', 3]

    coor_world = ndc_to_world(coor, h, w, focal) if is_ndc else coor
    pcl = coor_world[0].reshape(-1, 3)
    rgb0 = ics[0].reshape(-1, 3)
    warped_rgb, warped_coor, mask = rasterize_warp(
        pcl, rgb0, cps, proj, h, w, radius=cfg.splat_radius
    )
    ph, pw = content.shape[1], content.shape[2]
    crop = lambda x: jax.lax.dynamic_slice(
        x, (0, y0, x0, 0), (x.shape[0], ph, pw, x.shape[3])
    )
    warped_rgb, warped_coor, mask = (
        crop(warped_rgb), crop(warped_coor), crop(mask)
    )
    dist2 = jnp.sum((warped_coor - coor_world) ** 2, -1, keepdims=True)
    occl = (dist2 < cfg.space_dist_threshold ** 2).astype(ics.dtype)
    return out, ics, warped_rgb, mask, occl


def make_temporal_debug_fn(
    model: StyTrans,
    cfg: TemporalTrainConfig,
    proj: jnp.ndarray,
    h: int,
    w: int,
    is_ndc: bool = True,
    focal: float = 1.0,
):
    """Jitted debug renderer matching the reference's end-of-C2 dumps
    (/root/reference/train_style_modules.py:519-528): per view, the
    stylized patch, view-0's stylization warped into that view, the
    warp-hit mask, and the occlusion-distance mask — all uint8 [B,h',w',3].
    """

    @jax.jit
    def debug(params, content, coor, cps, style, patch_origin, key):
        _, ics, warped_rgb, mask, occl = _stylize_and_warp(
            model, cfg, proj, h, w, is_ndc, focal,
            params, content, coor, cps, style, patch_origin, key,
            jnp.zeros((), jnp.int32),
        )
        from tgtc.utils.img import to_uint8 as u8
        b3 = lambda m: jnp.broadcast_to(m, m.shape[:-1] + (3,))
        return {
            "stylized_content": u8(ics),
            "warped_stylized_content": u8(warped_rgb),
            "warped_mask": u8(b3(mask)),
            "coor_dist_msk": u8(b3(occl)),
        }

    return debug


def make_temporal_train_step(
    model: StyTrans,
    cfg: TemporalTrainConfig,
    proj: jnp.ndarray,      # [4,4] projection (tgtc.ops.rasterize helper)
    h: int,
    w: int,
    is_ndc: bool = True,
    focal: float = 1.0,
):
    """Jitted step:
    ``(state, content [B,h',w',3], coor [B,h',w',3], cps [B,4,4],
       style [B,h',w',3], patch_origin (y0, x0), key) -> (state, metrics)``

    where (h', w') is the patch size. ``coor`` are the FULL-frame coor maps
    cropped to the same patch (host side), ``cps`` camera-to-world poses.
    The splat target resolution is the full (h, w); warped outputs are
    cropped back to the patch inside the step via dynamic_slice.
    """
    base_cfg = TransformerTrainConfig(
        lr=cfg.lr, content_weight=cfg.content_weight,
        style_weight=cfg.style_weight, id1_weight=cfg.id1_weight,
        id2_weight=cfg.id2_weight,
    )
    tx = make_transformer_optimizer(base_cfg, train_keys=("decode",))

    def step_fn(state: TransformerTrainState, content, coor, cps, style,
                patch_origin, key):
        def loss_fn(params):
            out, ics, warped_rgb, mask, occl = _stylize_and_warp(
                model, cfg, proj, h, w, is_ndc, focal,
                params, content, coor, cps, style, patch_origin, key,
                state.step,
            )
            loss_t = cfg.temporal_weight * jnp.mean(
                (ics - warped_rgb) ** 2 * mask * occl
            )

            loss = (
                cfg.content_weight * out["loss_c"]
                + cfg.style_weight * out["loss_s"]
                + cfg.id1_weight * out["l_id1"]
                + cfg.id2_weight * out["l_id2"]
                + loss_t
            )
            return loss, {
                "loss_c": out["loss_c"], "loss_s": out["loss_s"],
                "loss_t": loss_t, "l_id1": out["l_id1"], "l_id2": out["l_id2"],
            }

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TransformerTrainState(
                step=state.step + 1, params=params, opt_state=opt_state
            ),
            {"loss": loss, **aux},
        )

    return jax.jit(step_fn, donate_argnums=(0,))


def sample_patch(rng: np.random.Generator, h: int, w: int, patch: int
                 ) -> Tuple[int, int]:
    """Host-side random patch origin
    (parity /root/reference/train_style_modules.py:432-436)."""
    if patch <= 0 or patch >= min(h, w):
        return 0, 0
    return int(rng.integers(0, h - patch)), int(rng.integers(0, w - patch))
